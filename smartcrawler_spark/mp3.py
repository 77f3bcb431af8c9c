"""From-spec MPEG-1 Audio Layer III (ISO/IEC 11172-3) decode tier.

The reference drops media references on the floor
(/root/reference/src/html_parser.rs:116-123); this repo keeps them as
spans and decodes payloads executor-side (multimodal.py). WAV + G.711 +
ADPCM + FLAC decode are already real; this module adds the MP3 tier —
the most common compressed-audio format in web corpora — behind the
same ``decode_audio`` seam, Arrow-batched via mapInPandas at scale.

What is spec-exact vs designed (honesty contract, mirrored in
OPERATORS.md and test_mp3.py):

* **Spec-exact** (ISO 11172-3 clause 2.4 + Annex B): frame header walk,
  CRC skip, bit reservoir (``main_data_begin``), MPEG-1 side-info
  layout (17/32 bytes), ``scalefac_compress`` slen pairs, scalefactor
  band edges (Table B.8 — the 44100/48000/32000 long tables below sum
  to 576 exactly), pretab, requantization formula
  ``sign(is)*|is|^(4/3) * 2^((global_gain-210)/4) *
  2^(-(1+scalefac_scale)/2*(sf+preflag*pretab))``, MS stereo
  (``(M±S)/sqrt(2)``), short-block reorder, alias-reduction butterflies
  (ci = -0.6 .. -0.0037), the 36/12-point IMDCT formula and its four
  block-type windows, frequency inversion, and the polyphase synthesis
  STRUCTURE (V FIFO -> matrixing N(i,k)=cos((16+i)(2k+1)pi/64) -> U
  gather -> windowed 16-fold sum).

* **Designed, not Table B.3** (declared gap): the 512-tap analysis /
  synthesis window coefficient DATA is spec table material that cannot
  be transcribed here; the in-repo pair is a numerically designed
  near-perfect-reconstruction substitute (Kaiser-windowed sinc analysis
  prototype; synthesis window solved per polyphase phase by
  deterministic least squares against an exact-delay target).  Measured
  reconstruction: ~50 dB SNR at the spec's 481-sample filterbank delay
  (asserted in test_mp3.py, so the claim is falsifiable, not asserted).
  Bit-exact interop with spec encoders requires substituting the real
  Table B.3/C window data for ``_design_windows``'s output.

* **Partial Huffman coverage** (declared, like the MJPEG-only video
  tier): only Table B.7 code tables 0 (all-zero) and 1, plus the
  count1 quad table B treated as the 4-bit literal family, are
  embedded; a frame selecting any other table returns None.  The
  in-repo test-grade encoder (``encode_mp3_fixture``) emits exactly
  this subset, so the sine-roundtrip physics test exercises the full
  decode pipeline end to end.

``decode_mp3`` returns ``(samples float64 (n, n_ch), sample_rate)`` or
None — never raises on arbitrary bytes (bit-flip fuzz tested).
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------------------
# Spec tables (ISO 11172-3 Annex B)
# --------------------------------------------------------------------------

# Table B.8 long-block scalefactor band widths (22 partitions = 21
# scalefactored bands + the non-scalefactored remainder); each sums to 576.
SFB_LONG = {
    44100: (4, 4, 4, 4, 4, 4, 6, 6, 8, 8, 10, 12, 16, 20, 24, 28,
            34, 42, 50, 54, 76, 158),
    48000: (4, 4, 4, 4, 4, 4, 6, 6, 6, 8, 10, 12, 16, 18, 22, 28,
            34, 40, 46, 54, 54, 192),
    32000: (4, 4, 4, 4, 4, 4, 6, 6, 8, 10, 12, 16, 20, 24, 30, 38,
            46, 56, 68, 84, 102, 26),
}
# short-block widths (13 partitions per window; 3 windows; sums 192 each)
SFB_SHORT = {
    44100: (4, 4, 4, 4, 6, 8, 10, 12, 14, 18, 22, 30, 56),
    48000: (4, 4, 4, 4, 6, 6, 10, 12, 14, 16, 20, 26, 66),
    32000: (4, 4, 4, 4, 6, 8, 12, 16, 20, 26, 34, 42, 12),
}

PRETAB = (0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2)

# scalefac_compress -> (slen1, slen2)
SLEN = ((0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
        (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3))

# Table B.7 pair-value Huffman code tables — embedded subset. Table 0 is
# the spec's all-zero table (no bits). Table 1 codes (x, y) in {0,1}^2;
# transcription is best-effort (flagged above): the pair is used by BOTH
# the encoder and decoder here, so the tier is self-consistent either way.
HUFF_PAIRS = {
    1: {(0, 0): "1", (0, 1): "001", (1, 0): "01", (1, 1): "000"},
}

# alias-reduction coefficients (clause 2.4.3.4.10.1)
_ALIAS_CI = np.array([-0.6, -0.535, -0.33, -0.185, -0.095, -0.041,
                      -0.0142, -0.0037])
_ALIAS_CS = 1.0 / np.sqrt(1.0 + _ALIAS_CI ** 2)
_ALIAS_CA = _ALIAS_CI / np.sqrt(1.0 + _ALIAS_CI ** 2)


def _sfb_bounds(rate: int) -> np.ndarray:
    w = SFB_LONG[rate]
    return np.concatenate([[0], np.cumsum(w)])


# --------------------------------------------------------------------------
# Bit I/O
# --------------------------------------------------------------------------

class _Bits:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits

    def read(self, n: int) -> int:
        v = 0
        d = self.data
        p = self.pos
        if p + n > len(d) * 8:
            raise EOFError("bitstream exhausted")
        for _ in range(n):
            v = (v << 1) | ((d[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return v

    def read1(self) -> int:
        p = self.pos
        if p >= len(self.data) * 8:
            raise EOFError("bitstream exhausted")
        self.pos = p + 1
        return (self.data[p >> 3] >> (7 - (p & 7))) & 1


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def write_code(self, code: str) -> None:
        self.bits.extend(1 if c == "1" else 0 for c in code)

    def __len__(self) -> int:
        return len(self.bits)

    def to_bytes(self) -> bytes:
        bits = self.bits + [0] * (-len(self.bits) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


# --------------------------------------------------------------------------
# Frame header / side info
# --------------------------------------------------------------------------

_BITRATE_L3 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
               256, 320)
_RATES = {0: 44100, 1: 48000, 2: 32000}


def _parse_header(hdr: int):
    """MPEG-1 Layer III header -> dict or None (other versions/layers are
    outside this tier — multimodal._mp3_stream_info still reports them)."""
    if (hdr >> 21) & 0x7FF != 0x7FF:
        return None
    if (hdr >> 19) & 3 != 3:        # MPEG-1 only
        return None
    if (hdr >> 17) & 3 != 1:        # Layer III only
        return None
    protection = ((hdr >> 16) & 1) == 0
    br_idx = (hdr >> 12) & 0xF
    sr_idx = (hdr >> 10) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    pad = (hdr >> 9) & 1
    mode = (hdr >> 6) & 3
    mode_ext = (hdr >> 4) & 3
    rate = _RATES[sr_idx]
    kbps = _BITRATE_L3[br_idx]
    flen = 144 * kbps * 1000 // rate + pad
    return {
        "rate": rate, "kbps": kbps, "frame_len": flen,
        "protection": protection, "mode": mode, "mode_ext": mode_ext,
        "n_ch": 1 if mode == 3 else 2,
    }


def _parse_side_info(data: bytes, n_ch: int):
    bits = _Bits(data)
    main_data_begin = bits.read(9)
    bits.read(5 if n_ch == 1 else 3)  # private
    scfsi = [[bits.read1() for _ in range(4)] for _ in range(n_ch)]
    granules = []
    for _gr in range(2):
        chans = []
        for _ch in range(n_ch):
            g = {
                "part2_3_length": bits.read(12),
                "big_values": bits.read(9),
                "global_gain": bits.read(8),
                "scalefac_compress": bits.read(4),
                "window_switching": bits.read1(),
            }
            if g["window_switching"]:
                g["block_type"] = bits.read(2)
                g["mixed_block"] = bits.read1()
                g["table_select"] = [bits.read(5), bits.read(5), 0]
                g["subblock_gain"] = [bits.read(3) for _ in range(3)]
                # implied region split (clause 2.4.2.7)
                g["region0_count"] = (8 if g["block_type"] == 2
                                      and not g["mixed_block"] else 7)
                g["region1_count"] = 20 - g["region0_count"]
            else:
                g["block_type"] = 0
                g["mixed_block"] = 0
                g["table_select"] = [bits.read(5) for _ in range(3)]
                g["region0_count"] = bits.read(4)
                g["region1_count"] = bits.read(3)
                g["subblock_gain"] = [0, 0, 0]
            g["preflag"] = bits.read1()
            g["scalefac_scale"] = bits.read1()
            g["count1table_select"] = bits.read1()
            chans.append(g)
        granules.append(chans)
    return main_data_begin, scfsi, granules


# --------------------------------------------------------------------------
# Scalefactors + Huffman
# --------------------------------------------------------------------------

def _read_scalefactors(bits: _Bits, g, scfsi_ch, gr: int, prev_sf):
    slen1, slen2 = SLEN[g["scalefac_compress"]]
    if g["window_switching"] and g["block_type"] == 2:
        if g["mixed_block"]:
            long_sf = [bits.read(slen1) for _ in range(8)]
            short_sf = [[bits.read(slen1) for _ in range(3)]
                        for _ in range(3, 6)]
            short_sf += [[bits.read(slen2) for _ in range(3)]
                         for _ in range(6, 12)]
            return {"long": long_sf, "short": short_sf}
        short_sf = [[bits.read(slen1) for _ in range(3)] for _ in range(6)]
        short_sf += [[bits.read(slen2) for _ in range(3)] for _ in range(6)]
        return {"short": short_sf}
    # long blocks; scfsi groups (0-5, 6-10, 11-15, 16-20) copy granule 0's
    groups = ((0, 6), (6, 11), (11, 16), (16, 21))
    sf = [0] * 21
    for gi, (lo, hi) in enumerate(groups):
        slen = slen1 if lo < 11 else slen2
        if gr == 1 and scfsi_ch[gi]:
            for b in range(lo, hi):
                sf[b] = prev_sf["long"][b] if prev_sf else 0
        else:
            for b in range(lo, hi):
                sf[b] = bits.read(slen)
    return {"long": sf}


def _build_decode_tree(table: dict) -> dict:
    root: dict = {}
    for val, code in table.items():
        node = root
        for c in code[:-1]:
            node = node.setdefault(c, {})
            if not isinstance(node, dict):
                raise ValueError("prefix violation in huffman table")
        node[code[-1]] = val
    return root


_DECODE_TREES = {t: _build_decode_tree(tbl) for t, tbl in HUFF_PAIRS.items()}


def _huffman_decode(bits: _Bits, g, rate: int, part2_start: int):
    """Decode big_values pairs + count1 quads -> int spectrum is[576], or
    None on an unembedded table. Consumes exactly part2_3_length bits
    total (incl. scalefactors read before this)."""
    bounds = _sfb_bounds(rate)
    if g["window_switching"]:
        region1_start = 36  # clause 2.4.2.7 fixed split for switched blocks
        region2_start = 576
    else:
        region1_start = int(bounds[min(g["region0_count"] + 1, 21)])
        region2_start = int(bounds[min(g["region0_count"] + 1
                                       + g["region1_count"] + 1, 22)])
    is_ = np.zeros(576, dtype=np.int64)
    limit = part2_start + g["part2_3_length"]
    pos = 0
    end_bv = min(2 * g["big_values"], 576)
    while pos < end_bv:
        if pos < region1_start:
            tsel = g["table_select"][0]
        elif pos < region2_start:
            tsel = g["table_select"][1]
        else:
            tsel = g["table_select"][2]
        if tsel == 0:
            pos += 2
            continue
        tree = _DECODE_TREES.get(tsel)
        if tree is None:
            return None  # table outside the embedded subset
        node = tree
        while isinstance(node, dict):
            if bits.pos >= limit:
                return None
            node = node.get("1" if bits.read1() else "0")
            if node is None:
                return None
        x, y = node
        if x and bits.pos < limit:
            x = -x if bits.read1() else x
        if y and bits.pos < limit:
            y = -y if bits.read1() else y
        is_[pos], is_[pos + 1] = x, y
        pos += 2
    # count1 region: quads until part2_3_length is exhausted
    while bits.pos < limit and pos + 4 <= 576:
        if g["count1table_select"] == 1:
            # quad table B: 4-bit literal family (all code lengths 4)
            if limit - bits.pos < 4:
                break
            q = bits.read(4) ^ 0xF
            vals = [(q >> 3) & 1, (q >> 2) & 1, (q >> 1) & 1, q & 1]
        else:
            return None  # quad table A is not embedded
        for i, v in enumerate(vals):
            if v and bits.pos < limit:
                v = -v if bits.read1() else v
            is_[pos + i] = v
        pos += 4
    # stuffing bits to part2_3_length are legal; skip them
    bits.pos = min(limit, len(bits.data) * 8)
    return is_


# --------------------------------------------------------------------------
# Requantize / stereo / reorder / alias / IMDCT
# --------------------------------------------------------------------------

def _requantize(is_: np.ndarray, g, sf, rate: int) -> np.ndarray:
    mag = np.abs(is_).astype(np.float64) ** (4.0 / 3.0)
    gain = 2.0 ** ((g["global_gain"] - 210) / 4.0)
    mult = 0.5 * (1 + g["scalefac_scale"])
    exp = np.zeros(576)
    if g["window_switching"] and g["block_type"] == 2 and not g["mixed_block"]:
        widths = SFB_SHORT[rate]
        pos = 0
        for band, w in enumerate(widths):
            for win in range(3):
                s = sf["short"][band][win] if band < 12 else 0
                sb_gain = 8.0 * g["subblock_gain"][win]
                exp[pos:pos + w] = -mult * s - sb_gain / 4.0
                pos += w
    else:
        bounds = _sfb_bounds(rate)
        for band in range(21):
            s = sf["long"][band] + (PRETAB[band] if g["preflag"] else 0)
            exp[bounds[band]:bounds[band + 1]] = -mult * s
    return np.sign(is_) * mag * gain * (2.0 ** exp)


def _ms_stereo(xl: np.ndarray, xr: np.ndarray):
    inv = 1.0 / np.sqrt(2.0)
    return (xl + xr) * inv, (xl - xr) * inv


def _reorder_short(xr: np.ndarray, rate: int) -> np.ndarray:
    """(band, window, line) storage order -> window-interleaved lines the
    IMDCT consumes (three 12-point blocks per subband)."""
    out = np.zeros_like(xr)
    widths = SFB_SHORT[rate]
    pos = 0
    for w in widths:
        for win in range(3):
            for i in range(w):
                src = pos + win * w + i
                dst = pos + i * 3 + win
                if src < 576 and dst < 576:
                    out[dst] = xr[src]
        pos += 3 * w
    return out


def _alias_reduce(x: np.ndarray) -> np.ndarray:
    out = x.copy()
    for sb in range(1, 32):
        lo = 18 * sb - 1 - np.arange(8)
        hi = 18 * sb + np.arange(8)
        a, b = out[lo].copy(), out[hi].copy()
        out[lo] = a * _ALIAS_CS - b * _ALIAS_CA
        out[hi] = b * _ALIAS_CS + a * _ALIAS_CA
    return out


def _alias_inverse(x: np.ndarray) -> np.ndarray:
    out = x.copy()
    for sb in range(1, 32):
        lo = 18 * sb - 1 - np.arange(8)
        hi = 18 * sb + np.arange(8)
        a, b = out[lo].copy(), out[hi].copy()
        out[lo] = a * _ALIAS_CS + b * _ALIAS_CA   # rotation transpose
        out[hi] = b * _ALIAS_CS - a * _ALIAS_CA
    return out


def _imdct_matrix(n: int) -> np.ndarray:
    i = np.arange(n)[:, None]
    k = np.arange(n // 2)[None, :]
    return np.cos(np.pi / (2 * n) * (2 * i + 1 + n // 2) * (2 * k + 1))


_IMDCT36 = _imdct_matrix(36)
_IMDCT12 = _imdct_matrix(12)


def _block_window(block_type: int) -> np.ndarray:
    n = np.arange(36)
    if block_type == 0:
        return np.sin(np.pi / 36 * (n + 0.5))
    if block_type == 1:  # start
        w = np.sin(np.pi / 36 * (n + 0.5))
        w[18:24] = 1.0
        w[24:30] = np.sin(np.pi / 12 * (n[24:30] - 18 + 0.5))
        w[30:] = 0.0
        return w
    if block_type == 3:  # stop
        w = np.zeros(36)
        w[6:12] = np.sin(np.pi / 12 * (n[6:12] - 6 + 0.5))
        w[12:18] = 1.0
        w[18:] = np.sin(np.pi / 36 * (n[18:] + 0.5))
        return w
    raise ValueError("short blocks use _imdct_short")


_WIN_SHORT = np.sin(np.pi / 12 * (np.arange(12) + 0.5))


def _imdct_subband(X: np.ndarray, block_type: int) -> np.ndarray:
    """18 spectral lines of one subband -> 36 windowed time samples."""
    if block_type == 2:
        out = np.zeros(36)
        for w in range(3):
            y = (_IMDCT12 @ X[w::3]) * _WIN_SHORT
            out[6 + 6 * w:18 + 6 * w] += y
        return out
    return (_IMDCT36 @ X) * _block_window(block_type)


def _granule_to_subbands(xr: np.ndarray, g, overlap: np.ndarray) -> np.ndarray:
    """576 spectral values -> (18, 32) subband samples; updates `overlap`
    (32, 18) in place. Applies frequency inversion."""
    s = np.zeros((18, 32))
    bt = g["block_type"] if g["window_switching"] else 0
    for sb in range(32):
        sub_bt = bt
        if g.get("mixed_block") and sb < 2:
            sub_bt = 0
        y = _imdct_subband(xr[18 * sb:18 * sb + 18], sub_bt)
        s[:, sb] = y[:18] + overlap[sb]
        overlap[sb] = y[18:]
    # frequency inversion: odd time samples of odd subbands
    s[1::2, 1::2] *= -1.0
    return s


# --------------------------------------------------------------------------
# Polyphase filterbank (designed near-PR window pair — see module docstring)
# --------------------------------------------------------------------------

_FB_DELAY = 481  # the spec filterbank's reconstruction delay


def _design_windows():
    """Deterministic (fixed params + fixed RNG seed) analysis/synthesis
    window pair: Kaiser-sinc analysis prototype; synthesis solved per
    polyphase phase by least squares for unit-gain reconstruction at the
    481-sample spec delay.  Measured ~50 dB SNR (test_mp3.py)."""
    L, M = 512, 32
    n = np.arange(L)
    x = (n - (L - 1) / 2) / (2 * M) * 1.1
    c = np.sinc(x) * np.kaiser(L, 5.0)
    c /= c.sum() / M
    # alias-cancelling sign structure (the spec C/D tables embed the same
    # flips; without them reconstruction caps at ~12 dB — measured)
    ca = c.copy()
    for j in range(1, 8, 2):
        ca[64 * j:64 * j + 64] *= -1.0

    rng = np.random.default_rng(7)
    train = rng.standard_normal(M * 1500)
    U = _analysis_u_blocks(train, ca)
    d = np.zeros(L)
    skip = 40
    rows = np.arange(skip, U.shape[0] - 1)
    for i in range(M):
        A = U[rows][:, 32 * np.arange(16) + i]
        t = train[rows * 32 + i - _FB_DELAY]
        sol, *_ = np.linalg.lstsq(A, t, rcond=None)
        d[32 * np.arange(16) + i] = sol
    return ca, d


def _analysis_u_blocks(xs: np.ndarray, ca: np.ndarray) -> np.ndarray:
    """Shared analysis+matrixing+V-gather: returns the U blocks (nblk,
    512) whose windowed 16-fold sum is the synthesis output. Used by the
    window designer and (dotted with D) by synthesis itself."""
    M = 32
    S = _analysis_subbands(xs, ca)
    return _v_to_u(_matrix_v(S))


_MX = np.cos((2 * np.arange(32)[:, None] + 1)
             * (np.arange(64)[None, :] - 16) * np.pi / 64)
_NX = np.cos((16 + np.arange(64)[:, None])
             * (2 * np.arange(32)[None, :] + 1) * np.pi / 64)


def _analysis_subbands(xs: np.ndarray, ca: np.ndarray) -> np.ndarray:
    """PCM -> (nblk, 32) subband samples (spec analysis flowchart,
    vectorized: the 512-FIFO with newest-32-reversed equals a reversed
    sliding window)."""
    M, L = 32, 512
    nblk = len(xs) // M
    pad = np.concatenate([np.zeros(L - M), xs[:nblk * M]])
    rev = pad[::-1]
    win = np.lib.stride_tricks.sliding_window_view(rev, L)[::M][::-1]
    z = win * ca[None, :]
    y = z.reshape(nblk, 8, 64).sum(axis=1)
    return y @ _MX.T


def _matrix_v(S: np.ndarray) -> np.ndarray:
    return S @ _NX.T  # (nblk, 64)


def _v_to_u(V: np.ndarray) -> np.ndarray:
    """V-FIFO gather, vectorized: U_b[64j+i]=v_{b-2j}[i],
    U_b[64j+32+i]=v_{b-2j-1}[32+i] (i<32)."""
    nblk = V.shape[0]
    Vp = np.concatenate([np.zeros((16, 64)), V], axis=0)  # zero history
    U = np.zeros((nblk, 512))
    for j in range(8):
        U[:, 64 * j:64 * j + 32] = Vp[16 - 2 * j:16 - 2 * j + nblk, :32]
        U[:, 64 * j + 32:64 * j + 64] = Vp[15 - 2 * j:15 - 2 * j + nblk, 32:]
    return U


_WINDOWS = None


def _windows():
    global _WINDOWS
    if _WINDOWS is None:
        _WINDOWS = _design_windows()
    return _WINDOWS


class _Synth:
    """Streaming synthesis: per-channel V FIFO (spec structure) with the
    designed D window."""

    def __init__(self):
        self.V = np.zeros(1024)
        _, self.d = _windows()
        # effective window: fold the alias sign flips in once
        self.deff = self.d

    def run(self, s: np.ndarray) -> np.ndarray:
        """(18, 32) subband samples -> 576 PCM samples."""
        out = np.zeros(18 * 32)
        for t in range(18):
            self.V = np.roll(self.V, 64)
            self.V[:64] = _NX @ s[t]
            U = np.zeros(512)
            for j in range(8):
                U[64 * j:64 * j + 32] = self.V[128 * j:128 * j + 32]
                U[64 * j + 32:64 * j + 64] = self.V[128 * j + 96:128 * j + 128]
            out[32 * t:32 * t + 32] = (U * self.deff).reshape(16, 32).sum(axis=0)
        return out


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------

def decode_mp3(payload: bytes):
    """MPEG-1 Layer III bytes -> (samples float64 (n, n_ch), rate) or
    None.  Intensity-stereo frames, non-MPEG-1 streams, and frames using
    Huffman tables outside the embedded subset return None (declared
    tier bounds — module docstring)."""
    try:
        return _decode_mp3_inner(payload)
    except Exception:
        return None


def _decode_mp3_inner(payload: bytes):
    pos = 0
    if payload[:3] == b"ID3" and len(payload) >= 10:
        sz = 0
        for b in payload[6:10]:
            if b & 0x80:
                return None
            sz = (sz << 7) | b
        pos = 10 + sz
    reservoir = b""
    first = None
    pcm_parts = []
    overlap = None
    synth = None
    sf_state = None
    n_frames = 0
    resyncs = 0
    while pos + 4 <= len(payload):
        hdr = int.from_bytes(payload[pos:pos + 4], "big")
        h = _parse_header(hdr)
        if h is None:
            if n_frames:
                break
            resyncs += 1
            if resyncs > 1 << 16:
                return None
            pos += 1
            continue
        if first is None:
            first = h
            n_ch = h["n_ch"]
            overlap = [np.zeros((32, 18)) for _ in range(n_ch)]
            synth = [_Synth() for _ in range(n_ch)]
            sf_state = [None] * n_ch
        elif h["rate"] != first["rate"] or h["n_ch"] != first["n_ch"]:
            break
        if h["mode"] == 1 and (h["mode_ext"] & 1):
            return None  # intensity stereo: outside the tier
        frame = payload[pos:pos + h["frame_len"]]
        if len(frame) < h["frame_len"]:
            break
        off = 4 + (2 if h["protection"] else 0)
        side_len = 17 if h["n_ch"] == 1 else 32
        if len(frame) < off + side_len:
            break
        main_begin, scfsi, granules = _parse_side_info(
            frame[off:off + side_len], h["n_ch"])
        main_data = frame[off + side_len:]
        if main_begin > len(reservoir):
            # not enough reservoir (stream started mid-file): skip frame
            reservoir = (reservoir + main_data)[-511:]
            pos += h["frame_len"]
            n_frames += 1
            continue
        data = (reservoir[len(reservoir) - main_begin:] if main_begin
                else b"") + main_data
        bits = _Bits(data)
        frame_pcm = []
        ok = True
        for gr in range(2):
            xr_ch = []
            for ch in range(h["n_ch"]):
                g = granules[gr][ch]
                part2_start = bits.pos
                sf = _read_scalefactors(bits, g, scfsi[ch], gr, sf_state[ch])
                if "long" in sf:
                    sf_state[ch] = sf
                is_ = _huffman_decode(bits, g, h["rate"], part2_start)
                if is_ is None:
                    ok = False
                    break
                xr_ch.append(_requantize(is_, g, sf, h["rate"]))
            if not ok:
                break
            if h["n_ch"] == 2 and h["mode"] == 1 and (h["mode_ext"] & 2):
                xr_ch = list(_ms_stereo(xr_ch[0], xr_ch[1]))
            ch_pcm = []
            for ch in range(h["n_ch"]):
                g = granules[gr][ch]
                x = xr_ch[ch]
                if g["window_switching"] and g["block_type"] == 2:
                    x = _reorder_short(x, h["rate"])
                    if not g["mixed_block"]:
                        xa = x  # no alias reduction for pure short blocks
                    else:
                        xa = _alias_reduce(x)
                else:
                    xa = _alias_reduce(x)
                s = _granule_to_subbands(xa, g, overlap[ch])
                ch_pcm.append(synth[ch].run(s))
            frame_pcm.append(np.stack(ch_pcm, axis=1))
        if not ok:
            return None
        pcm_parts.extend(frame_pcm)
        reservoir = (reservoir + main_data)[-511:]
        pos += h["frame_len"]
        n_frames += 1
    if not n_frames or not pcm_parts:
        return None
    return np.concatenate(pcm_parts, axis=0), first["rate"]


# --------------------------------------------------------------------------
# Test-grade encoder (fixtures for the physics roundtrip; 44100 long
# blocks, mono or stereo, table-1 {0, +-1} spectra + per-band
# scalefactor gain shaping — the falsifiability twin, same role as
# flac.py's test encoder)
# --------------------------------------------------------------------------

def _mdct_forward(s36: np.ndarray) -> np.ndarray:
    """36 windowed-overlap input samples of one subband -> 18 lines; the
    TDAC inverse of _imdct_subband(block_type=0) (factor 1/9 verified to
    machine precision in test_mp3.py)."""
    w = np.sin(np.pi / 36 * (np.arange(36) + 0.5))
    return (1.0 / 9.0) * ((_IMDCT36 * w[:, None]).T @ s36)


def _quantize_granule(xr: np.ndarray, rate: int):
    """{0, +-1} spectrum + per-band scalefactors + global gain such that
    requantization reproduces each band's dominant amplitude."""
    bounds = _sfb_bounds(rate)
    amax = float(np.max(np.abs(xr)))
    if amax <= 0:
        return (np.zeros(576, np.int64), [0] * 21, 210)
    gg = int(np.clip(round(210 + 4 * np.log2(amax)), 0, 255))
    base = 2.0 ** ((gg - 210) / 4.0)
    sf = [0] * 21
    is_ = np.zeros(576, dtype=np.int64)
    for band in range(22):
        lo, hi = int(bounds[band]), int(bounds[band + 1])
        seg = xr[lo:hi]
        ab = float(np.max(np.abs(seg))) if len(seg) else 0.0
        if ab <= 0.0:
            continue
        # slen caps: scalefac_compress=15 -> slen (4, 3); band 21 has no
        # scalefactor at all
        cap = (15 if band < 11 else 7) if band < 21 else 0
        s_exact = 2 * np.log2(base / ab)
        if s_exact > cap + 1:
            # below the band's representable range: emitting +-1 would
            # OVERSHOOT the true amplitude by > ~41% — this is exactly
            # how filterbank leakage (-40 dB) became full-scale spurs in
            # high bands before this guard (measured); drop the band
            continue
        s = int(np.clip(round(s_exact), 0, cap))
        if band < 21:
            sf[band] = s
        keep = np.abs(seg) > 0.5 * ab
        is_[lo:hi] = np.where(keep, np.sign(seg), 0).astype(np.int64)
    return is_, sf, gg


def _encode_granule_bits(is_: np.ndarray, sf: list[int], gg: int):
    """Main-data bits + side-info fields for one mono granule."""
    w = _BitWriter()
    for band in range(21):
        w.write(sf[band], 4 if band < 11 else 3)
    nz = np.nonzero(is_)[0]
    last = int(nz[-1]) + 1 if len(nz) else 0
    big_values = (last + 1) // 2
    tbl = HUFF_PAIRS[1]
    for p in range(big_values):
        x, y = int(is_[2 * p]), int(is_[2 * p + 1])
        w.write_code(tbl[(abs(x), abs(y))])
        if x:
            w.write(1 if x < 0 else 0, 1)
        if y:
            w.write(1 if y < 0 else 0, 1)
    side = {
        "part2_3_length": len(w),
        "big_values": big_values,
        "global_gain": gg,
        "scalefac_compress": 15,
        "table_select": [1, 1, 1],
        "region0_count": 7,
        "region1_count": 7,
    }
    return w, side


def encode_mp3_fixture(x: np.ndarray, rate: int = 44100,
                       kbps: int = 320) -> bytes:
    """Mono (n,) or stereo (n, 2) float64 -> MPEG-1 Layer III bytes the
    decoder above reproduces (physics-tested). Long blocks, table 1,
    main_data_begin=0, one frame per 1152 samples."""
    if x.ndim == 1:
        x = x[:, None]
    n_ch = x.shape[1]
    assert n_ch in (1, 2)
    ca, _ = _windows()
    n = x.shape[0]
    n_frames = (n + 1151) // 1152
    x = np.vstack([x, np.zeros((n_frames * 1152 - n, n_ch))])
    # analysis + MDCT per channel
    spectra = []  # [ch][granule] -> 576 values
    for ch in range(n_ch):
        S = _analysis_subbands(x[:, ch], ca)       # (18*2*n_frames, 32)
        S = S.copy()
        # decoder applies frequency inversion AFTER IMDCT; pre-invert so
        # the cascade nets out (involutive)
        n_gr = S.shape[0] // 18
        St = S[:n_gr * 18].reshape(n_gr, 18, 32)
        St[:, 1::2, 1::2] *= -1.0
        grs = []
        prev = np.zeros((18, 32))
        for gidx in range(n_gr):
            cur = St[gidx]
            xr = np.zeros(576)
            both = np.vstack([prev, cur])          # (36, 32)
            for sb in range(32):
                xr[18 * sb:18 * sb + 18] = _mdct_forward(both[:, sb])
            grs.append(_alias_inverse(xr))
            prev = cur
        spectra.append(grs)
    n_gr = len(spectra[0])
    frame_len = 144 * kbps * 1000 // rate
    hdr = (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16)
    hdr |= _BITRATE_L3.index(kbps) << 12
    hdr |= {44100: 0, 48000: 1, 32000: 2}[rate] << 10
    hdr |= (3 if n_ch == 1 else 0) << 6
    out = bytearray()
    for f in range(n_gr // 2):
        side = _BitWriter()
        side.write(0, 9)                       # main_data_begin
        side.write(0, 5 if n_ch == 1 else 3)   # private
        for _ch in range(n_ch):
            side.write(0, 4)                   # scfsi: transmit both
        main = _BitWriter()
        for gr in range(2):
            for ch in range(n_ch):
                xr = spectra[ch][2 * f + gr]
                is_, sf, gg = _quantize_granule(xr, rate)
                w, s = _encode_granule_bits(is_, sf, gg)
                main.bits.extend(w.bits)
                side.write(s["part2_3_length"], 12)
                side.write(s["big_values"], 9)
                side.write(s["global_gain"], 8)
                side.write(s["scalefac_compress"], 4)
                side.write(0, 1)               # window_switching off
                for t in s["table_select"]:
                    side.write(t, 5)
                side.write(s["region0_count"], 4)
                side.write(s["region1_count"], 3)
                side.write(0, 1)               # preflag
                side.write(0, 1)               # scalefac_scale
                side.write(1, 1)               # count1table_select = B
        side_bytes = side.to_bytes()
        main_bytes = main.to_bytes()
        avail = frame_len - 4 - len(side_bytes)
        if len(main_bytes) > avail:
            raise ValueError("fixture spectrum too dense for the bitrate")
        frame = (hdr.to_bytes(4, "big") + side_bytes + main_bytes
                 + b"\x00" * (avail - len(main_bytes)))
        out += frame
    return bytes(out)
