"""Pure-Python/numpy FLAC decoder (+ a test-grade encoder).

From-spec implementation of the FLAC format (RFC 9639 / xiph spec) with
no external deps, mirroring jpeg.py's role for images: real lossless
audio decode for the multimodal tier instead of a declared seam.

Decoder coverage:
* STREAMINFO + skipped metadata blocks (padding, vorbis comment, ...)
* fixed & variable blocking strategies, all block-size / sample-rate /
  sample-size header codes (incl. end-of-header 8/16-bit forms)
* subframes: CONSTANT, VERBATIM, FIXED (orders 0-4), LPC (1-32) with
  wasted-bits shift
* Rice residuals, both 4-bit and 5-bit parameter widths, partitioned,
  incl. the escape-to-raw-binary code (param all-ones)
* stereo decorrelation: independent, left/side, right/side, mid/side
  (side channel read at bps+1 per spec)
* integrity: frame-header CRC-8 (poly 0x07) and whole-frame CRC-16
  (poly 0x8005) are verified — corrupt payloads return None, never
  garbage samples (same contract as jpeg.decode_jpeg on damaged bytes)

The encoder exists to make the decoder falsifiable without binary
fixtures: it emits spec-conformant streams (CONSTANT / VERBATIM /
FIXED-order subframes, single-partition Rice, all four channel modes)
so tests can assert decode(encode(x)) == x bit-exactly across depths
and modes, alongside hand-assembled golden streams built bit-by-bit in
the tests themselves. It is NOT a production encoder (no LPC analysis,
no partition-order search).

Everything here is CPython-speed bit twiddling — fine for fixtures and
sampled media spans; the Spark-side contract is unchanged (Arrow-
batched mapInPandas in multimodal.py, one payload at a time).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- CRC --

def _crc8(data: bytes) -> int:
    """CRC-8, polynomial x^8 + x^2 + x + 1 (0x07), init 0 (FLAC frame
    header CRC)."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, polynomial x^16 + x^15 + x^2 + 1 (0x8005), init 0 (FLAC
    whole-frame CRC)."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


# --------------------------------------------------------- bit reader --

class _Bits:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos_bits: int = 0):
        self.buf = buf
        self.pos = pos_bits

    def read(self, n: int) -> int:
        """n-bit MSB-first unsigned read."""
        v = 0
        pos, buf = self.pos, self.buf
        end = pos + n
        if end > len(buf) * 8:
            raise ValueError("out of bits")
        while n:
            byte = buf[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, n)
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            pos += take
            n -= take
        self.pos = pos
        return v

    def sread(self, n: int) -> int:
        """n-bit two's-complement signed read."""
        v = self.read(n)
        return v - (1 << n) if v >= 1 << (n - 1) else v

    def unary(self) -> int:
        """Count 0-bits up to the terminating 1-bit."""
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 20:  # corrupt-stream guard
                raise ValueError("unary runaway")
        return q

    def align(self):
        self.pos = (self.pos + 7) & ~7


# --------------------------------------------------------- decoder -----

_BLOCKSIZE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
              8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
              13: 8192, 14: 16384, 15: 32768}
_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
          7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_DEPTHS = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

# fixed-predictor coefficients by order (s[i] = r[i] + sum c_j s[i-1-j])
_FIXED = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _read_utf8_number(bits: _Bits) -> int:
    """FLAC's extended UTF-8 coded frame/sample number (up to 56 bits)."""
    first = bits.read(8)
    if first < 0x80:
        return first
    n = 0
    mask = 0x40
    while first & mask:
        n += 1
        mask >>= 1
    if n == 0 or n > 6:
        raise ValueError("bad utf8 number")
    v = first & (mask - 1)
    for _ in range(n):
        c = bits.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad utf8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _rice_residual(bits: _Bits, blocksize: int, order: int) -> list[int]:
    method = bits.read(2)
    if method > 1:
        raise ValueError("reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = bits.read(4)
    if blocksize % (1 << po):
        raise ValueError("partition does not divide blocksize")
    out = []
    for p in range(1 << po):
        n = blocksize >> po
        if p == 0:
            n -= order
        if n < 0:
            raise ValueError("order exceeds first partition")
        param = bits.read(pbits)
        if param == escape:
            raw = bits.read(5)
            if raw == 0:
                out.extend([0] * n)
            else:
                out.extend(bits.sread(raw) for _ in range(n))
        else:
            for _ in range(n):
                q = bits.unary()
                lo = bits.read(param) if param else 0
                u = (q << param) | lo
                out.append(-(u >> 1) - 1 if u & 1 else u >> 1)
    return out


def _subframe(bits: _Bits, blocksize: int, bps: int) -> list[int]:
    if bits.read(1):
        raise ValueError("subframe padding bit set")
    t = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = bits.unary() + 1
    bps -= wasted
    if t == 0:  # CONSTANT
        out = [bits.sread(bps)] * blocksize
    elif t == 1:  # VERBATIM
        out = [bits.sread(bps) for _ in range(blocksize)]
    elif 8 <= t <= 12:  # FIXED, order t-8
        order = t - 8
        warm = [bits.sread(bps) for _ in range(order)]
        res = _rice_residual(bits, blocksize, order)
        coefs = _FIXED[order]
        out = list(warm)
        for r in res:
            pred = sum(c * out[-1 - j] for j, c in enumerate(coefs))
            out.append(r + pred)
    elif t >= 32:  # LPC, order t-31
        order = t - 31
        warm = [bits.sread(bps) for _ in range(order)]
        prec = bits.read(4)
        if prec == 15:
            raise ValueError("invalid qlp precision")
        prec += 1
        shift = bits.sread(5)
        if shift < 0:
            raise ValueError("negative qlp shift")
        coefs = [bits.sread(prec) for _ in range(order)]
        res = _rice_residual(bits, blocksize, order)
        out = list(warm)
        for r in res:
            acc = sum(c * out[-1 - j] for j, c in enumerate(coefs))
            out.append(r + (acc >> shift))
    else:
        raise ValueError(f"reserved subframe type {t}")
    if wasted:
        out = [s << wasted for s in out]
    return out


def decode_flac(payload: bytes):
    """FLAC bytes -> (samples int32 ndarray [n, channels], sample_rate,
    bits_per_sample), or None for non-FLAC / corrupt input (CRC-checked;
    never raises, never returns garbage — same contract as
    jpeg.decode_jpeg)."""
    try:
        return _decode(payload)
    except Exception:
        return None


def _decode(payload: bytes):
    if payload[:4] != b"fLaC":
        return None
    pos = 4
    info = None
    while True:
        if pos + 4 > len(payload):
            return None
        hdr = payload[pos]
        last, btype = hdr & 0x80, hdr & 0x7F
        (ln,) = struct.unpack(">I", b"\x00" + payload[pos + 1:pos + 4])
        body = payload[pos + 4:pos + 4 + ln]
        pos += 4 + ln
        if btype == 0:
            if ln < 34:
                return None
            b = _Bits(body)
            b.read(16), b.read(16)          # min/max blocksize
            b.read(24), b.read(24)          # min/max framesize
            rate = b.read(20)
            channels = b.read(3) + 1
            bps = b.read(5) + 1
            total = b.read(36)
            info = (rate, channels, bps, total)
        if last:
            break
    if info is None or info[0] == 0:
        return None
    rate, channels, bps, total = info

    chans: list[list[int]] = [[] for _ in range(channels)]
    while pos < len(payload):
        frame_start = pos
        bits = _Bits(payload, pos * 8)
        sync = bits.read(14)
        if sync != 0x3FFE:
            return None
        if bits.read(1):
            raise ValueError("reserved bit set")
        bits.read(1)  # blocking strategy (number semantics only)
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ch_code = bits.read(4)
        ss_code = bits.read(3)
        if bits.read(1):
            raise ValueError("reserved bit set")
        _read_utf8_number(bits)
        if bs_code == 0:
            raise ValueError("reserved blocksize code")
        elif bs_code == 6:
            blocksize = bits.read(8) + 1
        elif bs_code == 7:
            blocksize = bits.read(16) + 1
        else:
            blocksize = _BLOCKSIZE[bs_code]
        if sr_code == 12:
            bits.read(8)
        elif sr_code in (13, 14):
            bits.read(16)
        elif sr_code == 15:
            raise ValueError("invalid sample rate code")
        fbps = bps if ss_code == 0 else _DEPTHS.get(ss_code)
        if fbps is None:
            raise ValueError("reserved sample size code")
        hdr_len = (bits.pos + 7) // 8 - frame_start
        if _crc8(payload[frame_start:frame_start + hdr_len]) != bits.read(8):
            raise ValueError("frame header CRC mismatch")

        if ch_code < 8:
            n_ch = ch_code + 1
            if n_ch != channels:
                raise ValueError("channel count mismatch")
            sub = [_subframe(bits, blocksize, fbps) for _ in range(n_ch)]
        elif ch_code in (8, 9, 10):
            if channels != 2:
                raise ValueError("stereo decorrelation on non-stereo stream")
            if ch_code == 8:    # left/side
                left = _subframe(bits, blocksize, fbps)
                side = _subframe(bits, blocksize, fbps + 1)
                sub = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # right/side (side first)
                side = _subframe(bits, blocksize, fbps + 1)
                right = _subframe(bits, blocksize, fbps)
                sub = [[r + s for r, s in zip(right, side)], right]
            else:               # mid/side
                mid = _subframe(bits, blocksize, fbps)
                side = _subframe(bits, blocksize, fbps + 1)
                left, right = [], []
                for m, s in zip(mid, side):
                    m = (m << 1) | (s & 1)
                    left.append((m + s) >> 1)
                    right.append((m - s) >> 1)
                sub = [left, right]
        else:
            raise ValueError("reserved channel assignment")
        bits.align()
        body_len = bits.pos // 8 - frame_start
        if _crc16(payload[frame_start:frame_start + body_len]) != bits.read(16):
            raise ValueError("frame CRC mismatch")
        for c in range(channels):
            chans[c].extend(sub[c])
        pos = bits.pos // 8

    n = len(chans[0])
    if total:
        n = min(n, total)
    if n == 0:
        return None
    out = np.empty((n, channels), dtype=np.int64)
    for c in range(channels):
        out[:, c] = chans[c][:n]
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if out.min() < lo or out.max() > hi:
        raise ValueError("sample out of range for declared depth")
    return out.astype(np.int32), rate, bps


# --------------------------------------------------------- encoder -----

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, v: int, n: int):
        if n == 0:
            return
        v &= (1 << n) - 1
        self.acc = (self.acc << n) | v
        self.nacc += n
        while self.nacc >= 8:
            self.nacc -= 8
            self.out.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def align(self):
        if self.nacc:
            self.write(0, 8 - self.nacc)

    def bytes(self) -> bytes:
        assert self.nacc == 0
        return bytes(self.out)


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    for cont in range(1, 7):
        capacity = (6 - cont) + 6 * cont  # lead-byte data bits + 6/cont byte
        if n < 1 << capacity:
            lead = (0xFF << (7 - cont)) & 0xFF
            first = lead | (n >> (6 * cont))
            rest = [0x80 | ((n >> (6 * (cont - 1 - i))) & 0x3F)
                    for i in range(cont)]
            return bytes([first] + rest)
    raise ValueError("frame number too large")


def _rice_write(w: _BitWriter, residuals: list[int], pbits: int = 4):
    """Single-partition Rice coding with a brute-force best parameter."""
    zz = [(-r * 2 - 1) if r < 0 else r * 2 for r in residuals]
    escape = (1 << pbits) - 1
    best, best_cost = 0, None
    for param in range(escape):
        cost = sum((u >> param) + 1 + param for u in zz)
        if best_cost is None or cost < best_cost:
            best, best_cost = param, cost
    w.write(0 if pbits == 4 else 1, 2)  # method
    w.write(0, 4)                       # partition order 0
    w.write(best, pbits)
    for u in zz:
        q = u >> best
        if q > 1 << 16:
            raise ValueError("residual too large for test encoder")
        for _ in range(q):
            w.write(0, 1)
        w.write(1, 1)
        w.write(u, best)


def encode_flac(samples, rate: int, bps: int = 16, blocksize: int = 256,
                mode: str = "auto", fixed_order: int = 2) -> bytes:
    """Test-grade FLAC encoder: spec-conformant streams the decoder (and
    any conformant decoder) accepts. samples: int array [n] or [n, ch].
    mode: 'auto' (constant where possible else fixed), 'verbatim',
    'fixed', or for 2-channel input 'left_side' / 'right_side' /
    'mid_side' (fixed-coded subframes after decorrelation)."""
    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, channels = x.shape
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if x.min() < lo or x.max() > hi:
        raise ValueError("samples exceed bps")

    head = _BitWriter()
    head.write(1, 1)          # last metadata block
    head.write(0, 7)          # STREAMINFO
    head.write(34, 24)
    head.write(blocksize, 16)
    head.write(blocksize, 16)
    head.write(0, 24)
    head.write(0, 24)
    head.write(rate, 20)
    head.write(channels - 1, 3)
    head.write(bps - 1, 5)
    head.write(n, 36)
    for _ in range(16):
        head.write(0, 8)      # md5 unset

    def subframe(w: _BitWriter, ch: np.ndarray, sub_bps: int):
        ch = [int(v) for v in ch]
        if mode == "verbatim":
            w.write(0, 1), w.write(1, 6), w.write(0, 1)
            for v in ch:
                w.write(v, sub_bps)
        elif mode != "verbatim" and len(set(ch)) == 1 and mode == "auto":
            w.write(0, 1), w.write(0, 6), w.write(0, 1)
            w.write(ch[0], sub_bps)
        else:
            order = min(fixed_order, len(ch))
            coefs = _FIXED[order]
            w.write(0, 1), w.write(8 + order, 6), w.write(0, 1)
            for v in ch[:order]:
                w.write(v, sub_bps)
            res = [
                ch[i] - sum(c * ch[i - 1 - j] for j, c in enumerate(coefs))
                for i in range(order, len(ch))
            ]
            _rice_write(w, res)

    frames = bytearray()
    for f, start in enumerate(range(0, n, blocksize)):
        blk = x[start:start + blocksize]
        this_bs = blk.shape[0]
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)         # fixed blocking
        w.write(6, 4)         # 8-bit blocksize-1 at end of header
        w.write(0, 4)         # rate from STREAMINFO
        ch_code = {"left_side": 8, "right_side": 9,
                   "mid_side": 10}.get(mode, channels - 1)
        w.write(ch_code, 4)
        w.write(0, 3)         # bps from STREAMINFO
        w.write(0, 1)
        for b in _utf8_number(f):
            w.write(b, 8)
        w.write(this_bs - 1, 8)
        w.align()
        hdr = w.bytes()
        w2 = _BitWriter()
        for b in hdr:
            w2.write(b, 8)
        w2.write(_crc8(hdr), 8)
        if ch_code < 8:
            for c in range(channels):
                subframe(w2, blk[:, c], bps)
        else:
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            if mode == "left_side":
                subframe(w2, left, bps)
                subframe(w2, side, bps + 1)
            elif mode == "right_side":
                subframe(w2, side, bps + 1)
                subframe(w2, right, bps)
            else:
                mid = (left + right) >> 1
                subframe(w2, mid, bps)
                subframe(w2, side, bps + 1)
        w2.align()
        body = w2.bytes()
        w3 = _BitWriter()
        for b in body:
            w3.write(b, 8)
        w3.write(_crc16(body), 16)
        frames.extend(w3.bytes())

    return b"fLaC" + head.bytes() + bytes(frames)
