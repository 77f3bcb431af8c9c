"""FLAC codec (smartcrawler_spark/flac.py): roundtrip exactness, hand-
assembled golden streams (independent in-test bit writer + table-driven
CRCs, so the module's writer/CRC can't vouch for itself), LPC / escape /
wasted-bits paths, fuzz, and decode_audio integration.

No Spark session needed — pure numpy/stdlib."""

from __future__ import annotations

import numpy as np
import pytest

from smartcrawler_spark import flac


# ---------------------------------------------------------------------
# independent helpers (deliberately different implementations from the
# module: string-of-bits writer, table-driven CRCs)

class Bits:
    def __init__(self):
        self.s = ""

    def w(self, v, n):
        self.s += format(v & ((1 << n) - 1), f"0{n}b") if n else ""
        return self

    def bytes(self):
        s = self.s + "0" * (-len(self.s) % 8)
        return bytes(int(s[i:i + 8], 2) for i in range(0, len(s), 8))


def _make_table(poly, width):
    table = []
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) & mask if r & top else (r << 1) & mask
        table.append(r)
    return table


_T8 = _make_table(0x07, 8)
_T16 = _make_table(0x8005, 16)


def crc8(data):
    r = 0
    for b in data:
        r = _T8[r ^ b]
    return r


def crc16(data):
    r = 0
    for b in data:
        r = _T16[((r >> 8) ^ b) & 0xFF] ^ ((r << 8) & 0xFFFF)
    return r


def streaminfo(rate, channels, bps, total, blocksize=256):
    b = Bits()
    b.w(1, 1).w(0, 7).w(34, 24)
    b.w(blocksize, 16).w(blocksize, 16).w(0, 24).w(0, 24)
    b.w(rate, 20).w(channels - 1, 3).w(bps - 1, 5).w(total, 36)
    for _ in range(16):
        b.w(0, 8)
    return b.bytes()


def frame_header(blocksize, frame_no=0, ch_code=0):
    b = Bits()
    b.w(0x3FFE, 14).w(0, 1).w(0, 1)
    b.w(6, 4)          # 8-bit blocksize-1 at end
    b.w(0, 4)          # rate from STREAMINFO
    b.w(ch_code, 4)
    b.w(0, 3).w(0, 1)  # bps from STREAMINFO
    b.w(frame_no, 8)   # utf8 (< 0x80)
    b.w(blocksize - 1, 8)
    hdr = b.bytes()
    return hdr + bytes([crc8(hdr)])


def finish_frame(hdr, body_bits):
    body = hdr + body_bits.bytes()
    return body + crc16(body).to_bytes(2, "big")


# ---------------------------------------------------------------------
# golden streams


def test_golden_constant_frame_hand_assembled():
    # 4 samples of value -5 at 16-bit mono: every byte below is produced
    # by an independent writer + table CRCs, never the module's encoder
    hdr = frame_header(4)
    sub = Bits().w(0, 1).w(0, 6).w(0, 1).w(-5, 16)
    payload = b"fLaC" + streaminfo(8000, 1, 16, 4) + finish_frame(hdr, sub)
    s, rate, bps = flac.decode_flac(payload)
    assert rate == 8000 and bps == 16
    assert s[:, 0].tolist() == [-5, -5, -5, -5]


def test_golden_lpc_subframe_hand_assembled():
    # order-1 LPC: s[i] = r[i] + ((coef * s[i-1]) >> shift)
    # warmup s0=100, coef=3 (prec 4), shift=1, residuals [2,-1,0,5,-3]
    coef, shift, s0 = 3, 1, 100
    res = [2, -1, 0, 5, -3]
    want = [s0]
    for r in res:
        want.append(r + ((coef * want[-1]) >> shift))
    sub = Bits()
    sub.w(0, 1).w(32, 6).w(0, 1)       # LPC order 1 (t = 31 + 1)
    sub.w(s0, 16)                       # warmup
    sub.w(4 - 1, 4).w(shift, 5).w(coef, 4)
    sub.w(0, 2).w(0, 4).w(2, 4)         # rice method 0, po 0, param 2
    for r in res:
        u = (-r * 2 - 1) if r < 0 else r * 2
        for _ in range(u >> 2):
            sub.w(0, 1)
        sub.w(1, 1).w(u, 2)
    hdr = frame_header(6)
    payload = b"fLaC" + streaminfo(8000, 1, 16, 6) + finish_frame(hdr, sub)
    s, _, _ = flac.decode_flac(payload)
    assert s[:, 0].tolist() == want


def test_golden_escape_residual_and_wasted_bits():
    # fixed order 0, wasted bits = 2, residual partition escaped to raw
    # 6-bit binary: decoded samples = raw << 2
    raw = [5, -3, 0, 31, -32]
    sub = Bits()
    sub.w(0, 1).w(8, 6).w(1, 1)        # FIXED order 0, wasted flag
    sub.w(0, 1)                         # unary 1 zero... -> wasted = 2
    # unary() counts zeros then the terminating 1; k-1 encoded: one zero
    sub.w(1, 1)
    sub.w(0, 2).w(0, 4).w(0xF, 4)       # method 0, po 0, param escape
    sub.w(6, 5)                         # 6-bit raw samples
    for v in raw:
        sub.w(v, 6)
    hdr = frame_header(5)
    payload = b"fLaC" + streaminfo(8000, 1, 16, 5) + finish_frame(hdr, sub)
    s, _, _ = flac.decode_flac(payload)
    assert s[:, 0].tolist() == [v << 2 for v in raw]


def test_golden_crc_mismatch_returns_none():
    hdr = frame_header(4)
    sub = Bits().w(0, 1).w(0, 6).w(0, 1).w(7, 16)
    frame = bytearray(finish_frame(hdr, sub))
    frame[-1] ^= 0x01  # break frame CRC-16
    payload = b"fLaC" + streaminfo(8000, 1, 16, 4) + bytes(frame)
    assert flac.decode_flac(payload) is None


# ---------------------------------------------------------------------
# roundtrips (module encoder is spec-conformant; decoder must be exact)


@pytest.mark.parametrize("bps", [8, 12, 16, 20, 24])
def test_roundtrip_depths_exact(bps):
    rng = np.random.RandomState(bps)
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    x = np.clip(np.cumsum(rng.randint(-40, 41, 777)), lo, hi)
    s, rate, got_bps = flac.decode_flac(
        flac.encode_flac(x, 16000, bps=bps, blocksize=192, mode="fixed"))
    assert (rate, got_bps) == (16000, bps)
    assert np.array_equal(s[:, 0], x)


@pytest.mark.parametrize("mode", ["auto", "verbatim", "fixed",
                                  "left_side", "right_side", "mid_side"])
def test_roundtrip_stereo_modes_exact(mode):
    rng = np.random.RandomState(1)
    left = np.cumsum(rng.randint(-60, 61, 1000))
    right = left + rng.randint(-9, 10, 1000)
    st = np.stack([left, right], axis=1)
    s, rate, bps = flac.decode_flac(
        flac.encode_flac(st, 44100, bps=16, blocksize=256, mode=mode))
    assert np.array_equal(s, st), mode


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_roundtrip_fixed_orders_exact(order):
    rng = np.random.RandomState(order)
    x = np.cumsum(rng.randint(-30, 31, 500))
    s, _, _ = flac.decode_flac(
        flac.encode_flac(x, 8000, mode="fixed", fixed_order=order))
    assert np.array_equal(s[:, 0], x)


def test_roundtrip_three_channels_and_odd_tail():
    rng = np.random.RandomState(3)
    x = rng.randint(-1000, 1000, (515, 3))  # 515 = 2 full blocks + tail
    s, _, _ = flac.decode_flac(flac.encode_flac(x, 48000, blocksize=200,
                                                mode="fixed"))
    assert np.array_equal(s, x)


def test_roundtrip_constant_and_single_sample():
    c = np.full(300, 42)
    s, _, _ = flac.decode_flac(flac.encode_flac(c, 8000, mode="auto"))
    assert np.array_equal(s[:, 0], c)
    one = np.array([-7])
    s, _, _ = flac.decode_flac(flac.encode_flac(one, 8000, mode="auto"))
    assert s[:, 0].tolist() == [-7]


# ---------------------------------------------------------------------
# fuzz: never crash, never silent garbage


def test_fuzz_bitflips_never_crash_or_pass_crc():
    rng = np.random.RandomState(99)
    x = np.cumsum(rng.randint(-20, 21, 400))
    enc = flac.encode_flac(x, 8000, mode="fixed")
    for i in range(0, len(enc), 7):
        bad = bytearray(enc)
        bad[i] ^= 1 << (i % 8)
        out = flac.decode_flac(bytes(bad))
        if out is not None:
            # flips confined to ignored fields (e.g. STREAMINFO md5 /
            # min-max framesize) may still decode — samples must be exact
            assert np.array_equal(out[0][:, 0], x)


def test_fuzz_truncation_and_junk():
    x = np.arange(100)
    enc = flac.encode_flac(x, 8000, mode="fixed")
    for cut in (0, 3, 10, len(enc) // 2, len(enc) - 1):
        assert flac.decode_flac(enc[:cut]) is None or cut == len(enc)
    assert flac.decode_flac(b"") is None
    assert flac.decode_flac(b"fLaC") is None
    assert flac.decode_flac(b"RIFF....WAVE") is None


# ---------------------------------------------------------------------
# integration: decode_audio speaks FLAC now


def test_decode_audio_flac_integration():
    from smartcrawler_spark.multimodal import decode_audio

    t = np.arange(2000)
    x = np.round(20000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int64)
    enc = flac.encode_flac(x, 8000, bps=16, mode="fixed")
    mono, rate = decode_audio(enc)
    assert rate == 8000
    assert np.allclose(mono, x / 32768.0)
    # stereo downmix = mean of channels
    st = np.stack([x, np.zeros_like(x)], axis=1)
    mono2, _ = decode_audio(flac.encode_flac(st, 8000, mode="mid_side"))
    assert np.allclose(mono2, x / 65536.0)
