"""Baseline JPEG codec: spec vectors, independent IDCT cross-check,
roundtrip error bounds, and the real-pipeline integration.

JPEG is lossy, so unlike PNG there is no bit-exact pixel oracle; the
evidence is layered instead:
* a HAND-BUILT minimal stream (independent canonical-code construction in
  this file, not the encoder) whose decoded output is computable by hand
  from T.81 — a DC-only block is the flat plane round(dc/8) + 128;
* the decoder's separable IDCT against an independent direct O(n^4)
  implementation of the T.81 Annex A formula;
* near-lossless roundtrip at quant=all-ones, where the only error source
  is DCT float rounding (bounded at ±2);
* lossy roundtrips (4:4:4 and 4:2:0, with and without restart markers)
  under explicit error bounds.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from smartcrawler_spark import multimodal as MM
from smartcrawler_spark.jpeg import (
    _STD_AC_LUMA,
    _STD_DC_LUMA,
    decode_jpeg,
    encode_jpeg_baseline,
)

# ---------------------------------------------------------------------------
# independent canonical-Huffman code derivation (test-local, per T.81 C.2)
# ---------------------------------------------------------------------------


def _codes(bits, huffval):
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[huffval[k]] = format(code, f"0{ln}b")
            code += 1
            k += 1
        code <<= 1
    return out


def _bits_to_bytes(bitstr):
    pad = (-len(bitstr)) % 8
    bitstr += "1" * pad
    return bytes(int(bitstr[i:i + 8], 2) for i in range(0, len(bitstr), 8))


def _minimal_gray_jpeg(dc_value: int, w=8, h=8) -> bytes:
    """Hand-assembled single-component baseline JPEG: identity quant, one
    8x8 block, DC = dc_value, no AC (EOB)."""
    dc_codes = _codes(*_STD_DC_LUMA)
    ac_codes = _codes(*_STD_AC_LUMA)
    s = dc_value.bit_length()
    assert dc_value > 0
    stream = dc_codes[s] + format(dc_value, f"0{s}b") + ac_codes[0x00]
    data = _bits_to_bytes(stream)

    def seg(marker, body):
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0]) + bytes([1] * 64))  # identity quant
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    bits, vals = _STD_DC_LUMA
    out += seg(0xC4, bytes([0x00]) + bytes(bits) + bytes(vals))
    bits, vals = _STD_AC_LUMA
    out += seg(0xC4, bytes([0x10]) + bytes(bits) + bytes(vals))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += data + b"\xff\xd9"
    return out


def test_spec_vector_dc_only_flat_block():
    # T.81: DC-only coefficient v with identity quant decodes to the flat
    # plane round(v/8) + 128 (orthonormal IDCT: every basis-0 pixel = v/8)
    for v in (8, 64, 100):
        got = decode_jpeg(_minimal_gray_jpeg(v))
        assert got is not None and got.shape == (8, 8, 3)
        want = int(np.clip(round(v / 8) + 128, 0, 255))
        assert (got == want).all(), (v, got[0, 0], want)


def test_idct_matches_direct_formula():
    # decoder kernel (separable M @ F @ M.T) vs the direct Annex-A double
    # sum, independently implemented here
    from smartcrawler_spark.jpeg import _M

    rng = np.random.default_rng(9)
    coefs = rng.integers(-200, 200, (8, 8)).astype(np.float64)

    direct = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = (1 / np.sqrt(2)) if u == 0 else 1.0
                    cv = (1 / np.sqrt(2)) if v == 0 else 1.0
                    s += (cu * cv / 4.0 * coefs[u, v]
                          * np.cos((2 * x + 1) * u * np.pi / 16)
                          * np.cos((2 * y + 1) * v * np.pi / 16))
            direct[x, y] = s
    sep = _M @ coefs @ _M.T
    assert np.abs(sep - direct).max() < 1e-9


def _test_image(h=40, w=56):
    # smooth image: JPEG's favorable regime, keeps error bounds honest
    yy, xx = np.mgrid[0:h, 0:w]
    r = (128 + 90 * np.sin(xx / 9.0) * np.cos(yy / 7.0))
    g = (128 + 80 * np.cos(xx / 11.0))
    b = (128 + 70 * np.sin((xx + yy) / 13.0))
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


def test_roundtrip_near_lossless_identity_quant():
    img = _test_image()
    ones = np.ones(64, dtype=np.int64)
    dec = decode_jpeg(encode_jpeg_baseline(img, quant_override=ones))
    assert dec is not None and dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int)).max()
    assert err <= 2, err  # only FDCT/IDCT float rounding survives


def test_roundtrip_gray_identity_is_exact_for_flat():
    flat = np.full((16, 16), 77, dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg_baseline(
        flat, quant_override=np.ones(64, dtype=np.int64)))
    assert (dec == 77).all()


@pytest.mark.parametrize("quality,subsample,bound", [
    (90, False, 12), (85, False, 16), (90, True, 30),
])
def test_roundtrip_lossy_bounded(quality, subsample, bound):
    img = _test_image()
    dec = decode_jpeg(encode_jpeg_baseline(img, quality=quality,
                                           subsample=subsample))
    assert dec is not None and dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= bound, err.max()
    assert err.mean() <= 4.0, err.mean()


def test_restart_markers_roundtrip():
    img = _test_image(24, 80)  # 10 MCUs per row at 4:4:4
    ones = np.ones(64, dtype=np.int64)
    enc = encode_jpeg_baseline(img, quant_override=ones, restart_interval=3)
    assert b"\xff\xd0" in enc or b"\xff\xd1" in enc  # markers really present
    dec = decode_jpeg(enc)
    assert dec is not None
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_unsupported_profiles_return_none():
    img = _test_image(16, 16)
    enc = bytearray(encode_jpeg_baseline(img, quality=90))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC9  # arithmetic coding: unsupported
    assert decode_jpeg(bytes(enc)) is None
    # SOF0 flipped to SOF2 leaves a baseline SOS (Ss=0, Se=63) which is an
    # ILLEGAL progressive scan header — must reject, not crash
    enc[i + 1] = 0xC2
    assert decode_jpeg(bytes(enc)) is None
    assert decode_jpeg(b"\xff\xd8\xff\xd9") is None  # empty
    assert decode_jpeg(b"not a jpeg") is None
    # truncated entropy data
    full = encode_jpeg_baseline(img, quality=90)
    assert decode_jpeg(full[: len(full) // 2]) is None


# ---------------------------------------------------------------------------
# progressive (SOF2): spectral selection + successive approximation
# ---------------------------------------------------------------------------


def _noisy_image(h=40, w=56, seed=3):
    # broadband content: exercises ZRL, long runs, dense refinement bits
    rng = np.random.default_rng(seed)
    base = _test_image(h, w).astype(np.int64)
    noise = rng.integers(-60, 60, base.shape)
    return np.clip(base + noise, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("subsample", [False, True])
@pytest.mark.parametrize("mk_img", [_test_image, _noisy_image])
def test_progressive_decodes_identically_to_baseline(subsample, mk_img):
    """Baseline and progressive encoders quantize identically and the
    default scan script fully refines to Al=0, so both streams carry the
    SAME coefficients inside the visible area — decoded pixels must be
    bit-identical. This single check covers DC point transform + DC
    refinement, spectral-selection bands, EOB runs, ZRL, and AC
    successive-approximation correction bits."""
    from smartcrawler_spark.jpeg import encode_jpeg_progressive

    img = mk_img()
    for kwargs in ({"quality": 85}, {"quality": 50},
                   {"quant_override": np.ones(64, dtype=np.int64)}):
        base = decode_jpeg(encode_jpeg_baseline(img, subsample=subsample,
                                                **kwargs))
        prog_bytes = encode_jpeg_progressive(img, subsample=subsample,
                                             **kwargs)
        assert prog_bytes[3] != 0xC0 and b"\xff\xc2" in prog_bytes
        prog = decode_jpeg(prog_bytes)
        assert prog is not None and base is not None
        assert prog.shape == base.shape
        assert (prog == base).all(), (kwargs, subsample,
                                      np.abs(prog.astype(int)
                                             - base.astype(int)).max())


def test_progressive_gray_and_spectral_only_script():
    from smartcrawler_spark.jpeg import encode_jpeg_progressive

    gray = np.clip(_test_image(24, 32).mean(axis=2), 0, 255).astype(np.uint8)
    base = decode_jpeg(encode_jpeg_baseline(gray, quality=80))
    prog = decode_jpeg(encode_jpeg_progressive(gray, quality=80))
    assert prog is not None and (prog == base).all()
    # spectral selection only (no successive approximation): DC then three
    # AC bands per component — a common camera-firmware script shape
    img = _test_image(32, 40)
    scans = [("dc", None, 0, 0, 0, 0),
             ("ac", "each", 1, 5, 0, 0),
             ("ac", "each", 6, 20, 0, 0),
             ("ac", "each", 21, 63, 0, 0)]
    base = decode_jpeg(encode_jpeg_baseline(img, quality=85))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=85, scans=scans))
    assert prog is not None and (prog == base).all()


def test_progressive_partial_refinement_is_coarse_but_valid():
    """Dropping the final refinement scans (a truncated-but-valid script)
    must still decode — coarser pixels, not a crash or None. This is the
    real-world 'progressive preview' property."""
    from smartcrawler_spark.jpeg import encode_jpeg_progressive

    img = _test_image()
    scans = [("dc", None, 0, 0, 0, 1),
             ("ac", "each", 1, 63, 0, 2)]  # never refined to Al=0
    out = decode_jpeg(encode_jpeg_progressive(img, quality=85, scans=scans))
    assert out is not None and out.shape == img.shape
    # coarse approximation: still recognizably the image
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 30


def test_progressive_corrupt_streams_return_none():
    from smartcrawler_spark.jpeg import encode_jpeg_progressive

    img = _noisy_image(24, 24)
    full = encode_jpeg_progressive(img, quality=85)
    assert decode_jpeg(full) is not None
    for cut in (len(full) // 4, len(full) // 2, len(full) - 3):
        assert decode_jpeg(full[:cut]) is None
    # bit flips in entropy data must never crash (None or a decoded image)
    rng = np.random.default_rng(7)
    for _ in range(25):
        b = bytearray(full)
        for _ in range(3):
            b[rng.integers(20, len(b) - 2)] ^= 1 << rng.integers(0, 8)
        decode_jpeg(bytes(b))  # no exception is the assertion


def test_jpeg_flows_through_real_pipeline(spark):
    """JPEG payloads now ride the REAL decode tier end-to-end: ingestion
    extracts true dimensions, features come from decoded pixels."""
    img = _test_image(32, 48)
    ones = np.ones(64, dtype=np.int64)
    rows = [
        ("a.jpg", bytearray(encode_jpeg_baseline(img, quant_override=ones))),
        ("b.png", bytearray(MM.encode_png(img))),
        ("junk.bin", bytearray(b"\x00" * 100)),
    ]
    raw = spark.createDataFrame(rows, "media_ref string, payload binary")
    assets = MM.image_assets_from_bytes(raw)
    got = {r["media_ref"]: r for r in assets.collect()}
    assert set(got) == {"a.jpg", "b.png"}
    assert (got["a.jpg"]["width"], got["a.jpg"]["height"]) == (48, 32)
    feats = {r["media_ref"]: np.asarray(r["feature"])
             for r in MM.extract_features(assets, decoder="real").collect()}
    # near-lossless JPEG of the same pixels: histogram features are close
    assert float(np.abs(feats["a.jpg"] - feats["b.png"]).max()) < 0.02


# ---------------------------------------------------------------------------
# Adobe 4-component: inverted CMYK + YCCK
# ---------------------------------------------------------------------------


def _cmyk_image(h=24, w=32):
    # smooth inverted-CMYK planes (Adobe convention: 0 = full ink)
    yy, xx = np.mgrid[0:h, 0:w]
    c = 128 + 90 * np.sin(xx / 7.0)
    m = 128 + 80 * np.cos(yy / 9.0)
    y = 128 + 70 * np.sin((xx + yy) / 11.0)
    k = 200 + 40 * np.cos(xx / 5.0)
    return np.clip(np.stack([c, m, y, k], axis=2), 0, 255).astype(np.uint8)


def _cmyk_to_rgb_oracle(cmyk):
    # libjpeg/PIL-compatible mapping on Adobe-inverted values
    f = cmyk.astype(np.float64)
    return np.clip(np.round(f[:, :, :3] * f[:, :, 3:4] / 255.0),
                   0, 255).astype(np.uint8)


def test_cmyk_jpeg_roundtrip_matches_oracle():
    img = _cmyk_image()
    ones = np.ones(64, dtype=np.int64)
    enc = encode_jpeg_baseline(img, quant_override=ones)
    assert b"Adobe" in enc
    dec = decode_jpeg(enc)
    assert dec is not None and dec.shape == (24, 32, 3)
    want = _cmyk_to_rgb_oracle(img)
    # pre-conversion DCT error is <= 2 per channel; the k-multiply can
    # only shrink it, rounding adds <= 1
    assert np.abs(dec.astype(int) - want.astype(int)).max() <= 4


def test_ycck_jpeg_decodes_via_transform_2():
    img = _cmyk_image()
    f = img.astype(np.float64)
    c, m, y = f[:, :, 0], f[:, :, 1], f[:, :, 2]
    # forward YCC over the (inverted) CMY planes, K passes through
    ycck = np.stack([
        0.299 * c + 0.587 * m + 0.114 * y,
        -0.168736 * c - 0.331264 * m + 0.5 * y + 128.0,
        0.5 * c - 0.418688 * m - 0.081312 * y + 128.0,
        f[:, :, 3],
    ], axis=2)
    enc = bytearray(encode_jpeg_baseline(
        np.clip(ycck, 0, 255).astype(np.uint8),
        quant_override=np.ones(64, dtype=np.int64)))
    i = enc.find(b"Adobe")
    assert enc[i + 11] == 0  # encoder wrote transform 0
    enc[i + 11] = 2          # declare YCCK
    dec = decode_jpeg(bytes(enc))
    assert dec is not None
    want = _cmyk_to_rgb_oracle(img)
    # forward-YCC quantized to uint8 + DCT + inverse-YCC: allow a wider
    # but still tight band
    err = np.abs(dec.astype(int) - want.astype(int))
    assert err.max() <= 8 and err.mean() <= 2.0


def test_cmyk_progressive_matches_cmyk_baseline():
    from smartcrawler_spark.jpeg import encode_jpeg_progressive

    img = _cmyk_image()
    for kwargs in ({"quality": 85},
                   {"quant_override": np.ones(64, dtype=np.int64)}):
        base = decode_jpeg(encode_jpeg_baseline(img, **kwargs))
        prog = decode_jpeg(encode_jpeg_progressive(img, **kwargs))
        assert prog is not None and (prog == base).all()
