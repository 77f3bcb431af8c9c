"""Multimodal plumbing: schemas, batch shapes, determinism of the fake
decoder, and the NotImplementedError gate for the real one."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from smartcrawler_spark import multimodal as MM
from smartcrawler_spark.sources.corpus import CorpusConfig, generate_corpus


@pytest.fixture(scope="module")
def assets(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mm"))
    generate_corpus(d, CorpusConfig(n_hosts=2, pages_per_host=4, hot_host_pages=4))
    docs = spark.read.parquet(f"{d}/documents.parquet")
    a = MM.media_assets_from_spans(docs)
    a.cache()
    return a


def test_assets_schema_and_payloads(assets):
    rows = assets.collect()
    assert len(rows) > 0
    for r in rows[:5]:
        assert r["n_bytes"] == len(r["payload"])
        if r["media_type"] == "image":
            assert r["n_bytes"] == r["width"] * r["height"] * 3


def test_assets_deterministic(spark, assets, tmp_path):
    """Same corpus regenerated -> byte-identical payloads (seeded fake)."""
    d = str(tmp_path / "c2")
    generate_corpus(d, CorpusConfig(n_hosts=2, pages_per_host=4, hot_host_pages=4))
    docs = spark.read.parquet(f"{d}/documents.parquet")
    again = {r["media_ref"]: bytes(r["payload"])
             for r in MM.media_assets_from_spans(docs).collect()}
    first = {r["media_ref"]: bytes(r["payload"]) for r in assets.collect()}
    assert first == again


def test_feature_extraction(assets):
    feats = MM.extract_features(assets, dim=16).collect()
    assert len(feats) == assets.count()
    for r in feats[:5]:
        assert len(r["feature"]) == 16
        norm = sum(x * x for x in r["feature"]) ** 0.5
        assert abs(norm - 1.0) < 1e-4  # normalized


def test_resize_and_frames(assets):
    thumbs = MM.resize_images(assets, max_side=32).collect()
    for r in thumbs[:5]:
        assert r["thumb_w"] <= 32 + 16  # integer-stride subsample bound
        assert len(r["thumb"]) == r["thumb_w"] * r["thumb_h"] * 3
    frames = MM.sample_frames(assets).collect()
    vids = assets.filter(F.col("media_type") == "video").count()
    if vids:
        assert len(frames) >= vids  # >= 1 frame per video


def test_real_decoder_gated(assets):
    with pytest.raises(Exception, match="NotImplementedError|imaging|vision|PIL"):
        MM.extract_features(assets, decoder="real").collect()


def test_media_near_dup_matches_numpy_oracle(spark, tmp_path_factory):
    """media spans -> features -> LSH near-dup pairs: the LSH path must find
    EXACTLY the pairs a brute-force numpy cosine over the same features finds
    at the threshold (recall can only miss via bucketing; verify it doesn't
    here), with identical rounded sims."""
    import itertools

    import numpy as np

    d = str(tmp_path_factory.mktemp("mmdup"))
    generate_corpus(d, CorpusConfig(n_hosts=3, pages_per_host=5, hot_host_pages=5))
    docs = spark.read.parquet(f"{d}/documents.parquet")

    feats = MM.extract_features(MM.media_assets_from_spans(docs))
    fmap = {r["media_ref"]: np.array(r["feature"], dtype=np.float64)
            for r in feats.collect()}
    want = set()
    for a, b in itertools.combinations(sorted(fmap), 2):
        va, vb = fmap[a], fmap[b]
        sim = round(float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))), 6)
        if sim >= 0.98:
            want.add((a, b, sim))

    got = {
        (r["a"], r["b"], r["sim"])
        for r in MM.media_near_dup(docs, threshold=0.98, bits=4, tables=8).collect()
    }
    assert got == want and len(want) > 0


# ---------------------------------------------------------------------------
# real codec tier: PPM/BMP decode end-to-end on actual pixels
# ---------------------------------------------------------------------------


def _gradient(h, w):
    import numpy as np

    y = np.arange(h, dtype=np.uint8)[:, None, None]
    x = np.arange(w, dtype=np.uint8)[None, :, None]
    c = np.arange(3, dtype=np.uint8)[None, None, :]
    return (y * 7 + x * 3 + c * 31).astype(np.uint8)


def _encode_bmp(arr, top_down=False):
    """Independent test-side BMP writer (24-bit BI_RGB, padded rows)."""
    import struct

    import numpy as np

    h, w = arr.shape[0], arr.shape[1]
    stride = (w * 3 + 3) & ~3
    bgr = arr[:, :, ::-1]
    rows = bgr if top_down else bgr[::-1]
    body = b"".join(
        rows[i].tobytes() + b"\x00" * (stride - w * 3) for i in range(h)
    )
    hh = -h if top_down else h
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, hh, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    assert len(header) + len(dib) == 54
    return header + dib + body


def test_codec_roundtrip_ppm_and_bmp():
    import numpy as np

    img = _gradient(5, 7)
    assert np.array_equal(MM.decode_image(MM.encode_ppm(img)), img)
    assert np.array_equal(MM.decode_image(_encode_bmp(img)), img)
    assert np.array_equal(MM.decode_image(_encode_bmp(img, top_down=True)), img)
    # comments + arbitrary whitespace in the PPM header
    with_comment = b"P6 # a comment\n# more\n 7\t5 \n255\n" + img.tobytes()
    assert np.array_equal(MM.decode_image(with_comment), img)
    assert MM.decode_image(b"\x89PNG....") is None
    assert MM.decode_image(b"P6\n7 5\n255\nshort") is None


def test_real_image_pipeline_end_to_end(spark):
    """image_assets_from_bytes -> extract_features(real) ->
    resize_images(real): decoded metadata, features, and thumbnails must
    equal a direct numpy computation over the same pixels."""
    import numpy as np

    imgs = {f"img{i}.ppm": _gradient(16 + i, 40 + 2 * i) for i in range(3)}
    rows = [(k, MM.encode_ppm(v)) for k, v in imgs.items()]
    rows.append(("img_bmp.bmp", _encode_bmp(_gradient(12, 20))))
    imgs["img_bmp.bmp"] = _gradient(12, 20)
    rows.append(("junk.jpg", b"\xff\xd8\xff not really a jpeg"))
    raw = spark.createDataFrame(rows, "media_ref string, payload binary")

    assets = MM.image_assets_from_bytes(raw).cache()
    got_meta = {r["media_ref"]: (r["width"], r["height"]) for r in assets.collect()}
    assert got_meta == {k: (v.shape[1], v.shape[0]) for k, v in imgs.items()}  # junk dropped

    feats = {r["media_ref"]: np.array(r["feature"])
             for r in MM.extract_features(assets, decoder="real").collect()}
    for k, v in imgs.items():
        hist = np.bincount(v.reshape(-1) >> 4, minlength=16).astype(np.float32)
        hist /= np.linalg.norm(hist) or 1.0
        assert np.allclose(feats[k], hist, atol=1e-6), k

    thumbs = {r["media_ref"]: r for r in
              MM.resize_images(assets, max_side=8, decoder="real").collect()}
    for k, v in imgs.items():
        scale = max(1, max(v.shape[0], v.shape[1]) // 8)
        want = v[::scale, ::scale]
        t = thumbs[k]
        assert (t["thumb_h"], t["thumb_w"]) == want.shape[:2]
        assert bytes(t["thumb"]) == want.tobytes()
    assets.unpersist()


# ---------------------------------------------------------------------------
# PNG codec (pure zlib+numpy decode vs an independent per-byte reference)
# ---------------------------------------------------------------------------

import struct as _struct
import zlib as _zlib

import numpy as np


def _ref_chunk(ctype: bytes, data: bytes) -> bytes:
    return (_struct.pack(">I", len(data)) + ctype + data
            + _struct.pack(">I", _zlib.crc32(ctype + data)))


def _ref_forward_filter(px: np.ndarray, ftype: int) -> bytes:
    """Independent per-byte forward filter straight from the PNG spec —
    decode must invert this exactly."""
    h, w, c = px.shape
    out = b""
    prev = bytes(w * c)
    for y in range(h):
        row = px[y].tobytes()
        filt = bytearray(w * c)
        for x in range(w * c):
            a = row[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            filt[x] = (row[x] - pred) & 0xFF
        out += bytes([ftype]) + bytes(filt)
        prev = row
    return out


def _ref_png(px: np.ndarray, color: int, ftype: int,
             plte: bytes | None = None) -> bytes:
    h, w = px.shape[:2]
    ihdr = _struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    body = _ref_chunk(b"IHDR", ihdr)
    if plte is not None:
        body += _ref_chunk(b"PLTE", plte)
    raw = _ref_forward_filter(px, ftype)
    # split IDAT in two chunks: decode must concatenate the stream
    z = _zlib.compress(raw)
    mid = len(z) // 2
    body += _ref_chunk(b"IDAT", z[:mid]) + _ref_chunk(b"IDAT", z[mid:])
    return b"\x89PNG\r\n\x1a\n" + body + _ref_chunk(b"IEND", b"")


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_rgb_all_filter_types(ftype):
    rng = np.random.default_rng(100 + ftype)
    px = rng.integers(0, 256, (11, 7, 3), dtype=np.uint8)
    got = MM.decode_image(_ref_png(px[:, :, :3], color=2, ftype=ftype))
    assert got is not None and np.array_equal(got, px)


def test_png_color_types():
    rng = np.random.default_rng(7)
    gray = rng.integers(0, 256, (6, 5, 1), dtype=np.uint8)
    got = MM.decode_image(_ref_png(gray, color=0, ftype=4))
    assert np.array_equal(got, np.repeat(gray, 3, axis=2))

    ga = rng.integers(0, 256, (6, 5, 2), dtype=np.uint8)
    got = MM.decode_image(_ref_png(ga, color=4, ftype=2))
    assert np.array_equal(got, np.repeat(ga[:, :, :1], 3, axis=2))

    rgba = rng.integers(0, 256, (4, 9, 4), dtype=np.uint8)
    got = MM.decode_image(_ref_png(rgba, color=6, ftype=1))
    assert np.array_equal(got, rgba[:, :, :3])

    # palette: 8 entries, indices within range
    plte = bytes(rng.integers(0, 256, 8 * 3, dtype=np.uint8))
    idx = rng.integers(0, 8, (5, 5, 1), dtype=np.uint8)
    got = MM.decode_image(_ref_png(idx, color=3, ftype=0, plte=plte))
    pal = np.frombuffer(plte, np.uint8).reshape(8, 3)
    assert np.array_equal(got, pal[idx[:, :, 0]])


def test_png_encoder_roundtrip():
    rng = np.random.default_rng(21)
    for ftype in (0, 1, 2):
        px = rng.integers(0, 256, (16, 12, 3), dtype=np.uint8)
        assert np.array_equal(MM.decode_image(MM.encode_png(px, ftype)), px)
    gray = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    assert np.array_equal(
        MM.decode_image(MM.encode_png(gray)),
        np.repeat(gray[:, :, None], 3, axis=2),
    )
    rgba = rng.integers(0, 256, (8, 8, 4), dtype=np.uint8)
    assert np.array_equal(MM.decode_image(MM.encode_png(rgba)), rgba[:, :, :3])


def test_png_corrupt_streams_return_none():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    ok = _ref_png(px, color=2, ftype=0)
    # truncated IDAT / corrupt deflate
    assert MM.decode_image(ok[:40]) is None
    # bogus bit depth
    bad_ihdr = _struct.pack(">IIBBBBB", 4, 4, 3, 2, 0, 0, 0)
    bad = (b"\x89PNG\r\n\x1a\n" + _ref_chunk(b"IHDR", bad_ihdr)
           + _ref_chunk(b"IDAT", _zlib.compress(b"\x00" * 100))
           + _ref_chunk(b"IEND", b""))
    assert MM.decode_image(bad) is None
    # sub-byte depth is gray/palette-only per spec
    bad_ihdr = _struct.pack(">IIBBBBB", 4, 4, 4, 2, 0, 0, 0)
    bad = (b"\x89PNG\r\n\x1a\n" + _ref_chunk(b"IHDR", bad_ihdr)
           + _ref_chunk(b"IDAT", _zlib.compress(b"\x00" * 100))
           + _ref_chunk(b"IEND", b""))
    assert MM.decode_image(bad) is None


def _ref_png_adam7(px: np.ndarray, color: int, ftype: int) -> bytes:
    """Independent Adam7 constructor: slice the 7 pass lattices out of the
    full image and forward-filter each sub-image separately (spec: every
    pass is its own filtered image)."""
    h, w = px.shape[:2]
    ihdr = _struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 1)
    passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    raw = b""
    for x0, y0, xs, ys in passes:
        sub = px[y0::ys, x0::xs]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        raw += _ref_forward_filter(np.ascontiguousarray(sub), ftype)
    return (b"\x89PNG\r\n\x1a\n" + _ref_chunk(b"IHDR", ihdr)
            + _ref_chunk(b"IDAT", _zlib.compress(raw))
            + _ref_chunk(b"IEND", b""))


@pytest.mark.parametrize("ftype", [0, 1, 2, 4])
def test_png_adam7_interlaced(ftype):
    rng = np.random.default_rng(40 + ftype)
    # odd dims exercise ragged pass lattices (some passes partially empty)
    px = rng.integers(0, 256, (13, 11, 3), dtype=np.uint8)
    got = MM.decode_image(_ref_png_adam7(px, color=2, ftype=ftype))
    assert got is not None and np.array_equal(got, px)
    # tiny image where several passes are entirely empty
    tiny = rng.integers(0, 256, (2, 2, 3), dtype=np.uint8)
    got = MM.decode_image(_ref_png_adam7(tiny, color=2, ftype=0))
    assert np.array_equal(got, tiny)


def test_png_16bit_takes_high_byte():
    rng = np.random.default_rng(8)
    hi = rng.integers(0, 256, (5, 6, 3), dtype=np.uint8)
    lo = rng.integers(0, 256, (5, 6, 3), dtype=np.uint8)
    ihdr = _struct.pack(">IIBBBBB", 6, 5, 16, 2, 0, 0, 0)
    raw = b""
    for y in range(5):
        row = np.stack([hi[y].reshape(-1), lo[y].reshape(-1)], axis=1)
        raw += b"\x00" + row.astype(np.uint8).tobytes()
    png = (b"\x89PNG\r\n\x1a\n" + _ref_chunk(b"IHDR", ihdr)
           + _ref_chunk(b"IDAT", _zlib.compress(raw))
           + _ref_chunk(b"IEND", b""))
    got = MM.decode_image(png)
    assert got is not None and np.array_equal(got, hi)


def test_png_subbyte_depths():
    rng = np.random.default_rng(12)
    # 4-bit palette, 7 px wide (ragged last byte)
    idx = rng.integers(0, 8, (4, 7), dtype=np.uint8)
    packed_rows = []
    for y in range(4):
        bits = np.unpackbits(idx[y][:, None], axis=1, count=8)[:, 4:]
        packed = np.packbits(bits.reshape(-1))
        packed_rows.append(b"\x00" + packed.tobytes())
    plte = bytes(rng.integers(0, 256, 8 * 3, dtype=np.uint8))
    ihdr = _struct.pack(">IIBBBBB", 7, 4, 4, 3, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + _ref_chunk(b"IHDR", ihdr)
           + _ref_chunk(b"PLTE", plte)
           + _ref_chunk(b"IDAT", _zlib.compress(b"".join(packed_rows)))
           + _ref_chunk(b"IEND", b""))
    got = MM.decode_image(png)
    pal = np.frombuffer(plte, np.uint8).reshape(8, 3)
    assert got is not None and np.array_equal(got, pal[idx])

    # 1-bit gray: 0 -> 0, 1 -> 255
    bw = rng.integers(0, 2, (3, 10), dtype=np.uint8)
    rows = b"".join(
        b"\x00" + np.packbits(bw[y]).tobytes() for y in range(3)
    )
    ihdr = _struct.pack(">IIBBBBB", 10, 3, 1, 0, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + _ref_chunk(b"IHDR", ihdr)
           + _ref_chunk(b"IDAT", _zlib.compress(rows))
           + _ref_chunk(b"IEND", b""))
    got = MM.decode_image(png)
    want = np.repeat((bw * 255)[:, :, None], 3, axis=2)
    assert got is not None and np.array_equal(got, want)


def test_png_real_pipeline_end_to_end(spark):
    """PNG payloads flow through the REAL decode tier: ingestion extracts
    true dimensions, features/thumbnails equal those of the same pixels
    shipped as PPM (decode-format invariance)."""
    rng = np.random.default_rng(5)
    imgs = {f"img{i}.png": rng.integers(0, 256, (24 + i, 17, 3), dtype=np.uint8)
            for i in range(4)}
    rows = [(ref, bytearray(MM.encode_png(px, filter_type=1)))
            for ref, px in imgs.items()]
    rows += [("junk.jpg", bytearray(b"\xff\xd8not-an-image"))]
    raw = spark.createDataFrame(rows, "media_ref string, payload binary")
    assets = MM.image_assets_from_bytes(raw)
    got = {r["media_ref"]: r for r in assets.collect()}
    assert set(got) == set(imgs)  # undecodable junk dropped
    for ref, px in imgs.items():
        assert (got[ref]["width"], got[ref]["height"]) == (px.shape[1], px.shape[0])

    ppm_rows = [(ref, bytearray(MM.encode_ppm(px))) for ref, px in imgs.items()]
    ppm_assets = MM.image_assets_from_bytes(
        spark.createDataFrame(ppm_rows, "media_ref string, payload binary"))
    f_png = {r["media_ref"]: r["feature"]
             for r in MM.extract_features(assets, decoder="real").collect()}
    f_ppm = {r["media_ref"]: r["feature"]
             for r in MM.extract_features(ppm_assets, decoder="real").collect()}
    assert f_png == f_ppm
    t_png = {r["media_ref"]: (bytes(r["thumb"]), r["thumb_w"], r["thumb_h"])
             for r in MM.resize_images(assets, decoder="real").collect()}
    t_ppm = {r["media_ref"]: (bytes(r["thumb"]), r["thumb_w"], r["thumb_h"])
             for r in MM.resize_images(ppm_assets, decoder="real").collect()}
    assert t_png == t_ppm


# ---------------------------------------------------------------------------
# GIF codec (LZW decode vs an independent encoder built in this file)
# ---------------------------------------------------------------------------


def _ref_gif_lzw_encode(indices, mcs):
    """Independent GIF-LZW encoder that mirrors the decoder's table/width
    update rule step for step (emit clear, then data codes, then EOI)."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    bits = []
    state = {"size": clear + 2, "width": mcs + 1, "first": True}

    def emit(code):
        bits.append((code, state["width"]))

    def emit_data(code):
        emit(code)
        if state["first"]:
            state["first"] = False
        else:
            state["size"] += 1
        if state["size"] == (1 << state["width"]) and state["width"] < 12:
            state["width"] += 1

    table = {(i,): i for i in range(clear)}
    emit(clear)
    seq = ()
    for s in indices:
        cand = seq + (int(s),)
        if cand in table:
            seq = cand
            continue
        emit_data(table[seq])
        table[cand] = state["size"]
        seq = (int(s),)
    emit_data(table[seq])
    emit(eoi)
    # LSB-first bit packing
    acc = nbits = 0
    out = bytearray()
    for code, width in bits:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _ref_gif(idx, palette, mcs=None, interlaced=False, screen=None,
             offset=(0, 0), bg_idx=0):
    ih, iw = idx.shape
    w, h = screen if screen else (iw, ih)
    n = len(palette)
    depth = max(1, (n - 1).bit_length())
    pal_n = 1 << depth
    mcs = mcs or max(2, depth)
    rows = idx
    if interlaced:
        order = (list(range(0, ih, 8)) + list(range(4, ih, 8))
                 + list(range(2, ih, 4)) + list(range(1, ih, 2)))
        rows = idx[order]
    data = _ref_gif_lzw_encode(rows.reshape(-1).tolist(), mcs)
    out = bytearray(b"GIF89a")
    out += _struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), bg_idx, 0)
    pal = bytes(palette.reshape(-1)) + b"\x00" * ((pal_n - n) * 3)
    out += pal
    x0, y0 = offset
    out += b"\x2c" + _struct.pack("<HHHHB", x0, y0, iw, ih,
                                  0x40 if interlaced else 0)
    out += bytes([mcs])
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def test_gif_roundtrip_exact():
    rng = np.random.default_rng(17)
    palette = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (13, 21), dtype=np.uint8)
    got = MM.decode_image(_ref_gif(idx, palette))
    assert got is not None and np.array_equal(got, palette[idx])


def test_gif_interlaced():
    rng = np.random.default_rng(18)
    palette = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    idx = rng.integers(0, 8, (19, 9), dtype=np.uint8)
    got = MM.decode_image(_ref_gif(idx, palette, interlaced=True))
    assert got is not None and np.array_equal(got, palette[idx])


def test_gif_long_run_exercises_width_growth():
    # long runs force the LZW table past several width bumps
    palette = (np.arange(4, dtype=np.uint8).repeat(3).reshape(4, 3) * 20)
    idx = np.tile(np.repeat(np.arange(4, dtype=np.uint8), 37), 40)[: 60 * 50]
    idx = idx.reshape(60, 50)
    got = MM.decode_image(_ref_gif(idx, palette))
    assert got is not None and np.array_equal(got, palette[idx])


def test_gif_small_frame_pasted_on_background():
    palette = np.array([[9, 9, 9], [250, 10, 10]], dtype=np.uint8)
    idx = np.ones((2, 3), dtype=np.uint8)
    got = MM.decode_image(_ref_gif(idx, palette, screen=(6, 5),
                                   offset=(2, 1), bg_idx=0))
    assert got is not None and got.shape == (5, 6, 3)
    assert (got[1:3, 2:5] == palette[1]).all()
    assert (got[0, :] == palette[0]).all() and (got[4, :] == palette[0]).all()


def test_gif_corrupt_returns_none():
    assert MM.decode_image(b"GIF89a" + b"\x00" * 8) is None
    rng = np.random.default_rng(4)
    palette = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, (6, 6), dtype=np.uint8)
    ok = _ref_gif(idx, palette)
    assert MM.decode_image(ok[:20]) is None


# ---------------------------------------------------------------------------
# audio modality: WAV decode + features + clip sampling (real end-to-end)
# ---------------------------------------------------------------------------


def _sine(rate=8000, secs=0.5, hz=440.0, amp=0.5):
    t = np.arange(int(rate * secs)) / rate
    return amp * np.sin(2 * np.pi * hz * t)


def test_wav_roundtrip_bit_depths():
    x = _sine()
    for bits, tol in ((16, 1e-4), (8, 1e-2), (32, 1e-7)):
        dec = MM.decode_audio(MM.encode_wav(x, 8000, bits=bits))
        assert dec is not None
        mono, rate = dec
        assert rate == 8000 and len(mono) == len(x)
        assert float(np.abs(mono - x).max()) < tol, bits


def test_wav_stereo_downmix_and_24bit():
    import struct as _s

    x = _sine()
    # stereo with distinct channels -> decoded mono must be the mean
    stereo = np.stack([x, -x * 0.5], axis=1)
    mono, rate = MM.decode_audio(MM.encode_wav(stereo, 8000))
    want = stereo.mean(axis=1)
    assert float(np.abs(mono - want).max()) < 1e-4
    # hand-built 24-bit PCM: known sample values
    vals = np.array([0, 1 << 22, -(1 << 22), (1 << 23) - 1, -(1 << 23)])
    raw = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
    fmt = _s.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
    body = (b"fmt " + _s.pack("<I", len(fmt)) + fmt
            + b"data" + _s.pack("<I", len(raw)) + raw)
    wav = b"RIFF" + _s.pack("<I", 4 + len(body)) + b"WAVE" + body
    mono, rate = MM.decode_audio(wav)
    assert np.allclose(mono, vals / float(1 << 23))


def test_wav_ieee_float_and_corrupt():
    import struct as _s

    x = _sine().astype(np.float32)
    fmt = _s.pack("<HHIIHH", 3, 1, 8000, 8000 * 4, 4, 32)
    body = (b"fmt " + _s.pack("<I", len(fmt)) + fmt
            + b"data" + _s.pack("<I", x.nbytes) + x.tobytes())
    wav = b"RIFF" + _s.pack("<I", 4 + len(body)) + b"WAVE" + body
    mono, rate = MM.decode_audio(wav)
    assert np.allclose(mono, x, atol=1e-7)
    assert MM.decode_audio(b"RIFF\x00\x00\x00\x00WAVEjunk") is None
    assert MM.decode_audio(b"ID3\x03mp3 data here") is None  # seam
    assert MM.decode_audio(wav[:30]) is None


def test_g711_spec_values_and_roundtrip():
    import struct as _s

    # ITU-T G.711 known codewords: mu-law 0x00 -> -32124, 0xFF/0x7F -> 0,
    # 0x80 -> +32124; A-law 0x55 -> -8, 0xD5 -> +8, 0x2A/0xAA -> -/+32256
    mu = MM._mulaw_decode_table() * 32768.0
    assert (mu[0x00], mu[0xFF], mu[0x7F], mu[0x80]) == (
        -32124.0, 0.0, 0.0, 32124.0)
    al = MM._alaw_decode_table() * 32768.0
    assert (al[0x55], al[0xD5], al[0x2A], al[0xAA]) == (
        -8.0, 8.0, -32256.0, 32256.0)
    # every A-law level is an even multiple of 8 shifted by segment; all
    # magnitudes are multiples of 8 and symmetric about zero
    assert np.all(np.abs(al) % 8 == 0) and np.all(np.sort(al) == -np.sort(-al)[::-1])
    x = _sine(amp=0.8)
    for law, fmt_code in (("mu", 7), ("alaw", 6)):
        wav = MM.encode_wav_g711(x, 8000, law)
        (got_fmt,) = _s.unpack_from("<H", wav, wav.find(b"fmt ") + 8)
        assert got_fmt == fmt_code
        mono, rate = MM.decode_audio(wav)
        assert rate == 8000 and len(mono) == len(x)
        # companding: log-quantized, ~38 dB SNR; max step at |x|~1 is 1024
        assert float(np.abs(mono - x).max()) <= 1024.5 / 32768.0
        assert float(np.sqrt(((mono - x) ** 2).mean())) < 0.01


def test_g711_extensible_wrapper_resolves_subformat():
    import struct as _s

    x = _sine()
    wav = bytearray(MM.encode_wav_g711(x, 8000, "mu"))
    i = wav.find(b"fmt ")
    fmt = wav[i + 8:i + 8 + 16]
    # rebuild as WAVE_FORMAT_EXTENSIBLE carrying mu-law in SubFormat
    guid = _s.pack("<H", 7) + b"\x00\x00" + bytes.fromhex(
        "00001000800000aa00389b71")
    ext = _s.pack("<HHIIHH", 0xFFFE, 1, 8000, 8000, 1, 8) \
        + _s.pack("<HHI", 22, 8, 0) + guid
    rest = bytes(wav[i + 8 + 16:])
    body = b"fmt " + _s.pack("<I", len(ext)) + ext + rest
    out = b"RIFF" + _s.pack("<I", 4 + len(body)) + b"WAVE" + body
    mono, rate = MM.decode_audio(out)
    base, _ = MM.decode_audio(bytes(wav))
    assert rate == 8000 and np.array_equal(mono, base)


def test_ima_adpcm_roundtrip_and_fact_truncation():
    x = _sine(secs=1.0, amp=0.6)
    wav = MM.encode_wav_ima_adpcm(x, 8000)
    mono, rate = MM.decode_audio(wav)
    assert rate == 8000
    # fact chunk truncates final-block padding to the true frame count
    assert len(mono) == len(x)
    # after the step-size ramp-up (slope overload at onset is inherent
    # to ADPCM from index 0), tracking is tight
    err = np.abs(mono[200:] - x[200:])
    assert float(err.max()) < 0.05 and float(np.sqrt((err**2).mean())) < 0.02
    # first sample is the block header predictor: exact to 16-bit
    assert abs(mono[0] - x[0]) <= 1.0 / 32768.0
    # corrupt ADPCM payloads degrade, never crash
    assert MM.decode_audio(wav[:40]) is None or True


def test_ima_adpcm_decoder_is_spec_state_machine():
    # hand-walk the IMA state machine for one block and compare
    import struct as _s

    nibs = [0x7, 0x3, 0xC, 0x1, 0xF, 0x8, 0x2, 0x4]
    pred, idx = 1000, 10
    want = [float(pred)]
    p, i = pred, idx
    for nib in nibs:
        step = int(MM._IMA_STEPS[i])
        dq = step >> 3
        if nib & 4:
            dq += step
        if nib & 2:
            dq += step >> 1
        if nib & 1:
            dq += step >> 2
        p = min(32767, max(-32768, p - dq if nib & 8 else p + dq))
        i = min(88, max(0, i + int(MM._IMA_INDEX[nib & 7])))
        want.append(float(p))
    data = _s.pack("<hBx", pred, idx) + bytes(
        nibs[k] | (nibs[k + 1] << 4) for k in range(0, 8, 2))
    fmt = _s.pack("<HHIIHHHH", 0x11, 1, 8000, 4000, len(data), 4, 2, 9)
    body = (b"fmt " + _s.pack("<I", len(fmt)) + fmt
            + b"data" + _s.pack("<I", len(data)) + data)
    wav = b"RIFF" + _s.pack("<I", 4 + len(body)) + b"WAVE" + body
    mono, rate = MM.decode_audio(wav)
    assert np.allclose(mono * 32768.0, np.asarray(want))


def test_audio_features_match_independent_numpy():
    x = _sine(hz=1000.0, secs=0.25)
    feats = MM.audio_features_from_samples(x, 8000, n_bands=8)
    assert len(feats) == 4 + 8
    duration, rms, zcr, centroid = feats[:4]
    assert abs(duration - 0.25) < 1e-9
    # sine RMS = amp/sqrt(2)
    assert abs(rms - 0.5 / np.sqrt(2)) < 1e-3
    # 1 kHz sine at 8 kHz: 2*hz/rate = 0.25 sign flips per step
    assert abs(zcr - 0.25) < 0.01
    # spectral centroid of a pure tone = its frequency (normalized /4kHz)
    assert abs(centroid - 1000.0 / 4000.0) < 0.01
    # band energies: concentrated in the single band containing 1 kHz
    bands = np.array(feats[4:])
    assert abs(float(np.linalg.norm(bands)) - 1.0) < 1e-6
    assert bands.max() > 0.99


def test_audio_pipeline_end_to_end(spark):
    """WAV payloads flow through the real audio tier: ingestion extracts
    duration, features/clips come from decoded samples."""
    rows = [
        ("a.wav", bytearray(MM.encode_wav(_sine(secs=1.0), 8000))),
        ("b.wav", bytearray(MM.encode_wav(_sine(secs=0.5, hz=220), 8000))),
        ("junk.mp3", bytearray(b"ID3\x03 not a wav")),
    ]
    raw = spark.createDataFrame(rows, "media_ref string, payload binary")
    assets = MM.audio_assets_from_bytes(raw)
    got = {r["media_ref"]: r for r in assets.collect()}
    assert set(got) == {"a.wav", "b.wav"}  # junk dropped
    assert got["a.wav"]["duration_ms"] == 1000
    assert got["b.wav"]["duration_ms"] == 500
    feats = {r["media_ref"]: r["feature"]
             for r in MM.extract_audio_features(assets).collect()}
    want_a = MM.audio_features_from_samples(
        MM.decode_audio(bytes(got["a.wav"]["payload"]))[0], 8000)
    assert np.allclose(feats["a.wav"], want_a, atol=1e-6)
    clips = MM.sample_clips(assets, every_ms=250, clip_ms=100).collect()
    per_ref = {}
    for r in clips:
        per_ref.setdefault(r["media_ref"], []).append(r)
    assert len(per_ref["a.wav"]) == 4 and len(per_ref["b.wav"]) == 2
    c0 = sorted(per_ref["a.wav"], key=lambda r: r["clip_idx"])[0]
    assert c0["start_ms"] == 0
    assert len(bytes(c0["clip"])) == 2 * 800  # 100 ms @ 8 kHz, 16-bit


# ---------------------------------------------------------------------------
# codec fuzz: decoders NEVER raise — corrupt input yields None, not a crash
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_decoders_never_raise_on_random_bytes(payload):
    MM.decode_image(payload)
    MM.decode_audio(payload)


@settings(max_examples=120, deadline=None)
@given(st.data())
def test_decoders_never_raise_on_mutated_valid_files(data):
    rng = np.random.default_rng(0)
    px = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    from smartcrawler_spark.jpeg import encode_jpeg_baseline

    bases = [
        MM.encode_png(px),
        MM.encode_ppm(px),
        encode_jpeg_baseline(px, quality=90),
        MM.encode_wav(np.linspace(-1, 1, 64), 8000),
        _ref_gif(rng.integers(0, 4, (5, 5), dtype=np.uint8),
                 rng.integers(0, 256, (4, 3), dtype=np.uint8)),
        _encode_bmp(px),
    ]
    base = bytearray(data.draw(st.sampled_from(bases)))
    # corrupt 1-8 random byte positions
    for _ in range(data.draw(st.integers(1, 8))):
        pos = data.draw(st.integers(0, len(base) - 1))
        base[pos] = data.draw(st.integers(0, 255))
    MM.decode_image(bytes(base))
    MM.decode_audio(bytes(base))


def test_decoders_reject_decompression_bombs():
    """Corrupt/hostile header fields must be rejected BEFORE any canvas
    allocation (r6: a mutated GIF min_code_size byte sized the LZW root
    table at 2**min_code_size entries and OOM-killed the test run).
    Every case here declares a canvas far beyond MAX_DECODE_PIXELS (or an
    out-of-spec LZW root size) while carrying only a few payload bytes —
    a decoder that allocates from the header would blow up on any of
    them. Small-but-valid files around the guards stay decodable."""
    rng = np.random.default_rng(7)

    # GIF: out-of-spec LZW min_code_size (width cap is 12 bits -> max 11)
    ok_gif = _ref_gif(rng.integers(0, 4, (5, 5), dtype=np.uint8),
                      rng.integers(0, 256, (4, 3), dtype=np.uint8))
    mcs_pos = ok_gif.index(b"\x2c") + 10  # descriptor + 9 header bytes
    bad = bytearray(ok_gif)
    bad[mcs_pos] = 255
    assert MM.decode_image(bytes(bad)) is None

    # GIF: 65535x65535 logical screen around a tiny frame (~12.9 GB canvas)
    bad = bytearray(ok_gif)
    _struct.pack_into("<HH", bad, 6, 65535, 65535)
    assert MM.decode_image(bytes(bad)) is None
    assert MM.decode_gif_frames(bytes(bad)) is None

    # PNG: IHDR declares 2**30 x 2**30; IDAT holds 100 zero bytes
    ihdr = _struct.pack(">IIBBBBB", 1 << 30, 1 << 30, 8, 2, 0, 0, 0)
    bomb = (b"\x89PNG\r\n\x1a\n" + _ref_chunk(b"IHDR", ihdr)
            + _ref_chunk(b"IDAT", _zlib.compress(b"\x00" * 100))
            + _ref_chunk(b"IEND", b""))
    assert MM.decode_image(bomb) is None

    # PNG: plausible dims whose scanline bytes the IDAT cannot contain
    # (4096x4096 RGB needs ~50 MB raw; the stream inflates to 100 bytes)
    ihdr = _struct.pack(">IIBBBBB", 4096, 4096, 8, 2, 0, 0, 0)
    short = (b"\x89PNG\r\n\x1a\n" + _ref_chunk(b"IHDR", ihdr)
             + _ref_chunk(b"IDAT", _zlib.compress(b"\x00" * 100))
             + _ref_chunk(b"IEND", b""))
    assert MM.decode_image(short) is None

    # APNG: same hostile IHDR through the animation decoder
    actl = _ref_chunk(b"acTL", _struct.pack(">II", 1, 0))
    fctl = _ref_chunk(b"fcTL", _struct.pack(
        ">IIIIIHHBB", 0, 1, 1, 0, 0, 1, 10, 0, 0))
    ihdr = _struct.pack(">IIBBBBB", 1 << 30, 1 << 30, 8, 2, 0, 0, 0)
    abomb = (b"\x89PNG\r\n\x1a\n" + _ref_chunk(b"IHDR", ihdr) + actl + fctl
             + _ref_chunk(b"IDAT", _zlib.compress(b"\x00" * 100))
             + _ref_chunk(b"IEND", b""))
    assert MM.decode_apng_frames(abomb) is None

    # JPEG: SOF0 declaring 65535x65535 (~34 GB float64 plane per component)
    from smartcrawler_spark.jpeg import encode_jpeg_baseline

    ok_jpg = bytearray(encode_jpeg_baseline(
        rng.integers(0, 256, (6, 5, 3), dtype=np.uint8), quality=90))
    sof = ok_jpg.index(b"\xff\xc0")
    _struct.pack_into(">HH", ok_jpg, sof + 5, 65535, 65535)
    assert MM.decode_image(bytes(ok_jpg)) is None

    # guards must not reject ordinary valid files
    px = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    assert MM.decode_image(_ref_png(px, color=2, ftype=0)) is not None
    assert MM.decode_image(ok_gif) is not None


# ---------------------------------------------------------------------------
# video: MJPEG-in-AVI real tier
# ---------------------------------------------------------------------------


def _video_frames(n=6, h=24, w=32, seed=5):
    out = []
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(n):
        g = np.clip(128 + 60 * np.sin((xx + i * 3) / 5.0)
                    + 40 * np.cos((yy - i * 2) / 4.0), 0, 255).astype(np.uint8)
        out.append(np.stack([g, np.roll(g, i, axis=1), g[::-1]], axis=2))
    return out


def test_avi_mjpeg_roundtrip_matches_per_frame_jpeg_oracle():
    from smartcrawler_spark.jpeg import decode_jpeg, encode_jpeg_baseline

    frames = _video_frames()
    ones = np.ones(64, dtype=np.int64)
    avi = MM.encode_avi_mjpeg(frames, fps=10, quant_override=ones)
    info = MM.parse_avi(avi)
    assert (info["width"], info["height"]) == (32, 24)
    assert info["us_per_frame"] == 100_000 and info["handler"] == b"MJPG"
    assert len(info["frames"]) == len(frames)
    _, dec = MM.decode_video_frames(avi)
    assert len(dec) == len(frames)
    for i, f in enumerate(frames):
        # the container adds nothing: each frame decodes bit-identically
        # to the standalone JPEG of the same pixels
        want = decode_jpeg(encode_jpeg_baseline(f, quant_override=ones))
        assert (dec[i] == want).all(), i
        assert np.abs(dec[i].astype(int) - f.astype(int)).max() <= 2


def test_avi_non_mjpeg_hits_ffmpeg_seam_and_corrupt_is_none():
    frames = _video_frames(2)
    avi = bytearray(MM.encode_avi_mjpeg(frames))
    assert MM.parse_avi(b"not an avi") is None
    assert MM.decode_video_frames(b"RIFF\x04\x00\x00\x00WAVE") is None
    j = avi.find(b"MJPG")  # strh handler comes first
    avi[j:j + 4] = b"H264"
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        MM.decode_video_frames(bytes(avi))
    # truncated container parses to however many whole chunks survive,
    # never raises
    full = bytes(MM.encode_avi_mjpeg(frames))
    for cut in (16, len(full) // 2):
        MM.parse_avi(full[:cut])


def test_avi_fuzz_never_raises():
    rng = np.random.default_rng(11)
    full = bytearray(MM.encode_avi_mjpeg(_video_frames(2)))
    for _ in range(60):
        b = bytearray(full)
        for _ in range(rng.integers(1, 6)):
            b[rng.integers(0, len(b))] = rng.integers(0, 256)
        info = MM.parse_avi(bytes(b))
        if info is not None and (info["handler"] or b"").upper() in (
                b"MJPG", b"JPEG"):
            MM.decode_video_frames(bytes(b))


def test_video_pipeline_end_to_end(spark):
    """AVI bytes -> asset table -> real frame sampling -> the sampled PNG
    frames flow back through the IMAGE ingestion stage — the full video
    composition, numpy oracle at every step."""
    frames = _video_frames(8)
    ones = np.ones(64, dtype=np.int64)
    avi = MM.encode_avi_mjpeg(frames, fps=10, quant_override=ones)  # 800 ms
    raw = spark.createDataFrame(
        [("clip.avi", bytearray(avi)), ("bad.bin", bytearray(b"\x00" * 64))],
        "media_ref string, payload binary",
    )
    assets = MM.video_assets_from_bytes(raw)
    arows = assets.collect()
    assert [r["media_ref"] for r in arows] == ["clip.avi"]
    assert (arows[0]["width"], arows[0]["height"]) == (32, 24)
    assert arows[0]["duration_ms"] == 800

    # every_ms=300 at 100 ms/frame -> frame indices 0, 3, 6
    sampled = MM.sample_frames(assets, every_ms=300, decoder="real").collect()
    assert [r["frame_idx"] for r in sorted(sampled,
                                           key=lambda r: r["frame_idx"])] == [0, 1, 2]
    _, dec = MM.decode_video_frames(avi)
    got = {r["frame_idx"]: MM.decode_image(bytes(r["frame"])) for r in sampled}
    for out_i, src_i in enumerate([0, 3, 6]):
        assert (got[out_i] == dec[src_i]).all()  # PNG is lossless

    # composition: sampled frames are valid image payloads for the image path
    fr_df = spark.createDataFrame(
        [(f"clip.avi#{r['frame_idx']}", bytearray(r["frame"])) for r in sampled],
        "media_ref string, payload binary",
    )
    irows = MM.image_assets_from_bytes(fr_df).collect()
    assert len(irows) == 3
    assert all((r["width"], r["height"]) == (32, 24) for r in irows)


# ---------------------------------------------------------------------------
# animated GIF: multi-frame decode + disposal/transparency composition
# ---------------------------------------------------------------------------


def _ref_animated_gif(frame_specs, palette, screen, bg_idx=0):
    """Independent animated-GIF builder: frame_specs =
    [(idx_array, (x0, y0), delay_cs, disposal, transparent_idx|None)].
    Mirrors _ref_gif's header/LZW conventions with GCE blocks added."""
    w, h = screen
    n = len(palette)
    depth = max(1, (n - 1).bit_length())
    pal_n = 1 << depth
    mcs = max(2, depth)
    out = bytearray(b"GIF89a")
    out += _struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), bg_idx, 0)
    out += bytes(palette.reshape(-1)) + b"\x00" * ((pal_n - n) * 3)
    for idx, (x0, y0), delay_cs, disposal, trans in frame_specs:
        ih, iw = idx.shape
        packed = (disposal & 7) << 2 | (1 if trans is not None else 0)
        out += b"\x21\xf9\x04" + bytes([packed])
        out += _struct.pack("<H", delay_cs) + bytes([trans or 0, 0])
        out += b"\x2c" + _struct.pack("<HHHHB", x0, y0, iw, ih, 0)
        out += bytes([mcs])
        data = _ref_gif_lzw_encode(idx.reshape(-1).tolist(), mcs)
        for i in range(0, len(data), 255):
            chunk = data[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def _anim_palette():
    return np.array([[10, 10, 10], [200, 0, 0], [0, 200, 0], [0, 0, 200]],
                    dtype=np.uint8)


def test_gif_animated_frames_and_disposal_oracle():
    """Composition oracle computed by hand: disposal 2 restores the frame
    region to background, transparency leaves the canvas untouched."""
    pal = _anim_palette()
    f0 = np.full((4, 6), 1, np.uint8)            # full red screen
    f1 = np.full((2, 2), 2, np.uint8)            # green patch at (2,1), disposal 2
    f2 = np.array([[3, 0], [0, 3]], np.uint8)    # blue diag at (0,0), trans idx 0
    gif = _ref_animated_gif(
        [(f0, (0, 0), 5, 1, None),
         (f1, (2, 1), 10, 2, None),
         (f2, (0, 0), 0, 1, 0)],
        pal, screen=(6, 4))
    dec = MM.decode_gif_frames(gif)
    assert dec is not None
    frames, delays = dec
    assert len(frames) == 3 and delays == [50, 100, 100]  # 0 delay -> 100
    red, green, blue, bg = pal[1], pal[2], pal[3], pal[0]
    # frame 0: all red
    assert (frames[0] == red).all()
    # frame 1: red with green patch
    want1 = np.broadcast_to(red, (4, 6, 3)).copy()
    want1[1:3, 2:4] = green
    assert np.array_equal(frames[1], want1)
    # frame 2: disposal 2 restored patch to BACKGROUND; blue diagonal drawn
    # with transparent holes showing the prior canvas (red)
    want2 = np.broadcast_to(red, (4, 6, 3)).copy()
    want2[1:3, 2:4] = bg
    want2[0, 0] = blue
    want2[1, 1] = blue
    assert np.array_equal(frames[2], want2)
    # first-frame decoder agrees with frame 0
    assert np.array_equal(MM.decode_image(gif), frames[0])


def test_gif_animated_disposal_previous():
    pal = _anim_palette()
    f0 = np.full((3, 3), 1, np.uint8)
    f1 = np.full((3, 3), 2, np.uint8)   # disposal 3: restore to previous
    f2 = np.array([[3]], np.uint8)
    gif = _ref_animated_gif(
        [(f0, (0, 0), 1, 1, None),
         (f1, (0, 0), 1, 3, None),
         (f2, (1, 1), 1, 1, None)],
        pal, screen=(3, 3))
    frames, _ = MM.decode_gif_frames(gif)
    assert (frames[1] == pal[2]).all()
    # frame 2 canvas = frame 0 (restored) + single blue pixel
    want = np.broadcast_to(pal[1], (3, 3, 3)).copy()
    want[1, 1] = pal[3]
    assert np.array_equal(frames[2], want)


def test_gif_animated_corrupt_and_static():
    pal = _anim_palette()
    static = _ref_gif(np.full((3, 3), 1, np.uint8), pal)
    dec = MM.decode_gif_frames(static)
    assert dec is not None and len(dec[0]) == 1  # static GIF: one frame
    assert MM.decode_gif_frames(b"GIF89a\x00") is None
    assert MM.decode_gif_frames(b"not a gif") is None
    anim = _ref_animated_gif([(np.full((3, 3), 1, np.uint8), (0, 0), 1, 1, None)] * 3,
                             pal, screen=(3, 3))
    for cut in (10, len(anim) // 2):
        MM.decode_gif_frames(anim[:cut])  # never raises


def test_gif_animated_rides_video_pipeline(spark):
    """Animated GIFs ingest as VIDEO assets and sample real frames by
    cumulative per-frame delay."""
    pal = _anim_palette()
    specs = [(np.full((4, 5), 1 + (i % 3), np.uint8), (0, 0), 10, 1, None)
             for i in range(6)]  # 6 frames x 100 ms
    gif = _ref_animated_gif(specs, pal, screen=(5, 4))
    static = _ref_gif(np.full((3, 3), 1, np.uint8), pal)
    raw = spark.createDataFrame(
        [("anim.gif", bytearray(gif)), ("static.gif", bytearray(static))],
        "media_ref string, payload binary")
    assets = MM.video_assets_from_bytes(raw)
    arows = {r["media_ref"]: r for r in assets.collect()}
    assert set(arows) == {"anim.gif"}  # static GIF is not a video
    assert arows["anim.gif"]["duration_ms"] == 600
    assert (arows["anim.gif"]["width"], arows["anim.gif"]["height"]) == (5, 4)
    sampled = MM.sample_frames(assets, every_ms=200, decoder="real").collect()
    frames, _ = MM.decode_gif_frames(gif)
    assert len(sampled) == 3  # t=0, 200, 400
    for r in sampled:
        src = frames[r["frame_idx"] * 2]
        assert np.array_equal(MM.decode_image(bytes(r["frame"])), src)


# ---------------------------------------------------------------------------
# compressed-audio stream info: header-only MP3 / Ogg / FLAC / WAV metadata
# ---------------------------------------------------------------------------


def test_mp3_stream_info_cbr_spec_arithmetic():
    """CBR MPEG streams: duration/bitrate recomputed from ISO 11172-3
    frame math, independent of the parser."""
    cases = [
        # (version, layer, kbps, rate, channels, n_frames, spf)
        (1, 3, 128, 44100, 2, 38, 1152),
        (1, 3, 320, 48000, 2, 21, 1152),
        (2, 3, 64, 22050, 1, 50, 576),
        (2.5, 3, 16, 8000, 1, 12, 576),  # MPEG2.5: low rates, v2 tables
        (1, 2, 192, 48000, 2, 20, 1152),
        (2, 2, 48, 16000, 1, 15, 1152),
        (1, 1, 256, 32000, 2, 20, 384),
    ]
    for ver, layer, kbps, rate, ch, n, spf in cases:
        p = MM.encode_mp3_stream(n_frames=n, bitrate_kbps=kbps, rate=rate,
                                 version=ver, layer=layer, channels=ch)
        info = MM.audio_stream_info(p)
        assert info is not None, (ver, layer, kbps, rate)
        want_dur = round(n * spf * 1000 / rate)
        assert info == {
            "codec": "mp3", "sample_rate": rate, "channels": ch,
            "duration_ms": want_dur,
            "bitrate_kbps": len(p) * 8 // max(want_dur, 1),
            "n_frames": n,
        }


def test_mp3_stream_info_xing_and_id3():
    p = MM.encode_mp3_stream(n_frames=100, bitrate_kbps=128, rate=44100,
                             xing=True)
    info = MM.audio_stream_info(p)
    assert info["n_frames"] == 100  # Xing count, not walked count (101)
    assert info["duration_ms"] == round(100 * 1152 * 1000 / 44100)
    # ID3v2 prefix (syncsafe size) is skipped
    body = MM.encode_mp3_stream(n_frames=10, bitrate_kbps=128, rate=44100)
    tag = b"ID3\x04\x00\x00" + bytes([0, 0, 1, 4]) + b"\x00" * 132
    info2 = MM.audio_stream_info(tag + body)
    assert info2["n_frames"] == 10
    # garbage prefix before first sync: bounded resync finds the stream
    info3 = MM.audio_stream_info(b"\x12\x34\x56" * 11 + body)
    assert info3["n_frames"] == 10
    # a single frame is rejected (random-byte false-positive guard)...
    one = MM.encode_mp3_stream(n_frames=1, bitrate_kbps=128, rate=44100)
    assert MM.audio_stream_info(one) is None
    # ...unless a Xing tag vouches for it
    one_x = MM.encode_mp3_stream(n_frames=0, bitrate_kbps=128, rate=44100,
                                 xing=True)
    assert MM.audio_stream_info(one_x) is not None


def test_ogg_stream_info_opus_and_vorbis():
    p = MM.encode_ogg_stream("opus", rate=48000, channels=2, n_pages=4,
                             samples_per_page=48000, preskip=312)
    # opus: granules are 48 kHz and include preskip; duration excludes it
    assert MM.audio_stream_info(p) == {
        "codec": "ogg-opus", "sample_rate": 48000, "channels": 2,
        "duration_ms": 4000, "bitrate_kbps": len(p) * 8 // 4000,
        "n_frames": 4}
    v = MM.encode_ogg_stream("vorbis", rate=44100, channels=1, n_pages=3,
                             samples_per_page=44100)
    iv = MM.audio_stream_info(v)
    assert (iv["codec"], iv["sample_rate"], iv["channels"],
            iv["duration_ms"], iv["n_frames"]) == (
        "ogg-vorbis", 44100, 1, 3000, 3)
    # a second multiplexed serial is ignored; truncation never raises
    other = MM.encode_ogg_stream("vorbis", rate=8000, channels=2, n_pages=2,
                                 samples_per_page=100, serial=7)
    mux = p[:len(p) // 2] + other + p[len(p) // 2:]
    for cut in (len(p) - 3, 30, 5):
        MM.audio_stream_info(p[:cut])
    assert MM.audio_stream_info(p + other)["codec"] == "ogg-opus"


def test_flac_and_wav_stream_info():
    f = MM.encode_flac_info(rate=96000, channels=2, bps=24,
                            total_samples=480000)
    assert MM.audio_stream_info(f) == {
        "codec": "flac", "sample_rate": 96000, "channels": 2,
        "duration_ms": 5000, "bitrate_kbps": len(f) * 8 // 5000,
        "n_frames": 480000}
    w = MM.encode_wav(np.zeros(8000), 8000)
    assert MM.audio_stream_info(w) == {
        "codec": "wav", "sample_rate": 8000, "channels": 1,
        "duration_ms": 1000, "bitrate_kbps": 8000 * 2 * 8 // 1000,
        "n_frames": 8000}


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=600))
def test_stream_info_never_raises_on_random_bytes(payload):
    MM.audio_stream_info(payload)


@settings(max_examples=100, deadline=None)
@given(st.data())
def test_stream_info_never_raises_on_mutated_streams(data):
    bases = [
        MM.encode_mp3_stream(8, 128, 44100),
        MM.encode_ogg_stream("opus", n_pages=3),
        MM.encode_ogg_stream("vorbis", rate=44100, n_pages=3),
        MM.encode_flac_info(),
    ]
    base = bytearray(data.draw(st.sampled_from(bases)))
    for _ in range(data.draw(st.integers(1, 8))):
        pos = data.draw(st.integers(0, len(base) - 1))
        base[pos] = data.draw(st.integers(0, 255))
    MM.audio_stream_info(bytes(base))


def test_audio_stream_info_table(spark):
    rows = [
        ("a.mp3", bytearray(MM.encode_mp3_stream(38, 128, 44100))),
        ("b.opus", bytearray(MM.encode_ogg_stream("opus", n_pages=2,
                                                  samples_per_page=24000))),
        ("c.flac", bytearray(MM.encode_flac_info(total_samples=44100))),
        ("d.wav", bytearray(MM.encode_wav(np.zeros(4000), 8000))),
        ("e.bin", bytearray(b"\x00\x01\x02 not audio")),
    ]
    raw = spark.createDataFrame(rows, "media_ref string, payload binary")
    got = {r["media_ref"]: r.asDict()
           for r in MM.audio_stream_info_table(raw).collect()}
    assert set(got) == {"a.mp3", "b.opus", "c.flac", "d.wav", "e.bin"}
    for ref, row in got.items():
        want = MM.audio_stream_info(bytes(dict(rows)[ref]))
        if want is None:
            assert row["codec"] == "unknown" and row["sample_rate"] is None
        else:
            assert {k: row[k] for k in want} == want
    assert got["e.bin"]["codec"] == "unknown"
    assert got["a.mp3"]["codec"] == "mp3"


# ---------------------------------------------------------------------------
# image stream info: header-only dims/format/progressive/EXIF metadata
# ---------------------------------------------------------------------------


def _exif_app1(orientation, endian="II"):
    import struct as _st

    e = "<" if endian == "II" else ">"
    tiff = (endian.encode() + _st.pack(e + "H", 42) + _st.pack(e + "I", 8)
            + _st.pack(e + "H", 1)
            + _st.pack(e + "HHI", 0x0112, 3, 1)
            + _st.pack(e + "H", orientation) + b"\x00\x00"
            + _st.pack(e + "I", 0))
    body = b"Exif\x00\x00" + tiff
    return b"\xFF\xE1" + _st.pack(">H", len(body) + 2) + body


def test_image_stream_info_formats_and_flags():
    from smartcrawler_spark.jpeg import (encode_jpeg_baseline,
                                         encode_jpeg_progressive)

    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    cases = {
        "png": MM.encode_png(px),
        "ppm": MM.encode_ppm(px),
        "jpeg": encode_jpeg_baseline(px, quality=85),
        "bmp": _encode_bmp(px),
    }
    for fmt, payload in cases.items():
        info = MM.image_stream_info(payload)
        assert (info["format"], info["width"], info["height"]) == (fmt, 23, 17), fmt
        assert info["progressive"] is False and info["n_frames"] == 1
    prog = MM.image_stream_info(encode_jpeg_progressive(px, quality=85))
    assert prog["progressive"] is True and (prog["width"], prog["height"]) == (23, 17)


def test_image_stream_info_exif_orientation():
    from smartcrawler_spark.jpeg import encode_jpeg_baseline

    rng = np.random.default_rng(3)
    base = encode_jpeg_baseline(rng.integers(0, 256, (8, 9, 3), dtype=np.uint8))
    for endian in ("II", "MM"):
        for o in (1, 6, 8):
            j = base[:2] + _exif_app1(o, endian) + base[2:]
            assert MM.image_stream_info(j)["orientation"] == o, (endian, o)
    # invalid orientation value and malformed TIFF -> 0, never a crash
    j = base[:2] + _exif_app1(55) + base[2:]
    assert MM.image_stream_info(j)["orientation"] == 0
    j2 = base[:2] + b"\xFF\xE1\x00\x0AExif\x00\x00ZZ" + base[2:]
    assert MM.image_stream_info(j2)["orientation"] == 0


def test_image_stream_info_gif_frames():
    pal = _anim_palette()
    specs = [(np.full((4, 5), 1, np.uint8), (0, 0), 10, 1, None)] * 5
    anim = _ref_animated_gif(specs, pal, screen=(5, 4))
    info = MM.image_stream_info(anim)
    assert (info["format"], info["width"], info["height"],
            info["n_frames"]) == ("gif", 5, 4, 5)
    static = _ref_gif(np.full((3, 3), 1, np.uint8), pal)
    assert MM.image_stream_info(static)["n_frames"] == 1


def test_image_stream_info_apng_frame_count():
    import struct as _st
    import zlib as _zl

    def chunk(ctype, body):
        return (_st.pack(">I", len(body)) + ctype + body
                + _st.pack(">I", _zl.crc32(ctype + body)))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", _st.pack(">IIBBBBB", 7, 5, 8, 2, 0, 0, 0))
           + chunk(b"acTL", _st.pack(">II", 12, 0))
           + chunk(b"IDAT", b"\x00") + chunk(b"IEND", b""))
    info = MM.image_stream_info(png)
    assert (info["width"], info["height"], info["n_frames"]) == (7, 5, 12)


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_image_stream_info_never_raises(payload):
    MM.image_stream_info(payload)


def test_image_stream_info_table(spark):
    rng = np.random.default_rng(4)
    px = rng.integers(0, 256, (6, 8, 3), dtype=np.uint8)
    rows = [("a.png", bytearray(MM.encode_png(px))),
            ("b.ppm", bytearray(MM.encode_ppm(px))),
            ("junk", bytearray(b"nope"))]
    got = {r["media_ref"]: r.asDict()
           for r in MM.image_stream_info_table(
               spark.createDataFrame(rows, "media_ref string, payload binary")
           ).collect()}
    assert got["a.png"]["format"] == "png" and got["a.png"]["width"] == 8
    assert got["b.ppm"]["format"] == "ppm"
    assert got["junk"]["format"] == "unknown" and got["junk"]["width"] is None


# --- TIFF stream info (header-only tier) ---

def _ref_tiff(w, h, bits=8, orientation=None, pages=1, end="<"):
    """Minimal spec-built TIFF: one or more chained IFDs, SHORT values
    inline. Independent of the engine parser."""
    import struct

    def u16(v):
        return struct.pack(end + "H", v)

    def u32(v):
        return struct.pack(end + "I", v)

    out = bytearray(b"II*\x00" if end == "<" else b"MM\x00*")
    out += u32(8)
    pos = 8
    for p in range(pages):
        tags = [(256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, bits)]
        if orientation is not None and p == 0:
            tags.append((274, 3, 1, orientation))
        tags.sort()
        ifd = u16(len(tags))
        for tag, ttype, count, val in tags:
            ifd += u16(tag) + u16(ttype) + u32(count) + u16(val) + u16(0)
        next_off = 0 if p == pages - 1 else pos + 2 + 12 * len(tags) + 4
        ifd += u32(next_off)
        out += ifd
        pos += len(ifd)
    return bytes(out)


def test_tiff_stream_info_both_endians_and_pages():
    from smartcrawler_spark.multimodal import image_stream_info

    for end in ("<", ">"):
        got = image_stream_info(_ref_tiff(640, 480, bits=16,
                                          orientation=6, end=end))
        assert got == {"format": "tiff", "width": 640, "height": 480,
                       "bit_depth": 16, "n_frames": 1,
                       "progressive": False, "orientation": 6}
    multi = image_stream_info(_ref_tiff(32, 16, pages=3))
    assert multi["n_frames"] == 3 and multi["width"] == 32
    assert multi["orientation"] is None


def test_tiff_stream_info_damage_tolerant():
    from smartcrawler_spark.multimodal import image_stream_info

    good = _ref_tiff(100, 50, pages=2)
    # truncations: None or a sane partial answer, never an exception
    for cut in range(4, len(good), 5):
        got = image_stream_info(good[:cut])
        assert got is None or got["format"] == "tiff"
    # IFD cycle (next-IFD pointer back to itself) terminates
    import struct

    cyc = bytearray(_ref_tiff(10, 10))
    n = struct.unpack_from("<H", cyc, 8)[0]
    struct.pack_into("<I", cyc, 8 + 2 + 12 * n, 8)
    got = image_stream_info(bytes(cyc))
    assert got is not None and got["n_frames"] == 1
