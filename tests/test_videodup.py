"""Video shot segmentation + frame-set overlap (operators/videodup.py).

The driver gates pin the end-to-end AVI path against construction-
parameter oracles; these tests cover the pieces directly: the frame
table vs a python decode+hash oracle, the GIF container path, shot
logic on adversarial hash sequences, and the overlap math vs brute
force on synthetic hash tables.
"""

from __future__ import annotations

import numpy as np

from smartcrawler_spark.operators import videodup as VD
from smartcrawler_spark.operators.imagedup import dhash64


def _px(seed: int, w: int = 48, h: int = 36) -> np.ndarray:
    import __spark_entry__ as E

    return E._dhash_case_pixels(seed, w, h, None)


def test_frame_table_matches_python_oracle(spark):
    from smartcrawler_spark import multimodal as MM

    frames = [_px(0), _px(0), _px(5), _px(13)]
    avi = MM.encode_avi_mjpeg(frames, quality=85)
    want = [(i, dhash64(f)) for i, f in
            enumerate(VD._frames_of(avi, 256))]
    df = spark.createDataFrame(
        [("v", bytearray(avi)), ("junk", bytearray(b"RIFFnope")),
         ("notvideo", bytearray(b"\x00\x01"))],
        "media_ref string, payload binary")
    got = sorted((r["media_ref"], r["frame_idx"], r["dhash"])
                 for r in VD.frame_dhash_table(df).collect())
    assert got == [("v", i, h) for i, h in want]
    assert len(got) == 4
    # decoded hashes equal the pre-encode hashes at q85 (the margin the
    # gate design rests on)
    assert [h for _, h in want] == [dhash64(f) for f in frames]


def test_gif_container_path(spark):
    """A single-frame GIF rides the same frame table (decode_gif_frames
    tier); GIF palettes quantize, so pin only plumbing + determinism."""
    from smartcrawler_spark import multimodal as MM

    gif = None
    px = np.zeros((16, 18, 3), dtype=np.uint8)
    px[:, 9:] = 255
    # encode via PNG -> decode -> hand-build GIF is overkill; reuse the
    # engine's GIF decoder on a minimal uncompressed-style fixture from
    # the multimodal test helpers
    import tests.test_multimodal as TM

    idx = np.zeros((16, 18), dtype=np.uint8)
    idx[:, 9:] = 1
    gif = TM._ref_gif(idx, np.array([[0, 0, 0], [255, 255, 255]],
                                    dtype=np.uint8))
    df = spark.createDataFrame([("g", bytearray(gif))],
                               "media_ref string, payload binary")
    rows = VD.frame_dhash_table(df).collect()
    assert len(rows) == 1
    assert rows[0]["dhash"] == dhash64(px)


def test_shot_bounds_python_oracle(spark):
    """Shot segmentation on a crafted hash sequence: cuts exactly where
    hamming > threshold, first frame always opens shot 0, single-frame
    videos are one one-frame shot."""
    seq = [0, 1, 0b11, 0xFF, 0xFF ^ 0b111000, 0xFF]  # deltas:1,1,6,3,3
    rows = [("a", i, h) for i, h in enumerate(seq)] + [("b", 0, 42)]
    df = spark.createDataFrame(rows, "media_ref string, frame_idx int, dhash long")
    got = sorted(tuple(r) for r in VD.shot_bounds(df, threshold=5).collect())
    assert got == [
        ("a", 0, 0, 2, 3),   # 0,1,3: deltas 1,1
        ("a", 1, 3, 5, 3),   # cut at delta 6; then 3,3 stay
        ("b", 0, 0, 0, 1),
    ]
    # threshold 0: every nonzero delta cuts
    n_shots = VD.shot_bounds(df.filter("media_ref = 'a'"), threshold=0).count()
    assert n_shots == 6


def test_overlap_matches_brute_force(spark):
    vids = {"a": {1, 2, 3, 4}, "b": {3, 4, 5}, "c": {9}, "d": {4}}
    rows = [(v, i, h) for v, hs in vids.items()
            for i, h in enumerate(sorted(hs))]
    df = spark.createDataFrame(rows, "media_ref string, frame_idx int, dhash long")
    got = {(r["ref_a"], r["ref_b"]):
           (r["shared"], r["a_total"], r["b_total"],
            r["containment_a_bp"], r["containment_b_bp"])
           for r in VD.video_frame_overlap(df).collect()}
    want = {}
    names = sorted(vids)
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            a, b = names[i], names[j]
            s = len(vids[a] & vids[b])
            if s >= 1:
                want[(a, b)] = (s, len(vids[a]), len(vids[b]),
                                10000 * s // len(vids[a]),
                                10000 * s // len(vids[b]))
    assert got == want


def test_overlap_hot_cap_and_min_shared(spark):
    # hash 7 appears in 30 videos -> capped out at max_hash_bucket=10;
    # the only surviving pair is the one sharing a cold hash
    rows = [(f"v{i:02d}", 0, 7) for i in range(30)]
    rows += [("v00", 1, 99), ("v01", 1, 99)]
    df = spark.createDataFrame(rows, "media_ref string, frame_idx int, dhash long")
    got = VD.video_frame_overlap(df, max_hash_bucket=10).collect()
    assert [(r["ref_a"], r["ref_b"], r["shared"]) for r in got] == \
        [("v00", "v01", 1)]
    # totals still count the capped hash (it is real content)
    assert got[0]["a_total"] == 2 and got[0]["containment_a_bp"] == 5000
    # uncapped: every pair among the 30 shares hash 7
    assert VD.video_frame_overlap(df, max_hash_bucket=None).count() == \
        30 * 29 // 2


# --- APNG video tier (multimodal.decode_apng_frames) ---

def _apng_chunks(w, h, color, frames):
    """Hand-assembled APNG: frames = [(fw,fh,x0,y0,dispose,blend,rgba_or_rgb)].
    Independent of the engine's encoder — built straight from the spec."""
    import struct
    import zlib

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    out = bytearray(b"\x89PNG\r\n\x1a\n")
    out += chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
    out += chunk(b"acTL", struct.pack(">II", len(frames), 0))
    seq = 0
    for i, (fw, fh, x0, y0, dispose, blend, px) in enumerate(frames):
        out += chunk(b"fcTL", struct.pack(
            ">IIIIIHHBB", seq, fw, fh, x0, y0, 1, 10, dispose, blend))
        seq += 1
        raw = b"".join(b"\x00" + px[y].tobytes() for y in range(fh))
        z = zlib.compress(raw)
        if i == 0:
            out += chunk(b"IDAT", z)
        else:
            out += chunk(b"fdAT", struct.pack(">I", seq) + z)
            seq += 1
    out += chunk(b"IEND", b"")
    return bytes(out)


def test_apng_region_blend_dispose():
    from smartcrawler_spark.multimodal import decode_apng_frames

    base = np.full((8, 8, 4), [10, 20, 30, 255], dtype=np.uint8)
    patch_src = np.full((4, 4, 4), [200, 0, 0, 255], dtype=np.uint8)
    half = np.full((4, 4, 4), [0, 100, 0, 128], dtype=np.uint8)
    apng = _apng_chunks(8, 8, 6, [
        (8, 8, 0, 0, 0, 0, base),          # full canvas
        (4, 4, 2, 2, 2, 0, patch_src),     # SOURCE patch, dispose PREVIOUS
        (4, 4, 0, 0, 0, 1, half),          # OVER blend after restore
    ])
    frames, delays = decode_apng_frames(apng)
    assert len(frames) == 3 and delays == [100, 100, 100]
    # frame 0: the base everywhere
    assert (frames[0] == [10, 20, 30]).all()
    # frame 1: red patch replaces the 2..6 square
    assert (frames[1][2:6, 2:6] == [200, 0, 0]).all()
    assert (frames[1][0, 0] == [10, 20, 30]).all()
    # frame 2: dispose PREVIOUS restored the base, then OVER at (0,0):
    # out = (src*128 + dst*127 + 127)//255, exactly
    want = ((np.array([0, 100, 0]) * 128
             + np.array([10, 20, 30]) * 127 + 127) // 255)
    assert (frames[2][0:4, 0:4] == want).all()
    assert (frames[2][2:6, 4:6] == [10, 20, 30]).all()  # patch gone


def test_apng_dispose_background_clears_region():
    from smartcrawler_spark.multimodal import decode_apng_frames

    base = np.full((6, 6, 4), [50, 50, 50, 255], dtype=np.uint8)
    dot = np.full((2, 2, 4), [255, 255, 255, 255], dtype=np.uint8)
    apng = _apng_chunks(6, 6, 6, [
        (6, 6, 0, 0, 1, 0, base),   # dispose BACKGROUND: clears all
        (2, 2, 1, 1, 0, 0, dot),
    ])
    frames, _ = decode_apng_frames(apng)
    assert (frames[0] == 50).all()
    # after clearing, only the dot is lit; rest is transparent black
    assert (frames[1][1:3, 1:3] == 255).all()
    assert (frames[1][0, 0] == 0).all() and (frames[1][5, 5] == 0).all()


def test_apng_rejects_spec_violations():
    from smartcrawler_spark import multimodal as MM

    f = np.zeros((4, 4, 3), dtype=np.uint8)
    good = MM.encode_apng([f, f])
    assert MM.decode_apng_frames(good) is not None
    # region outside canvas
    bad = _apng_chunks(4, 4, 2, [(4, 4, 0, 0, 0, 0, f),
                                 (4, 4, 2, 2, 0, 0, f)])
    assert MM.decode_apng_frames(bad) is None
    # still PNG (no acTL)
    assert MM.decode_apng_frames(MM.encode_png(f)) is None
    # bit-flip fuzz: exact-or-None, never garbage shapes
    for pos in range(40, min(len(good), 140), 7):
        mutated = bytearray(good)
        mutated[pos] ^= 0xFF
        dec = MM.decode_apng_frames(bytes(mutated))
        if dec is not None:
            frames, _ = dec
            assert all(fr.shape == (4, 4, 3) for fr in frames)


def test_frames_of_apng_path(spark):
    from smartcrawler_spark import multimodal as MM

    a, b = _px(0), _px(5)
    apng = MM.encode_apng([a, a, b])
    got = VD._frames_of(apng, 256)
    assert len(got) == 3
    assert (got[0] == a).all() and (got[2] == b).all()
    # still PNG is an image, not a one-frame video
    assert VD._frames_of(MM.encode_png(a), 256) == []
    df = spark.createDataFrame([("v", bytearray(apng))],
                               "media_ref string, payload binary")
    rows = VD.frame_dhash_table(df).collect()
    assert [r["dhash"] for r in sorted(rows, key=lambda r: r["frame_idx"])] \
        == [dhash64(a), dhash64(a), dhash64(b)]
