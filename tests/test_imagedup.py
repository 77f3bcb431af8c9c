"""Perceptual image dedup (operators/imagedup.py).

The golden gate (image_dhash / image_dhash_pairs) pins hash values and
pair sets against known-pixel-truth goldens over LOSSLESS encodings;
these tests cover what the gate can't: banded-join == brute-force
equality on adversarial hash sets, lossy-decode (JPEG) robustness, the
exactness bound, the id-collision guard, and the hot-bucket cap.
"""

from __future__ import annotations

import numpy as np
import pytest

from smartcrawler_spark.operators import imagedup as ID


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _brute_pairs(hashes: list[tuple[str, int]], k: int):
    out = []
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            ham = bin((hashes[i][1] ^ hashes[j][1]) & ((1 << 64) - 1)).count("1")
            if ham <= k:
                a, b = sorted((hashes[i][0], hashes[j][0]))
                out.append((a, b, ham))
    return sorted(out)


def test_banded_equals_brute_force(spark):
    """Multi-index banding is EXACT for max_hamming <= 7: same pair set
    as O(n^2) on hashes crafted to stress band boundaries (clusters a
    few bit flips apart, some flips crossing band edges, plus sign-bit
    hashes exercising the signed shift/mask band extraction)."""
    rng = np.random.default_rng(7)
    hashes: list[tuple[str, int]] = []
    n = 0
    for c in range(12):
        base = int(rng.integers(0, 1 << 63)) | (int(rng.integers(0, 2)) << 63)
        for _ in range(int(rng.integers(1, 5))):
            flips = rng.choice(64, size=int(rng.integers(0, 9)), replace=False)
            v = base
            for f in flips:
                v ^= 1 << int(f)
            hashes.append((f"h{n:03d}", v - (1 << 64) if v >= (1 << 63) else v))
            n += 1
    df = spark.createDataFrame(hashes, "media_ref string, dhash long")
    got = _rows(ID.dhash_near_dup(df, max_hamming=7, max_band_bucket=None))
    assert got == _brute_pairs(hashes, 7)
    got6 = _rows(ID.dhash_near_dup(df, max_hamming=6))
    assert got6 == _brute_pairs(hashes, 6)


def test_exactness_bound_is_enforced():
    with pytest.raises(ValueError, match="8-band exactness"):
        ID.dhash_near_dup(None, max_hamming=8)


def test_duplicate_refs_raise(spark):
    df = spark.createDataFrame(
        [("same", 1), ("same", 2)], "media_ref string, dhash long")
    with pytest.raises(ValueError, match="collision"):
        ID.dhash_near_dup(df)


def test_hot_bucket_cap_drops_degenerate_buckets(spark):
    """40 flat images all hash to 0 -> every band bucket holds 40; a cap
    below that suppresses the quadratic blowup (documented recall
    trade), while cap=None keeps all C(40,2) pairs."""
    df = spark.createDataFrame(
        [(f"flat{i:02d}", 0) for i in range(40)], "media_ref string, dhash long")
    assert ID.dhash_near_dup(df, max_band_bucket=10).count() == 0
    assert ID.dhash_near_dup(df, max_band_bucket=None).count() == 40 * 39 // 2


def test_dhash_survives_jpeg_reencode(spark):
    """The lossy path the golden can't pin: a JPEG round-trip must stay
    within a few bits of the lossless hash, and unrelated images must
    stay far apart."""
    from smartcrawler_spark.jpeg import encode_jpeg_baseline
    from smartcrawler_spark.multimodal import decode_image

    import __spark_entry__ as E

    pa = E._dhash_case_pixels(0, 48, 36, None)
    pb = E._dhash_case_pixels(21, 48, 36, None)
    ha = ID.dhash64(pa)
    ha_jpeg = ID.dhash64(decode_image(encode_jpeg_baseline(pa, quality=90)))
    hb = ID.dhash64(pb)
    d_same = bin((ha ^ ha_jpeg) & ((1 << 64) - 1)).count("1")
    d_diff = bin((ha ^ hb) & ((1 << 64) - 1)).count("1")
    # observed: the q90 round-trip moves 0 bits; different-seed images
    # (which still share the case recipe's gradient backbone) sit ~10
    # bits out — beyond the near-dup radius and beyond the round-trip
    assert d_same <= 6, f"JPEG round-trip moved {d_same} bits"
    assert d_diff > 6 and d_diff > d_same, \
        f"unrelated images only {d_diff} bits apart"


def test_kernel_edge_cases():
    # sub-grid images can't form the 8x9 box grid
    assert ID.dhash64(np.zeros((7, 20, 3), dtype=np.uint8)) is None
    assert ID.dhash64(np.zeros((20, 8, 3), dtype=np.uint8)) is None
    # exactly grid-sized works, flat image hashes to 0 (no strict rises)
    assert ID.dhash64(np.zeros((8, 9, 3), dtype=np.uint8)) == 0
    # a pure horizontal ramp: every left box mean < right -> all bits 0;
    # reversed ramp -> all bits 1 -> signed -1
    ramp = np.tile(np.arange(90, dtype=np.uint8) * 2, (16, 1))
    px = np.stack([ramp] * 3, axis=-1)
    assert ID.dhash64(px) == 0
    assert ID.dhash64(px[:, ::-1]) == -1


def test_table_drops_undecodable_and_small(spark):
    from smartcrawler_spark.multimodal import encode_ppm

    rows = [
        ("ok", bytearray(encode_ppm(
            np.arange(30 * 20 * 3, dtype=np.uint8).reshape(20, 30, 3) % 251))),
        ("junk", bytearray(b"nope")),
        ("tiny", bytearray(encode_ppm(np.zeros((4, 4, 3), dtype=np.uint8)))),
    ]
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    got = ID.image_dhash_table(df).collect()
    assert [r["media_ref"] for r in got] == ["ok"]
    assert got[0]["width"] == 30 and got[0]["height"] == 20
