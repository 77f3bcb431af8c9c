"""Perceptual image dedup: 64-bit difference hash (dHash) + multi-index
hamming near-dup over a binary image column.

An LLM-training-corpus op beyond the reference's operator set (the
reference drops media outright: /root/reference/src/html_parser.rs
keeps only text spans); multimodal corpora need image-level near-dup
the same way text needs MinHash. dHash is the standard cheap
perceptual hash: luma -> coarse grid -> horizontal gradient signs.
Re-encodes, small noise, and light color shifts move few bits;
unrelated images differ in ~32.

All-integer, deterministic kernel (no float resize), so a pure-numpy
golden oracle can replay it bit-exactly from known pixel truth:

  luma      l = (77*R + 150*G + 29*B) >> 8          (BT.601 integer)
  grid      g[r][c] = mean of the box [r*H//8, (r+1)*H//8) x
                      [c*W//9, (c+1)*W//9)  (integer floor division)
  bits      bit(r, c) = g[r][c] > g[r][c+1], MSB-first row-major
            (8 rows x 8 comparisons = 64 bits, stored signed int64)

100 TB design: hashing is map-only (`mapInPandas` over the payload
column, Arrow-batched, no shuffle). Near-dup never goes all-pairs —
the 64-bit hash splits into 8 disjoint 8-bit bands; by pigeonhole any
pair within hamming distance <= 7 agrees EXACTLY on at least one band,
so an equi-join per band has perfect recall for max_hamming <= 7 and
the post-filter `bit_count(xor) <= max_hamming` makes it exact. The
banded exchange moves (id64, dhash, band) longs only — refs join back
once at the end — mirroring the slim-exchange shape of
similarity.embedding_near_dup_lsh. Hot bands (e.g. flat-color images
all hashing to 0) are capped like sketches.mirror_hosts' hot-hash cap.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DHASH_SCHEMA = "media_ref string, dhash long, width int, height int"

_GRID_ROWS = 8
_GRID_COLS = 9  # 8 horizontal comparisons per row


def dhash64(px: np.ndarray) -> int | None:
    """The integer dHash kernel over an HxWx3 uint8 RGB array; None when
    the image is smaller than the comparison grid (can't form 8x9 boxes).
    Every step is integer arithmetic -> bit-exact across platforms."""
    h, w = px.shape[:2]
    if h < _GRID_ROWS or w < _GRID_COLS:
        return None
    p = px.astype(np.uint32)
    luma = (77 * p[:, :, 0] + 150 * p[:, :, 1] + 29 * p[:, :, 2]) >> 8
    # integral image -> O(1) integer box sums at arbitrary H, W
    ii = np.zeros((h + 1, w + 1), dtype=np.int64)
    ii[1:, 1:] = luma.cumsum(0).cumsum(1)
    rb = [r * h // _GRID_ROWS for r in range(_GRID_ROWS + 1)]
    cb = [c * w // _GRID_COLS for c in range(_GRID_COLS + 1)]
    grid = [
        [
            int(ii[rb[r + 1], cb[c + 1]] - ii[rb[r], cb[c + 1]]
                - ii[rb[r + 1], cb[c]] + ii[rb[r], cb[c]])
            // ((rb[r + 1] - rb[r]) * (cb[c + 1] - cb[c]))
            for c in range(_GRID_COLS)
        ]
        for r in range(_GRID_ROWS)
    ]
    bits = 0
    for r in range(_GRID_ROWS):
        for c in range(_GRID_COLS - 1):
            bits = (bits << 1) | (1 if grid[r][c] > grid[r][c + 1] else 0)
    return int(np.uint64(bits).astype(np.int64))  # two's-complement long


def image_dhash_table(raw: DataFrame, ref_col: str = "media_ref",
                      payload_col: str = "payload") -> DataFrame:
    """(media_ref, dhash, width, height) for every decodable image in
    `raw`'s binary `payload_col` (JPEG/PNG/GIF/PPM/BMP via the in-repo
    decoders). Undecodable or sub-grid payloads are dropped. Map-only:
    zero Exchange nodes at any scale."""
    from smartcrawler_spark.multimodal import decode_image

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            refs: list[str] = []
            hashes: list[int] = []
            ws: list[int] = []
            hs: list[int] = []
            for ref, payload in zip(pdf[ref_col], pdf[payload_col]):
                try:
                    px = decode_image(bytes(payload))
                except Exception:
                    px = None
                if px is None:
                    continue
                hv = dhash64(px)
                if hv is None:
                    continue
                refs.append(ref)
                hashes.append(hv)
                hs.append(px.shape[0])
                ws.append(px.shape[1])
            yield pd.DataFrame({
                "media_ref": pd.Series(refs, dtype="object"),
                "dhash": pd.Series(hashes, dtype="int64"),
                "width": pd.Series(ws, dtype="int32"),
                "height": pd.Series(hs, dtype="int32"),
            })

    return raw.select(ref_col, payload_col).mapInPandas(batches, DHASH_SCHEMA)


def dhash_near_dup(hashes: DataFrame, max_hamming: int = 6,
                   ref_col: str = "media_ref", hash_col: str = "dhash",
                   max_band_bucket: int | None = 100_000) -> DataFrame:
    """Exact hamming-<=k near-dup pairs (ref_a < ref_b, hamming) via
    multi-index banding: 8 disjoint 8-bit bands, equi-join per band,
    `bit_count(a ^ b) <= max_hamming` post-filter. Pigeonhole gives
    perfect recall for max_hamming <= 7 (8 bands can't all differ), so
    the result equals brute force; larger k raises ValueError rather
    than silently losing pairs.

    Scale: the per-band exchange carries (id64, dhash, band-key) longs
    only; media_ref strings join back once over the pair set. Bands
    holding > max_band_bucket members (degenerate flat-image hashes)
    are dropped from CANDIDATE GENERATION only — a documented recall
    cap on pathological buckets, same tradeoff as mirror_hosts'
    hot-hash cap; None disables. id64 is xxhash64(ref): duplicate ids
    are detected (one aggregate on the hash table) and raise rather
    than corrupt pairs."""
    if max_hamming > 7:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the 8-band exactness bound "
            f"(7); add band-enumeration before raising this")
    # persist the (id64, ref, dhash) table: it feeds the collision
    # probe, band explode + hot-band build, and both ref join-backs —
    # six evaluations of the upstream lineage otherwise, and for the
    # common caller that lineage IS the image decode (the r5 ADVICE
    # item: the eager collision check re-decoded every image unless the
    # caller persisted). One row per image (~50B), the fingerprint tier
    # of the guide's decide-on-small-rows discipline — cacheable at any
    # corpus size the hash join itself is feasible at.
    ids = hashes.select(
        F.xxhash64(F.col(ref_col)).alias("id64"),
        F.col(ref_col).alias("media_ref"),
        F.col(hash_col).alias("dhash"),
    ).persist()
    dup = (ids.groupBy("id64").count().filter(F.col("count") > 1).limit(1)
           .collect())
    if dup:
        raise ValueError(f"xxhash64({ref_col}) collision at id64="
                         f"{dup[0]['id64']}; supply unique refs")
    slim = ids.select("id64", "dhash")
    bands = slim.select(
        "id64", "dhash",
        F.posexplode(F.array(*[
            F.expr(f"(dhash >> {8 * b}) & 255") for b in range(8)
        ])).alias("band_idx", "band_val"),
    )
    if max_band_bucket is not None:
        hot = (bands.groupBy("band_idx", "band_val").count()
               .filter(F.col("count") > max_band_bucket)
               .select("band_idx", "band_val"))
        bands = bands.join(F.broadcast(hot), ["band_idx", "band_val"],
                           "left_anti")
    a = bands.select(F.col("id64").alias("ia"), F.col("dhash").alias("ha"),
                     "band_idx", "band_val")
    b = bands.select(F.col("id64").alias("ib"), F.col("dhash").alias("hb"),
                     "band_idx", "band_val")
    pairs = (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("ia") < F.col("ib"))
        .select("ia", "ib", "ha", "hb")
        .distinct()  # a pair can agree on several bands
        .withColumn("hamming",
                    F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("ia", "ib", "hamming")
    )
    ra = ids.select(F.col("id64").alias("ia"), F.col("media_ref").alias("ra"))
    rb = ids.select(F.col("id64").alias("ib"), F.col("media_ref").alias("rb"))
    return (pairs.join(ra, "ia").join(rb, "ib")
            .select(F.least("ra", "rb").alias("ref_a"),
                    F.greatest("ra", "rb").alias("ref_b"),
                    F.col("hamming").cast("int").alias("hamming")))
