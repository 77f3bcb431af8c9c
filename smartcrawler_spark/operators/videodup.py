"""Video shot segmentation + frame-level near-dup over binary video
columns, composed from the in-repo decoders (MJPEG-in-AVI, animated
GIF) and the integer dHash kernel (operators/imagedup.py).

Training-corpus motivation: video dedup at corpus scale works on
frame-fingerprint SETS, not raw pixels — two encodes of the same clip
share (nearly) the same frame-hash multiset even when containers,
framerates at the tail, or byte sizes differ; shot boundaries feed
frame-sampling (one keyframe per shot beats every-Nth-frame for
training-data diversity). The reference drops media outright
(/root/reference/src/html_parser.rs), so like imagedup this is 100 TB
pipeline breadth.

Shapes at scale:
* `frame_dhash_table` — map-only (mapInPandas decode + hash, zero
  Exchange); a video row becomes <= max_frames (media_ref, frame_idx,
  dhash) rows.
* `shot_bounds` — one window over (media_ref, frame_idx): per-video
  ordering only, partitioned by media_ref, so the exchange is the
  frame table hashed by video id — no global sort.
* `video_frame_overlap` — candidate pairs share >= 1 EXACT frame hash
  (an equi-join on dhash, long keys), then integer containment
  basis points per pair; never all-pairs. Hot hashes (test cards,
  black frames) capped like imagedup's band buckets.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .imagedup import dhash64

FRAME_DHASH_SCHEMA = "media_ref string, frame_idx int, dhash long"


def _frames_of(payload: bytes, max_frames: int):
    from smartcrawler_spark import multimodal as MM

    if payload[:6] in (b"GIF87a", b"GIF89a"):
        decoded = MM.decode_gif_frames(payload, max_frames=max_frames)
        if decoded is None:
            return []
        frames, _delays = decoded
        return frames
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        # APNG only: still PNGs are images, not one-frame videos (unlike
        # GIF, whose video ingest is the established r4 tier)
        decoded = MM.decode_apng_frames(payload, max_frames=max_frames)
        if decoded is None:
            return []
        frames, _delays = decoded
        return frames
    if payload[:4] == b"RIFF":
        try:
            decoded = MM.decode_video_frames(payload)
        except NotImplementedError:
            return []  # non-MJPEG codec: the declared ffmpeg seam
        if decoded is None:
            return []
        _, frames = decoded
        return frames[:max_frames]
    return []


def frame_dhash_table(raw: DataFrame, ref_col: str = "media_ref",
                      payload_col: str = "payload",
                      max_frames: int = 256) -> DataFrame:
    """(media_ref, frame_idx, dhash) per decodable video frame. Frames
    smaller than the 8x9 dHash grid are skipped with their frame_idx
    still advancing. NB (r6 ADVICE): frames the JPEG layer rejects are
    filtered out by decode_video_frames BEFORE this table sees them, so
    for a container with corrupt frames the indices are positions in
    the DECODED frame sequence, not container frame numbers — shot
    bounds are consistent within that sequence. Map-only."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            refs, idxs, hashes = [], [], []
            for ref, payload in zip(pdf[ref_col], pdf[payload_col]):
                try:
                    frames = _frames_of(bytes(payload), max_frames)
                except Exception:
                    continue
                for i, px in enumerate(frames):
                    if px is None:
                        continue
                    hv = dhash64(px)
                    if hv is None:
                        continue
                    refs.append(ref)
                    idxs.append(i)
                    hashes.append(hv)
            yield pd.DataFrame({
                "media_ref": pd.Series(refs, dtype="object"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "dhash": pd.Series(hashes, dtype="int64"),
            })

    return (raw.select(ref_col, payload_col)
            .mapInPandas(batches, FRAME_DHASH_SCHEMA))


def shot_bounds(frames: DataFrame, threshold: int = 5,
                ref_col: str = "media_ref") -> DataFrame:
    """Segment each video into shots: a new shot starts where the dHash
    hamming distance between consecutive frames exceeds `threshold`
    (within-shot deltas for static or slowly-moving content sit at 0-2
    bits; cuts between unrelated scenes measure >= 7 on the JPEG tier —
    see the gate's margin note). Output one row per shot:
    (media_ref, shot_idx, start_frame, end_frame, n_frames),
    all-integer. One window partitioned by video id."""
    w = Window.partitionBy(ref_col).orderBy("frame_idx")
    cut = (
        frames.withColumn("_prev", F.lag("dhash").over(w))
        .withColumn(
            "_is_cut",
            F.when(F.col("_prev").isNull(), F.lit(1)).otherwise(
                (F.bit_count(F.col("dhash").bitwiseXOR(F.col("_prev")))
                 > threshold).cast("int")),
        )
        .withColumn("shot_idx", F.sum("_is_cut").over(w) - 1)
    )
    return (
        cut.groupBy(ref_col, "shot_idx")
        .agg(
            F.min("frame_idx").alias("start_frame"),
            F.max("frame_idx").alias("end_frame"),
            F.count(F.lit(1)).cast("long").alias("n_frames"),
        )
        .select(ref_col, F.col("shot_idx").cast("long").alias("shot_idx"),
                "start_frame", "end_frame", "n_frames")
    )


def video_frame_overlap(frames: DataFrame, min_shared: int = 1,
                        ref_col: str = "media_ref",
                        hash_col: str = "dhash",
                        max_hash_bucket: int = 10_000) -> DataFrame:
    """Frame-set containment per video pair: candidates share >= 1
    exact frame dHash; containment_bp = 10000 * |A distinct-hash-set
    intersect B| // |A's distinct hashes| (and symmetrically for B), the
    asymmetric quote/subset measure of shingle_containment applied to
    frames. Output (ref_a < ref_b, shared, a_total, b_total,
    containment_a_bp, containment_b_bp), all-integer.

    Scale: distinct (video, hash) first — re-encoded stills collapse —
    then an equi-join on dhash longs; hashes appearing in more than
    `max_hash_bucket` videos (black frames, test cards) are dropped
    from candidate generation only, the documented hot-cap trade.

    Container-agnostic: any (ref, long-fingerprint) table works via
    `hash_col` — operators/audiodup.py reuses it over audio
    constellation fingerprints."""
    # persist: the distinct (ref, hash) table feeds the size rollup, the
    # hot-hash build and both join sides — uncached, each evaluation
    # re-ran the upstream media DECODE (JPEG frames / audio FFT).
    # Bounded at one row per distinct (video, hash): the sketch tier.
    sets = (frames.select(F.col(ref_col).alias("ref"),
                          F.col(hash_col).alias("dhash"))
            .distinct().persist())
    sizes = sets.groupBy("ref").agg(F.count(F.lit(1)).alias("total"))
    if max_hash_bucket is not None:
        hot = (sets.groupBy("dhash").count()
               .filter(F.col("count") > max_hash_bucket).select("dhash"))
        sets = sets.join(F.broadcast(hot), "dhash", "left_anti")
    a = sets.select(F.col("ref").alias("ra"), "dhash")
    b = sets.select(F.col("ref").alias("rb"), "dhash")
    shared = (
        a.join(b, "dhash")
        .filter(F.col("ra") < F.col("rb"))
        .groupBy("ra", "rb")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    sa = sizes.select(F.col("ref").alias("ra"), F.col("total").alias("a_total"))
    sb = sizes.select(F.col("ref").alias("rb"), F.col("total").alias("b_total"))
    return (
        shared.join(sa, "ra").join(sb, "rb")
        .select(
            F.col("ra").alias("ref_a"), F.col("rb").alias("ref_b"),
            "shared",
            F.col("a_total").cast("long").alias("a_total"),
            F.col("b_total").cast("long").alias("b_total"),
            # integer div, not floor(double /): exact past 2^53 like
            # shingle_containment / apportion_budget
            F.expr("(10000 * shared) div a_total").alias("containment_a_bp"),
            F.expr("(10000 * shared) div b_total").alias("containment_b_bp"),
        )
    )
