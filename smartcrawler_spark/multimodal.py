"""Multimodal (image/audio/video) column plumbing.

Media assets travel as opaque `binary` columns with typed metadata structs;
decode / feature-extract / resize / frame-sample run as Arrow-batched
`mapInPandas` stages. The container has no imaging/audio libraries, so the
DECODE KERNELS are stubbed: `decoder="fake"` produces deterministic bytes
(seeded from the media_ref hash) with correct shapes so the Spark-side
plumbing — schema, batch iteration, partitioning, UDF signatures — is fully
real and tested; `decoder="real"` raises NotImplementedError at the exact
point a PIL/ffmpeg call would go.

Scale shape: media rows are heavy (MBs) — `mapInPandas` streams Arrow
batches (bounded by spark.sql.execution.arrow.maxRecordsPerBatch), and the
asset table is repartitioned by media_ref hash so one hot asset host can't
concentrate bytes on one task.
"""

from __future__ import annotations

from collections.abc import Iterator

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_ref string, media_type string, width int, height int, "
    "duration_ms int, n_bytes long"
)

FEATURE_SCHEMA = "media_ref string, media_type string, feature array<float>"

THUMB_SCHEMA = "media_ref string, thumb binary, thumb_w int, thumb_h int"

FRAME_SCHEMA = "media_ref string, frame_idx int, frame binary"


def _fake_bytes(media_ref: str, n: int) -> bytes:
    rng = np.random.default_rng(zlib.crc32(media_ref.encode()))
    return rng.integers(0, 256, n, dtype=np.uint8).tobytes()


def media_assets_from_spans(docs: DataFrame, decoder: str = "fake") -> DataFrame:
    """documents(spans) -> one row per media span with synthesized payload +
    metadata. The binary payload column is the real schema the pipeline
    carries at scale; `fake` fills it deterministically."""
    refs = (
        docs.select(F.explode(F.filter("spans", lambda s: s["kind"] == "media")).alias("s"))
        .select(F.col("s.media_ref").alias("media_ref"))
        .filter(F.col("media_ref") != "")
        .distinct()
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real media fetch/decode needs an imaging stack; "
                    "plug PIL/ffmpeg here"
                )
            rows = []
            for ref in pdf["media_ref"]:
                mtype = "image" if ref.endswith((".jpg", ".png")) else "video"
                w, h = 64 + (zlib.crc32(ref.encode()) % 8) * 16, 64
                n = w * h * 3 if mtype == "image" else 4096
                rows.append(
                    {
                        "media_ref": ref,
                        "media_type": mtype,
                        "payload": _fake_bytes(ref, n),
                        "width": w,
                        "height": h,
                        "duration_ms": 0 if mtype == "image" else 5000,
                        "n_bytes": n,
                    }
                )
            yield pd.DataFrame(rows, columns=[
                "media_ref", "media_type", "payload", "width", "height",
                "duration_ms", "n_bytes",
            ])

    schema = (
        "media_ref string, media_type string, payload binary, width int, "
        "height int, duration_ms int, n_bytes long"
    )
    # repartition by ref hash: spread heavy rows before the Python stage
    return refs.repartition(F.pmod(F.xxhash64("media_ref"), F.lit(32))).mapInPandas(
        gen, schema
    )


def extract_features(assets: DataFrame, dim: int = 16, decoder: str = "fake") -> DataFrame:
    """payload -> feature vector (the 'embed the image' stage). Fake kernel:
    per-asset deterministic histogram-ish reduction of the payload bytes —
    REAL byte-level work with the real signature, stand-in math."""

    def feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError("plug a vision/audio model here")
            feats = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=16)[:dim].astype(np.float32)
                norm = float(np.linalg.norm(hist)) or 1.0
                feats.append((hist / norm).tolist())
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_type": pdf["media_type"],
                    "feature": feats,
                }
            )

    return assets.mapInPandas(feat, FEATURE_SCHEMA)


def media_near_dup(docs: DataFrame, threshold: float = 0.98, dim: int = 16,
                   bits: int = 6, tables: int = 4,
                   decoder: str = "fake") -> DataFrame:
    """Multimodal near-dup composition: media spans -> assets -> feature
    vectors -> LSH-bucketed embedding-cosine pairs (a < b, sim >= threshold).
    The whole chain is the production shape — mapInPandas feature extraction
    into operators.similarity.embedding_near_dup_pairs (bucket self-join,
    exact cosine only inside collisions); only the decode kernel is fake."""
    from .operators.similarity import embedding_near_dup_pairs

    feats = extract_features(media_assets_from_spans(docs, decoder), dim=dim,
                             decoder=decoder)
    return embedding_near_dup_pairs(
        feats.withColumn("feature", F.col("feature").cast("array<double>")),
        threshold=threshold, dim=dim, bits=bits, tables=tables,
        vec_col="feature", id_col="media_ref",
    )


def resize_images(assets: DataFrame, max_side: int = 32, decoder: str = "fake") -> DataFrame:
    """Image thumbnailing stage (shape-preserving byte subsample as the fake
    kernel; PIL.Image.thumbnail in the real one)."""

    def thumb(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError("plug PIL here")
            rows = []
            for _, r in pdf.iterrows():
                if r["media_type"] != "image":
                    continue
                scale = max(1, max(r["width"], r["height"]) // max_side)
                arr = np.frombuffer(r["payload"], dtype=np.uint8)
                arr = arr.reshape(r["height"], r["width"], 3)[::scale, ::scale]
                th, tw = arr.shape[0], arr.shape[1]  # stride slicing ceils
                rows.append({"media_ref": r["media_ref"], "thumb": arr.tobytes(),
                             "thumb_w": tw, "thumb_h": th})
            yield pd.DataFrame(rows, columns=["media_ref", "thumb", "thumb_w", "thumb_h"])

    return assets.mapInPandas(thumb, THUMB_SCHEMA)


def sample_frames(assets: DataFrame, every_ms: int = 1000, decoder: str = "fake") -> DataFrame:
    """Video frame sampling stage (deterministic payload slices as the fake
    kernel; ffmpeg keyframe extraction in the real one)."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError("plug ffmpeg here")
            rows = []
            for _, r in pdf.iterrows():
                if r["media_type"] != "video":
                    continue
                n_frames = max(1, int(r["duration_ms"]) // every_ms)
                arr = np.frombuffer(r["payload"], dtype=np.uint8)
                step = max(1, len(arr) // n_frames)
                for i in range(n_frames):
                    rows.append({"media_ref": r["media_ref"], "frame_idx": i,
                                 "frame": arr[i * step:(i + 1) * step].tobytes()})
            yield pd.DataFrame(rows, columns=["media_ref", "frame_idx", "frame"])

    return assets.mapInPandas(frames, FRAME_SCHEMA)
