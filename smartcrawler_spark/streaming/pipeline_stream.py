"""Structured Streaming training-data ingestion (stretch capability,
composing §2.11's pipeline operators on a continuous document feed).

A drop directory of raw-document parquet batches flows through

* `readStream` file source (bounded per-trigger),
* stateless enrichment — clean text, PII scrub, fingerprint, language ID,
  quality + repetition signals (all whole-stage-codegen column exprs),
* `dropDuplicatesWithinWatermark` on the 64-bit fingerprint for IN-STREAM
  exact dedup — the within-watermark variant is what actually lets the
  watermark evict dedup state (plain `dropDuplicates` without the event
  time in its keys keeps state forever),
* `foreachBatch`: quality gating, benchmark decontamination against a
  broadcast eval n-gram set, an exact anti-join against the committed
  corpus (the cross-run dedup authority, same pattern as the frontier's
  seen set), and an append-only snapshot commit.

The in-stream dropDuplicates only REDUCES state; the snapshot-backed
anti-join in foreachBatch is the correctness authority — identical to the
batch pipeline's semantics, one implementation shared.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import textops as T
from ..operators import dedup as DD
from ..sources.snapshot import SnapshotTable

DOC_STREAM_SCHEMA = "doc_id long, text string, fetched_at timestamp"


def document_stream(spark: SparkSession, drop_dir: str,
                    watermark: str = "10 minutes") -> DataFrame:
    """Streaming documents: file source -> enrichment columns -> in-stream
    exact dedup on the fingerprint, state evicted at the watermark horizon.
    """
    raw = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(drop_dir)
    )
    # every signal is computed over the SCRUBBED text — the bytes a training
    # run would actually see (aliasing inside one select would silently bind
    # F.col("text") to the raw input instead)
    scrubbed = T.redact_pii(T.clean_text(F.col("text")))
    q = T.quality_features(scrubbed)
    enriched = raw.select(
        "doc_id",
        "fetched_at",
        scrubbed.alias("text"),
        T.fingerprint64(scrubbed).alias("fingerprint"),
        T.detect_language(scrubbed).alias("lang"),
        q["n_words"].alias("n_words"),
        q["stopword_ratio"].alias("stopword_ratio"),
        T.dup_2gram_frac(scrubbed).alias("dup_2gram_frac"),
    )
    # dropDuplicatesWithinWatermark (not dropDuplicates): with the plain
    # variant, a dedup key set that excludes the event-time column is never
    # evicted by the watermark, so a continuous run grows state unboundedly.
    # The within-watermark variant drops per-key state once the key's last
    # event time falls behind the watermark — bounded state, and the
    # snapshot-backed anti-join in foreachBatch stays the cross-horizon
    # correctness authority.
    return enriched.withWatermark(
        "fetched_at", watermark
    ).dropDuplicatesWithinWatermark(["fingerprint"])


def run_document_ingest(
    spark: SparkSession,
    drop_dir: str,
    checkpoint_dir: str,
    corpus_table: SnapshotTable,
    eval_docs: DataFrame | None = None,
    min_words: int = 3,
    max_dup_2gram: float = 0.8,
    decontam_n: int = 5,
    once: bool = True,
):
    """Start (run-to-drain with once=True) the streaming corpus ingestion.

    Per micro-batch: quality gate -> decontamination (broadcast n-gram
    semi-join vs `eval_docs`) -> exact anti-join vs the committed corpus's
    fingerprints -> append-only snapshot commit (O(batch) bytes written).
    """
    if not isinstance(checkpoint_dir, (str, os.PathLike)):
        # guards the arg-order slip that once wrote a checkpoint into a
        # directory named after a SnapshotTable's repr in the CWD
        raise TypeError(
            f"checkpoint_dir must be a path, got {type(checkpoint_dir).__name__}"
        )
    stream = document_stream(spark, drop_dir)

    def sink(batch_df: DataFrame, _batch_id: int) -> None:
        kept = batch_df.filter(
            (F.col("n_words") >= min_words)
            & (F.col("dup_2gram_frac") <= max_dup_2gram)
        )
        if eval_docs is not None:
            marks = DD.mark_contaminated(kept, eval_docs, n=decontam_n)
            kept = kept.join(
                marks.filter(~F.col("contaminated")).select("doc_id"),
                "doc_id", "left_semi",
            )
        prev = corpus_table.read(spark)
        if prev is not None:
            kept = kept.join(
                prev.select("fingerprint").distinct(), "fingerprint", "left_anti"
            )
        # persist before the non-empty probe: a foreachBatch DataFrame
        # re-executes its whole plan per action, so without this the
        # enrichment chain (PII scrub + lang ID + repetition signals) plus
        # the decontamination and corpus anti-joins run TWICE whenever the
        # batch has output — once for the probe, once for the append (r6;
        # guide §5).
        out = kept.select(
            "doc_id", "text", "fingerprint", "lang",
            "n_words", "stopword_ratio", "dup_2gram_frac",
        ).persist()
        try:
            if out.limit(1).count() > 0:
                corpus_table.append(out)
        finally:
            out.unpersist()

    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if once:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return None
    return writer.start()
