"""Structured Streaming frontier ingestion (stretch capability).

The reference is strictly sequential batch (SURVEY.md §2.9 — no streaming
operators exist there), and the batch round loop in plans.crawl is the
parity path. This module is the OPTIONAL streaming face of the same
operators: a continuous feed of discovered URLs (e.g. sitemap pings, link
extractions from a separate fetch fleet) flows through canonicalize ->
robots gate -> streaming dedup -> per-batch admission into the same
snapshot frontier, using

* `readStream` file source over a drop directory of parquet candidate
  batches,
* watermarked `dropDuplicates` on url_hash for in-stream dedup (state
  bounded by the watermark horizon),
* `foreachBatch` to run the EXACT batch admission pipeline (bloom prefilter
  + exact anti-join + cap) against the committed frontier snapshot — so the
  streaming path shares one implementation and one determinism contract
  with the batch path per micro-batch.

At scale this runs with a real checkpointLocation on durable storage; the
in-stream dropDuplicates only reduces state, the snapshot-backed exact
anti-join in foreachBatch remains the seen-set authority.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import frontier as FR
from ..sources.snapshot import SnapshotTable

CANDIDATE_SCHEMA = "url string, discovered_at timestamp"


def candidate_stream(spark: SparkSession, drop_dir: str,
                     watermark: str = "10 minutes") -> DataFrame:
    """Streaming candidates: file source -> canonical columns -> watermarked
    in-stream dedup on the 8-byte url_hash."""
    raw = (
        spark.readStream.schema(CANDIDATE_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(drop_dir)
    )
    cands = FR.with_url_columns(raw, "url", {})
    return cands.withWatermark("discovered_at", watermark).dropDuplicates(
        ["url_hash", "url_canon"]
    )


def run_frontier_ingest(
    spark: SparkSession,
    drop_dir: str,
    checkpoint_dir: str,
    frontier_table: SnapshotTable,
    robots: DataFrame,
    cap: int = 10_000,
    once: bool = True,
):
    """Start (and with once=True, run-to-drain) the streaming admission.

    Each micro-batch runs the batch admission operators against the current
    frontier snapshot and commits admitted rows — identical semantics to one
    plans.crawl admission step per micro-batch."""

    def admit_batch(batch: DataFrame, batch_id: int) -> None:
        from ..plans.crawl import FRONTIER_SCHEMA

        spark_b = batch.sparkSession
        frontier = frontier_table.read(spark_b)
        if frontier is None:
            frontier = spark_b.createDataFrame([], FRONTIER_SCHEMA)
        gated = FR.robots_gate(batch, robots)
        tagged = FR.tag_seen(gated, frontier)
        admitted = FR.admit_with_cap(tagged, frontier, cap).filter("admitted")
        new_rows = admitted.select(
            "url_canon", "url_hash", "host", "is_root", "score",
            F.lit("PENDING").alias("status"),
            F.lit(int(batch_id)).cast("int").alias("round_added"),
            F.lit(None).cast("int").alias("round_fetched"),
            F.lit(None).cast("string").alias("title"),
        )
        frontier_table.commit(
            frontier.unionByName(new_rows), meta={"stream_batch": batch_id}
        )

    writer = (
        candidate_stream(spark, drop_dir)
        .writeStream.foreachBatch(admit_batch)
        .option("checkpointLocation", f"{checkpoint_dir}/_stream_ckpt")
        .outputMode("update")
    )
    if once:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.trigger(processingTime="30 seconds").start()
