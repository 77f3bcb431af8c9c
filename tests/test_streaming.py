"""Structured Streaming frontier ingestion: drop candidate batches into a
directory, run to drain, assert the snapshot frontier admitted exactly the
robots-allowed, deduplicated set."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from smartcrawler_spark.sources.snapshot import SnapshotTable
from smartcrawler_spark.streaming.frontier_stream import run_frontier_ingest

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def test_streaming_ingest_dedup_and_robots(spark, tmp_path):
    drop = tmp_path / "drop"
    drop.mkdir()
    ckpt = tmp_path / "ckpt"
    table = SnapshotTable(str(ckpt), "frontier")

    urls1 = [
        ("https://a.example.com/x", T0),
        ("https://a.example.com/x", T0),            # in-batch duplicate
        ("https://A.example.com/x", T0),            # same after canonicalization
        ("https://a.example.com/private/p", T0),    # robots-blocked
        ("https://b.example.com/y", T0),
    ]
    spark.createDataFrame(urls1, "url string, discovered_at timestamp").write.parquet(
        str(drop / "batch1")
    )

    robots = spark.createDataFrame(
        [("a.example.com", "/private")], "host string, disallow_prefix string"
    )
    run_frontier_ingest(spark, f"{drop}/*", str(ckpt), table, robots, once=True)

    got = {r["url_canon"] for r in table.read(spark).collect()}
    assert got == {"https://a.example.com/x", "https://b.example.com/y"}

    # second drop: one already-seen URL + one new -> only the new admitted
    urls2 = [("https://a.example.com/x", T0), ("https://c.example.com/z", T0)]
    spark.createDataFrame(urls2, "url string, discovered_at timestamp").write.mode(
        "append"
    ).parquet(str(drop / "batch2"))
    run_frontier_ingest(spark, f"{drop}/*", str(ckpt), table, robots, once=True)

    got2 = {r["url_canon"] for r in table.read(spark).collect()}
    assert got2 == got | {"https://c.example.com/z"}
