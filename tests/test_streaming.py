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


def test_stateful_politeness_budget_across_batches_and_restart(spark, tmp_path):
    """applyInPandasWithState politeness: per-host budget is consumed across
    micro-batches AND across a restart from the same checkpoint (state store
    recovery) — the streaming-only semantics the batch window cannot give."""
    from smartcrawler_spark.streaming.frontier_stream import run_polite_schedule

    drop = tmp_path / "drop"
    drop.mkdir()
    ckpt = tmp_path / "ckpt"
    out = tmp_path / "out"

    def urls(host, lo, hi):
        return [(f"https://{host}/p{i:03d}", T0) for i in range(lo, hi)]

    # run 1: host a gets 5 candidates against budget 3 -> top 3 by url asc
    spark.createDataFrame(
        urls("a.example.com", 0, 5) + urls("b.example.com", 0, 2),
        "url string, discovered_at timestamp",
    ).write.parquet(str(drop / "b1"))
    run_polite_schedule(spark, f"{drop}/*", str(ckpt), str(out),
                        budgets={"a.example.com": 3}, default_budget=10)
    got1 = {
        (r["host"], r["url_canon"])
        for r in spark.read.parquet(str(out)).collect()
    }
    assert got1 == (
        {("a.example.com", f"https://a.example.com/p{i:03d}") for i in range(3)}
        | {("b.example.com", f"https://b.example.com/p{i:03d}") for i in range(2)}
    )

    # run 2 (fresh query, same checkpoint): budget already spent for a ->
    # nothing more admitted for a; b continues under its default budget
    spark.createDataFrame(
        urls("a.example.com", 5, 9) + urls("b.example.com", 2, 4),
        "url string, discovered_at timestamp",
    ).write.mode("append").parquet(str(drop / "b2"))
    run_polite_schedule(spark, f"{drop}/*", str(ckpt), str(out),
                        budgets={"a.example.com": 3}, default_budget=10)
    got2 = {
        (r["host"], r["url_canon"])
        for r in spark.read.parquet(str(out)).collect()
    }
    a_rows = {u for h, u in got2 if h == "a.example.com"}
    b_rows = {u for h, u in got2 if h == "b.example.com"}
    assert len(a_rows) == 3  # budget 3 enforced ACROSS batches via state
    assert b_rows == {f"https://b.example.com/p{i:03d}" for i in range(4)}
