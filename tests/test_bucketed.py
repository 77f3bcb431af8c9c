"""Bucketed-table co-location: the fetch-join storage layout at 100 TB.

Evidence for the claim in sources/bucketed.py — two tables bucketed on
url_hash with the same bucket count join with NO Exchange on either
side, while the identical non-bucketed join shuffles both sides."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from smartcrawler_spark.sources.bucketed import colocated_join, write_bucketed

N_BUCKETS = 8


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    """frontier-shaped and documents-shaped tables, both bucketed on the
    8-byte hash key the crawl loop joins on."""
    root = tmp_path_factory.mktemp("bucketed")
    frontier = spark.range(4000).select(
        F.col("id").alias("url_hash"),
        F.concat(F.lit("https://h"), F.pmod("id", F.lit(50)), F.lit(".com/p"), F.col("id")).alias("url_canon"),
    )
    docs = spark.range(0, 4000, 2).select(
        F.col("id").alias("url_hash"),
        F.concat(F.lit("<html>"), F.col("id"), F.lit("</html>")).alias("html"),
    )
    write_bucketed(frontier, "bt_frontier", "url_hash", N_BUCKETS,
                   path=str(root / "frontier"))
    write_bucketed(docs, "bt_docs", "url_hash", N_BUCKETS,
                   path=str(root / "docs"))
    yield "bt_frontier", "bt_docs"
    spark.sql("DROP TABLE IF EXISTS bt_frontier")
    spark.sql("DROP TABLE IF EXISTS bt_docs")


@pytest.fixture()
def no_broadcast(spark):
    """Force the SortMergeJoin path so the Exchange assertion is about
    bucketing, not about one side fitting under the broadcast threshold."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, bucketed_pair, no_broadcast):
    ft, dt = bucketed_pair
    joined = colocated_join(spark, ft, dt, "url_hash")
    plan = plan_of(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    # one file per bucket (write_bucketed repartitions first), so the
    # scan's sort order satisfies the join and no per-side Sort re-runs
    assert joined.count() == 2000


def test_bucketed_anti_join_has_no_exchange(spark, bucketed_pair, no_broadcast):
    """The seen anti-join shape (frontier is the seen set) co-locates the
    same way the inner fetch join does."""
    ft, dt = bucketed_pair
    anti = spark.table(dt).join(spark.table(ft), "url_hash", "left_anti")
    plan = plan_of(anti)
    assert "Exchange" not in plan, plan
    assert anti.count() == 0  # docs' hashes are a subset of frontier's


def test_unbucketed_control_shuffles(spark, bucketed_pair, no_broadcast):
    """Control: the same join over plain (non-bucketed) reads of the same
    data DOES plan an Exchange on both sides — the property tested above
    comes from the layout, not from the data size."""
    ft, dt = bucketed_pair
    left = spark.table(ft).select("url_hash", "url_canon")
    right = spark.table(dt).select("url_hash", "html")
    # strip the bucketing metadata by round-tripping through a local view
    plain_l = spark.createDataFrame(left.collect(), left.schema)
    plain_r = spark.createDataFrame(right.collect(), right.schema)
    plan = plan_of(plain_l.join(plain_r, "url_hash"))
    assert plan.count("Exchange") >= 2


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    """Aggregations keyed on the bucket key also skip the shuffle — the
    per-bucket partial IS the final aggregate."""
    ft, _ = bucketed_pair
    agg = spark.table(ft).groupBy("url_hash").agg(F.count("*").alias("n"))
    plan = plan_of(agg)
    assert "Exchange" not in plan, plan
    assert agg.count() == 4000
