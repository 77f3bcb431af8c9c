"""Spark-native bucketed tables: shuffle-free co-located joins on hot keys.

The crawl loop's two hottest joins are keyed on ``url_hash`` (the fetch
join scheduled ⋈ documents, plans/crawl.py, and the seen anti-join,
operators/frontier.py).  At 10^10 frontier rows each of those is a full
shuffle of both sides per round unless the storage layout already
co-locates the key.  This module is the storage-layout half of that
design, expressed with Spark's own bucketing (``bucketBy``/
``saveAsTable``) rather than the engine's manifest-level bucket scheme
(sources/snapshot.py BucketedSnapshotTable, which exists for
partition-scoped UPSERTS):

* ``write_bucketed`` persists a DataFrame hash-bucketed (and per-file
  sorted) on a key into the session catalog.  Writing repartitions by the
  bucket key first so each bucket is ONE file — which is what lets the
  scan report sorted output and elide the SortMergeJoin's per-side Sort.
* two tables bucketed on the same key with the same bucket count join
  with NO Exchange on either side: Catalyst plans the SortMergeJoin
  directly over the bucketed scans (asserted in tests/test_bucketed.py).

At 100 TB the production spelling is the Iceberg partition transform
``bucket(N, url_hash)`` on frontier + documents plus storage-partitioned
joins; this module demonstrates the identical plan property with the
built-in file-source bucketing available in the sandbox.  The win is the
whole point of bucketing: the per-round fetch join stops paying
2×table-scan-shuffle and becomes a zip of aligned buckets.

Reference context: the reference's UrlStorage co-locates by domain in a
process-local HashMap (/root/reference/src/storage.rs:64-89); bucketed
tables are the distributed analog of "the data for one key range lives
in one place".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table bucketed on ``key``.

    Repartitions to ``n_buckets`` by the key first so every bucket lands
    in exactly one file per table — the one-file-per-bucket layout is
    what makes the bucketed scan's sort order usable by a downstream
    SortMergeJoin (multi-file buckets force a re-Sort, though still no
    Exchange).
    """
    w = (
        df.repartition(n_buckets, key)
        .write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, key)
    )
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-key same-bucket-count tables from the catalog.

    The DataFrame is an ordinary join — the exchange-free property comes
    from the tables' bucketed layout, not from this function.  Callers
    that need the plan property guaranteed should assert it the way
    tests/test_bucketed.py does (no ``Exchange`` below the join).
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)
