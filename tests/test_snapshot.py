"""Snapshot substrate: fast-append and partition-scoped upsert must be
O(changed) in bytes written while reads reproduce the full table — the
parquet-manifest analog of Iceberg fast-append / MERGE INTO that keeps a
10^10-row frontier commit-able per round."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from smartcrawler_spark.sources.snapshot import BucketedSnapshotTable, SnapshotTable


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("url_hash"), F.concat(F.lit("u"), "id").alias("u")
    )


def _parquet_rows_under(path: str) -> int:
    """Count rows physically stored under a version's data dir."""
    import pyarrow.parquet as pq

    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.read_metadata(os.path.join(root, f)).num_rows
    return total


def test_append_writes_only_new_rows(spark, tmp_path):
    t = SnapshotTable(str(tmp_path), "log")
    t.commit(_rows(spark, 0, 100), meta={"round": 0})
    t.append(_rows(spark, 100, 110), meta={"round": 1})
    t.append(_rows(spark, 110, 112), meta={"round": 2})

    # read = full history
    assert t.read(spark).count() == 112
    assert t.latest_meta() == {"round": 2}

    # each append's OWN data dir holds only that round's rows (O(round) I/O)
    m = t.manifest()
    assert len(m["data_dirs"]) == 3
    assert _parquet_rows_under(m["data_dirs"][1]) == 10
    assert _parquet_rows_under(m["data_dirs"][2]) == 2

    # resume still sees older versions
    assert t.read(spark, version=2).count() == 110


def test_append_empty_df_is_noop_dir(spark, tmp_path):
    t = SnapshotTable(str(tmp_path), "log")
    t.append(_rows(spark, 0, 5))
    t.append(_rows(spark, 0, 0))  # empty round
    assert t.read(spark).count() == 5


def test_bucketed_upsert_rewrites_only_changed_buckets(spark, tmp_path):
    t = BucketedSnapshotTable(str(tmp_path), "frontier", n_buckets=8,
                              key_col="url_hash")
    t.commit_upsert(_rows(spark, 0, 800), changed_buckets=None, meta={"round": 0})
    m1 = t.manifest()
    assert set(m1["buckets"]) == {str(b) for b in range(8)}

    # round 1 changes buckets 2 and 5 only: new content = old rows of those
    # buckets with u rewritten, plus one inserted row per bucket
    bkt = t.bucket_expr()
    changed = [2, 5]
    old = t.read_buckets(spark, changed).withColumn("u", F.lit("updated"))
    ins = _rows(spark, 1000, 1002).filter(bkt.isin(changed))  # 1000%8=0... filter
    new_content = old.unionByName(ins)
    t.commit_upsert(new_content, changed_buckets=changed, meta={"round": 1})

    m2 = t.manifest()
    # unchanged buckets re-reference the PREVIOUS version's files verbatim
    for b in range(8):
        if b in changed:
            assert m2["buckets"][str(b)] != m1["buckets"][str(b)]
            assert "/v2/" in m2["buckets"][str(b)]
        else:
            assert m2["buckets"][str(b)] == m1["buckets"][str(b)]

    # v2's physical write is only the changed buckets' rows
    v2_dir = os.path.dirname(m2["buckets"]["2"])
    expected = 800 // 8 * len(changed) + ins.count()
    assert _parquet_rows_under(v2_dir) == expected

    # logical read is the merged table
    df = t.read(spark)
    assert df.count() == 800 + ins.count()
    assert df.filter((F.col("u") == "updated")).count() == 200

    # pruned read touches only the asked-for buckets
    pruned = t.read_buckets(spark, [2])
    assert pruned.select(bkt.alias("b")).distinct().collect()[0]["b"] == 2

    # time travel: v1 still reads the original content
    assert t.read(spark, version=1).filter(F.col("u") == "updated").count() == 0


def test_bucketed_upsert_can_empty_a_bucket(spark, tmp_path):
    t = BucketedSnapshotTable(str(tmp_path), "tbl", n_buckets=4, key_col="url_hash")
    t.commit_upsert(_rows(spark, 0, 40), changed_buckets=None)
    # rewrite bucket 1 to EMPTY (df has no rows for it)
    t.commit_upsert(_rows(spark, 0, 0), changed_buckets=[1])
    df = t.read(spark)
    assert df.count() == 30
    assert df.filter(t.bucket_expr() == 1).count() == 0


def test_bucketed_expire_keeps_referenced_dirs(spark, tmp_path):
    t = BucketedSnapshotTable(str(tmp_path), "tbl", n_buckets=4, key_col="url_hash")
    t.commit_upsert(_rows(spark, 0, 40), changed_buckets=None)     # v1
    t.commit_upsert(t.read_buckets(spark, [0]), changed_buckets=[0])  # v2
    t.commit_upsert(t.read_buckets(spark, [1]), changed_buckets=[1])  # v3
    t.expire_older_than(keep_last=1)  # keep v3 only
    # v3 references v1 dirs for buckets 2,3 — they must survive expiration
    assert t.read(spark).count() == 40
    assert t.versions() == [3]


def test_crawl_frontier_commits_are_incremental(spark, tmp_path):
    """End-to-end evidence for the O(changed) contract: in a real multi-round
    crawl, later frontier versions re-reference earlier versions' bucket
    files instead of rewriting the whole table (round-1 design rewrote 100%
    each round), and each crawl_log append stores only that round's rows."""
    from smartcrawler_spark.plans.crawl import CrawlJob, EngineConfig
    from smartcrawler_spark.sources.corpus import CorpusConfig, generate_corpus

    d = str(tmp_path / "c")
    m = generate_corpus(d, CorpusConfig())
    cfg = EngineConfig(keywords={"news": 2.0}, max_urls_per_host=10,
                       default_budget=2, frontier_buckets=64)
    job = CrawlJob(spark, d, str(tmp_path / "ck"), cfg, m["seeds"])
    job.run()

    mans = [job.t_frontier.manifest(v) for v in job.t_frontier.versions()]
    assert len(mans) >= 3
    last = mans[-1]
    own = sum(1 for p in last["buckets"].values()
              if f"/v{last['version']}/" in p)
    reused = len(last["buckets"]) - own
    # the final round must reuse file references for most buckets
    assert reused > own, (reused, own)

    # crawl_log: each version's dir holds ONLY its round's politeness-bounded
    # schedule, so total physical log bytes are O(sum of rounds), not O(n^2)
    log_m = job.t_log.manifest()
    total_logical = job.crawl_log().count()
    total_physical = sum(_parquet_rows_under(p) for p in log_m["data_dirs"])
    assert total_physical == total_logical


def test_append_table_compaction(spark, tmp_path):
    """Many appends -> many data dirs/files; compact() collapses the read
    path to one dir while contents stay identical and old readers' versions
    expire cleanly."""
    from smartcrawler_spark.sources.snapshot import SnapshotTable

    t = SnapshotTable(str(tmp_path), "log")
    for r in range(8):
        t.append(spark.createDataFrame([(r, f"row{r}")], "rnd int, s string"))
    before = {(r["rnd"], r["s"]) for r in t.read(spark).collect()}
    assert t.data_file_count() >= 8
    v = t.compact(spark, target_partitions=1)
    assert v == 9
    after = {(r["rnd"], r["s"]) for r in t.read(spark).collect()}
    assert after == before
    assert t.data_file_count() == 1
    assert t.versions() == [9]
    # appends keep working after compaction
    t.append(spark.createDataFrame([(99, "post")], "rnd int, s string"))
    assert {(r["rnd"], r["s"]) for r in t.read(spark).collect()} == before | {(99, "post")}


def test_bucketed_table_compaction(spark, tmp_path):
    """Upserts fragment buckets across version dirs; compact() rewrites all
    buckets into one version and reclaims superseded dirs."""
    import os

    from smartcrawler_spark.sources.snapshot import BucketedSnapshotTable

    t = BucketedSnapshotTable(str(tmp_path), "frontier", n_buckets=4, key_col="k")
    for r in range(5):
        rows = [(r * 10 + i, f"v{r}") for i in range(8)]
        t.commit_upsert(spark.createDataFrame(rows, "k long, s string"),
                        changed_buckets="written")
    before = {(r["k"], r["s"]) for r in t.read(spark).collect()}
    n_dirs_before = len(os.listdir(os.path.join(t.path, "data")))
    v = t.compact(spark)
    after = {(r["k"], r["s"]) for r in t.read(spark).collect()}
    assert after == before
    assert t.versions() == [v]
    assert len(os.listdir(os.path.join(t.path, "data"))) < n_dirs_before
    # upserts keep working after compaction
    t.commit_upsert(spark.createDataFrame([(0, "post")], "k long, s string"),
                    changed_buckets=[0])
    got = {(r["k"], r["s"]) for r in t.read(spark).collect()}
    assert (0, "post") in got
