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


def test_streaming_document_pipeline_matches_oracle(spark, tmp_path):
    """Two drops of raw docs through the streaming corpus ingestion: PII
    scrub + quality gate + decontamination + cross-run exact dedup must
    land exactly the docs a python oracle keeps, in O(batch) appends."""
    import datetime
    import re

    from smartcrawler_spark.sources.snapshot import SnapshotTable
    from smartcrawler_spark.streaming import pipeline_stream as PS

    drop = tmp_path / "drop"
    drop.mkdir()
    ckpt = str(tmp_path / "ckpt")
    corpus = SnapshotTable(str(tmp_path / "tables"), "corpus")
    t0 = datetime.datetime(2026, 8, 16, 12, 0, 0)

    eval_rows = [(900, "alpha beta gamma delta epsilon zeta")]
    eval_df = spark.createDataFrame(eval_rows, "doc_id long, text string")

    batch1 = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick  brown fox jumps over the lazy dog today"),  # dup of 1 after clean
        (3, "contact me at alice@example.com for more details soon"),
        (4, "too short"),                                           # quality-gated
        (5, "prefix alpha beta gamma delta epsilon zeta suffix"),   # contaminated
        (6, "spam spam spam spam spam spam spam spam spam spam"),   # repetition-gated
    ]
    batch2 = [
        (7, "the quick brown fox jumps over the lazy dog today"),   # cross-run dup of 1
        (8, "a genuinely new document with plenty of unique words"),
        (9, "contact me at alice@example.com for more details soon"),  # dup of 3 post-scrub
    ]

    def drop_batch(rows, name):
        df = spark.createDataFrame(
            [(i, t, t0) for i, t in rows],
            "doc_id long, text string, fetched_at timestamp",
        )
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / name))
        import shutil, glob, os
        for f in glob.glob(str(tmp_path / name / "*.parquet")):
            shutil.copy(f, str(drop / (name + os.path.basename(f))))

    drop_batch(batch1, "b1")
    PS.run_document_ingest(spark, str(drop), ckpt, corpus, eval_docs=eval_df)
    drop_batch(batch2, "b2")
    PS.run_document_ingest(spark, str(drop), ckpt, corpus, eval_docs=eval_df)

    got = {r["doc_id"]: r for r in corpus.read(spark).collect()}

    # python oracle over the same rules
    def scrub(t):
        t = re.sub(r"\s+", " ", t).strip()
        for pat, repl in [
            (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
            (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
            (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
        ]:
            t = re.sub(pat, repl, t)
        return t

    eval_grams = set()
    toks = eval_rows[0][1].split()
    for i in range(max(len(toks) - 5, 0) + 1):
        eval_grams.add(" ".join(toks[i : i + 5]))
    seen, want = set(), {}
    for i, t in batch1 + batch2:
        s = scrub(t).lower()
        toks = scrub(t).lower().split()
        grams5 = {" ".join(toks[j : j + 5]) for j in range(max(len(toks) - 5, 0) + 1)}
        grams2 = [" ".join(toks[j : j + 2]) for j in range(max(len(toks) - 1, 1))]
        dup2 = 1 - len(set(grams2)) / len(grams2) if len(toks) >= 2 else 0.0
        if len(toks) < 3 or dup2 > 0.8 or (grams5 & eval_grams) or s in seen:
            continue
        seen.add(s)
        want[i] = scrub(t)

    assert set(got) == set(want), (set(got), set(want))
    for i, text in want.items():
        assert got[i]["text"] == text
    assert "<EMAIL>" in got[3]["text"]
    # cross-run + in-batch dups collapsed to the first arrival
    assert 2 not in got and 7 not in got and 9 not in got


def test_checkpoint_dir_must_be_a_path(spark, tmp_path):
    """A non-path checkpoint_dir (e.g. a SnapshotTable passed in the wrong
    positional slot) must fail fast instead of silently writing a streaming
    checkpoint into a repr-named directory under the CWD."""
    from smartcrawler_spark.streaming import pipeline_stream as PS
    from smartcrawler_spark.streaming.frontier_stream import run_polite_schedule

    table = SnapshotTable(str(tmp_path / "t"), "frontier")
    robots = spark.createDataFrame([], "host string, disallow_prefix string")
    with pytest.raises(TypeError, match="checkpoint_dir"):
        run_frontier_ingest(spark, str(tmp_path / "d"), table, table, robots)
    with pytest.raises(TypeError, match="checkpoint_dir"):
        PS.run_document_ingest(spark, str(tmp_path / "d"), table, table)
    with pytest.raises(TypeError, match="checkpoint_dir"):
        run_polite_schedule(spark, str(tmp_path / "d"), table,
                            str(tmp_path / "out"), budgets={})
