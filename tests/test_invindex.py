"""Inverted-index semantics vs a pure-Python oracle on a hand-built corpus."""

from __future__ import annotations

from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from smartcrawler_spark.operators import invindex as IX

DOCS = [
    (0, "spark merge spark window"),
    (1, "merge spark merge merge"),
    (2, "window   spark\nmerge window"),
    (3, "solo"),
    (4, ""),
    (5, None),
]


def py_index(min_df=1, max_df=None):
    post = defaultdict(dict)
    for doc_id, text in DOCS:
        toks = (text or "").lower().split()
        for pos, t in enumerate(toks):
            post[t].setdefault(doc_id, []).append(pos)
    out = {}
    for term, by_doc in post.items():
        df = len(by_doc)
        if df < min_df or (max_df is not None and df > max_df):
            continue
        out[term] = {
            "doc_freq": df,
            "total_tf": sum(len(v) for v in by_doc.values()),
            "postings": [
                (d, len(v), sorted(v)) for d, v in sorted(by_doc.items())
            ],
        }
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def collect_index(df):
    return {
        r["term"]: {
            "doc_freq": r["doc_freq"],
            "total_tf": r["total_tf"],
            "postings": [
                (p["doc_id"], p["tf"], list(p["positions"]))
                for p in r["postings"]
            ],
        }
        for r in df.collect()
    }


def test_index_matches_python_oracle(spark, docs_df):
    got = collect_index(IX.inverted_index(docs_df))
    assert got == py_index()


def test_df_band_filters_terms(spark, docs_df):
    # min_df=3 keeps only terms in >=3 docs; max_df=1 keeps singletons
    assert set(collect_index(IX.inverted_index(docs_df, min_df=3))) == {
        t for t, v in py_index().items() if v["doc_freq"] >= 3
    }
    assert set(collect_index(IX.inverted_index(docs_df, max_df=1))) == {"solo"}


def test_conjunctive_docs(spark, docs_df):
    idx = IX.inverted_index(docs_df)
    got = {r["doc_id"] for r in IX.conjunctive_docs(idx, ["spark", "merge"]).collect()}
    want = {
        d for d, text in DOCS
        if {"spark", "merge"} <= set((text or "").split())
    }
    assert got == want == {0, 1, 2}
    # duplicate terms in the query must not change the required count
    got_dup = {
        r["doc_id"]
        for r in IX.conjunctive_docs(idx, ["spark", "spark", "merge"]).collect()
    }
    assert got_dup == want


def test_phrase_docs_adjacency(spark, docs_df):
    idx = IX.inverted_index(docs_df)
    got = {r["doc_id"] for r in IX.phrase_docs(idx, "spark", "merge").collect()}
    want = {
        d for d, text in DOCS
        if any(
            a == "spark" and b == "merge"
            for a, b in zip((text or "").split(), (text or "").split()[1:])
        )
    }
    assert got == want == {0, 1, 2}
    # and the reverse phrase is NOT in doc 0 ("spark merge spark window")
    rev = {r["doc_id"] for r in IX.phrase_docs(idx, "merge", "spark").collect()}
    assert rev == {0, 1}  # doc 2's merge is followed by window, not spark


def test_index_aggs_are_partial(spark, docs_df):
    """Both shuffles must carry map-side combine (HashAggregate partials) —
    no collect_list-only ObjectHashAggregate without a partial count stage
    would be visible as a missing partial_count."""
    plan = IX.inverted_index(docs_df)._sc._jvm.PythonSQLUtils.explainString(
        IX.inverted_index(docs_df)._jdf.queryExecution(), "formatted"
    )
    assert "partial_count" in plan or "partial count" in plan.lower()


def test_cooccurrence_matches_python_oracle(spark, docs_df):
    from itertools import combinations

    got = {
        (r["term_a"], r["term_b"]): r["n_docs"]
        for r in IX.cooccurrence_pairs(docs_df).collect()
    }
    want = Counter()
    for _, text in DOCS:
        for pa, pb in combinations(sorted(set((text or "").split())), 2):
            want[(pa, pb)] += 1
    assert got == dict(want)


def test_cooccurrence_max_df_drops_hot_terms(spark, docs_df):
    # 'spark' and 'merge' each appear in 3 docs, 'window' in 2, 'solo' in 1;
    # max_df=2 must remove every pair touching spark or merge
    got = {
        (r["term_a"], r["term_b"])
        for r in IX.cooccurrence_pairs(docs_df, max_df=2).collect()
    }
    assert got == set()  # window+solo never share a doc
    got3 = {
        (r["term_a"], r["term_b"]): r["n_docs"]
        for r in IX.cooccurrence_pairs(docs_df, max_df=3).collect()
    }
    assert all("solo" not in p and "window" in p or True for p in got3)
    assert ("merge", "spark") in got3 and got3[("merge", "spark")] == 3


def test_bm25_matches_numpy_oracle(spark, docs_df):
    import math

    idx = IX.inverted_index(docs_df)
    lens = IX.doc_lengths(docs_df)
    got = [(r["doc_id"], r["score"])
           for r in IX.bm25_topk(idx, lens, ["spark", "merge"], k=10).collect()]

    # oracle
    toks = {d: (t or "").split() for d, t in DOCS}
    N = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / N
    dfreq = {
        t: sum(1 for v in toks.values() if t in v)
        for t in {"spark", "merge"}
    }
    k1, b = 1.2, 0.75

    def score(d):
        s = 0.0
        for t in ("spark", "merge"):
            tf = toks[d].count(t)
            if not tf:
                continue
            idf = math.log(1 + (N - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(toks[d]) / avgdl))
        return s

    want = sorted(
        ((d, score(d)) for d in toks if score(d) > 0),
        key=lambda x: (-x[1], x[0]),
    )
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-9


def test_bm25_empty_query_and_unknown_terms(spark, docs_df):
    idx = IX.inverted_index(docs_df)
    lens = IX.doc_lengths(docs_df)
    assert IX.bm25_topk(idx, lens, ["nonexistent"], k=5).count() == 0
    assert IX.bm25_topk(idx, lens, [], k=5).count() == 0


def test_merge_index_equals_full_rebuild(spark):
    old = [(i, t) for i, t in DOCS[:3]]
    new = [(i, t) for i, t in DOCS[3:]]
    a = IX.inverted_index(spark.createDataFrame(old, "doc_id long, text string"))
    b = IX.inverted_index(spark.createDataFrame(new, "doc_id long, text string"))
    full = IX.inverted_index(spark.createDataFrame(DOCS, "doc_id long, text string"))
    assert collect_index(IX.merge_index(a, b)) == collect_index(full)


def test_search_job_end_to_end(spark, tmp_path, capsys, sf_dir):
    """jobs/run_search.py: build index from the sf corpus, answer and/
    phrase/bm25 queries through the real CLI main(); hits must equal the
    operators called directly."""
    import json
    import os
    import sys

    jobs = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "jobs")
    sys.path.insert(0, jobs)
    import run_search

    idx_dir = str(tmp_path / "idx")

    def run(argv):
        old = sys.argv
        sys.argv = ["run_search.py"] + argv
        try:
            assert run_search.main() == 0
        finally:
            sys.argv = old
        return json.loads([ln for ln in capsys.readouterr().out.splitlines()
                           if ln.startswith("{")][-1])

    built = run(["--corpus", sf_dir, "--index", idx_dir, "--build",
                 "--query", "spark merge", "--mode", "and"])
    assert built["terms"] > 0 and built["docs"] > 0

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = IX.inverted_index(docs)
    want_and = sorted(r["doc_id"] for r in
                      IX.conjunctive_docs(idx, ["spark", "merge"]).collect())
    assert built["hits"] == want_and

    ph = run(["--index", idx_dir, "--query", "spark merge",
              "--mode", "phrase"])
    want_ph = sorted(r["doc_id"] for r in
                     IX.phrase_docs(idx, "spark", "merge").collect())
    assert ph["hits"] == want_ph

    bm = run(["--index", idx_dir, "--query", "spark merge",
              "--mode", "bm25", "--k", "5"])
    lens = IX.doc_lengths(docs)
    want_bm = [r["doc_id"] for r in
               IX.bm25_topk(idx, lens, ["spark", "merge"], k=5).collect()]
    assert [h["doc_id"] for h in bm["hits"]] == want_bm
