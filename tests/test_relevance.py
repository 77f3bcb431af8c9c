"""Relevance scoring: Arrow UDF == JVM expression == pure-Python kernel,
occurrence (not distinct) semantics, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from smartcrawler_spark.functions.relevance import (
    relevance_score_expr,
    relevance_score_udf,
    score_url,
)

KW = {"news": 2.0, "item": 0.5, "q": 0.25}

URLS = [
    "https://a.com/news/item5?q=1",
    "https://a.com/NEWS/x",               # case-insensitive tokens
    "https://a.com/news/news/news",       # occurrences count each time
    "https://a.com/",                     # no tokens
    "https://a.com/item?item=item",       # same keyword in path+query
    "https://a.com/newsy",                # 'newsy' is one token, no match
]


def test_three_implementations_agree(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "u string")
    udf = relevance_score_udf(KW)
    rows = df.select(
        "u",
        udf(F.col("u")).alias("s_udf"),
        relevance_score_expr(F.col("u"), KW).alias("s_jvm"),
    ).collect()
    for r in rows:
        want = score_url(r["u"], KW)
        assert r["s_udf"] == want, r["u"]
        assert r["s_jvm"] == want, r["u"]


def test_occurrence_semantics():
    assert score_url("https://a.com/news/news/news", KW) == 6.0
    assert score_url("https://a.com/item?item=item", KW) == 1.5
    assert score_url("https://a.com/newsy", KW) == 0.0
    # host tokens never score (path+query only, per the lineage spec)
    assert score_url("https://news.example.com/", KW) == 0.0


# ---------------------------------------------------------------------------
# anchor-text relevance (keyword_hits_expr + operators.frontier.anchor_relevance)
# ---------------------------------------------------------------------------

from smartcrawler_spark.functions.relevance import keyword_hits_expr


def test_keyword_hits_expr_integer_occurrences(spark):
    kw = {"news": 2, "item": 1, "42": 5}
    cases = [
        ("Breaking News: news about NEWS", 6),
        ("item item item", 3),
        ("answer is 42!", 5),
        ("newsy items", 0),       # token boundaries: no substring credit
        ("", 0),
        (None, 0),                # null anchor text scores 0, not null
        ("News item 42", 8),
    ]
    df = spark.createDataFrame([(i, t) for i, (t, _) in enumerate(cases)],
                               "i int, t string")
    got = {r["i"]: r["h"] for r in df.select(
        "i", keyword_hits_expr(F.col("t"), kw).alias("h")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, cases[i]


def test_anchor_relevance_matches_hand_oracle(spark):
    kw = {"spark": 3, "docs": 1}

    def span(kind, text=None, media_ref=None, offset=0):
        return {"kind": kind, "text": text, "media_ref": media_ref,
                "offset": offset}

    rows = [
        # p1 links twice to /guide (relative + absolute-same-target), once
        # to an external absolute URL; media + text spans must be ignored
        {"doc_id": "https://a.com/p1", "host": "a.com", "spans": [
            span("text", text="hello"),
            span("a", text="Spark docs", media_ref="/guide"),
            span("a", text="the spark guide", media_ref="https://a.com/guide"),
            span("a", text="spark spark", media_ref="https://b.com/x"),
            span("media", media_ref="img.png"),
        ]},
        # p2: one more vote for /guide, one anchor with NULL text, one with
        # empty href (dropped)
        {"doc_id": "https://a.com/p2", "host": "a.com", "spans": [
            span("a", text="read the DOCS", media_ref="/guide"),
            span("a", text=None, media_ref="/empty-text"),
            span("a", text="spark", media_ref=""),
        ]},
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id string, host string, spans array<struct<"
        "kind:string,text:string,media_ref:string,offset:int>>")
    from smartcrawler_spark.operators.frontier import anchor_relevance

    got = {r["url_canon"]: (r["n_anchors"], r["n_referrers"],
                            r["anchor_score"])
           for r in anchor_relevance(docs, kw).collect()}
    assert got == {
        # /guide: p1 twice (3+1=4, 3), p2 once (1) -> 3 anchors, 2 refs, 8
        "https://a.com/guide": (3, 2, 8),
        "https://b.com/x": (1, 1, 6),
        "https://a.com/empty-text": (1, 1, 0),
    }
