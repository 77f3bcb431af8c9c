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
