"""URL canonicalization / predicate tests — ports of
/root/reference/src/utils.rs:45-110 and src/html_parser.rs:368-424."""

from __future__ import annotations

from pyspark.sql import functions as F

from smartcrawler_spark.functions.urls import (
    _canon_one,
    canonicalize_url,
    canonicalize_url_udf,
    is_root_url,
    resolve_href,
    root_url_for_host,
    same_domain,
    url_host,
)


def _eval(spark, col, rows, schema="u string"):
    df = spark.createDataFrame(rows, schema)
    return [r["out"] for r in df.select(col.alias("out")).collect()]


def test_canonicalize_matches_reference_normalization(spark):
    cases = {
        "example.com": "https://example.com/",
        "https://example.com": "https://example.com/",
        "https://example.com/": "https://example.com/",
        "HTTPS://Example.COM/Path": "https://example.com/Path",
        "https://example.com:443/x": "https://example.com/x",
        "http://example.com:80/x": "http://example.com/x",
        "http://example.com:8080/x": "http://example.com:8080/x",
        "https://news.ycombinator.com/": "https://news.ycombinator.com/",
        "https://example.com?q=1": "https://example.com/?q=1",
        "https://example.com/a?q=1#f": "https://example.com/a?q=1#f",
    }
    got = _eval(spark, canonicalize_url(F.col("u")), [(k,) for k in cases])
    for (inp, want), g in zip(cases.items(), got):
        assert g == want, f"{inp}: {g} != {want}"
    # the Arrow UDF oracle agrees with the JVM column expression
    got_udf = _eval(spark, canonicalize_url_udf(F.col("u")), [(k,) for k in cases])
    assert got == got_udf
    for inp, want in cases.items():
        assert _canon_one(inp) == want, inp


def test_construct_root_url(spark):
    got = _eval(
        spark,
        root_url_for_host(F.col("u")),
        [("example.com",), ("subdomain.example.com",)],
    )
    assert got == ["https://example.com/", "https://subdomain.example.com/"]


def test_is_root_url(spark):
    cases = {
        "https://example.com": True,
        "https://example.com/": True,
        "http://example.com": True,
        "http://example.com/": True,
        "https://example.com/path": False,
        "https://example.com/?query=value": False,
        "https://example.com/#fragment": False,
        "https://example.com/path?query=value": False,
    }
    got = _eval(spark, is_root_url(F.col("u")), [(k,) for k in cases])
    assert got == list(cases.values())


def test_domain_extraction(spark):
    cases = {
        "https://example.com/path": "example.com",
        "http://subdomain.example.com": "subdomain.example.com",
    }
    got = _eval(spark, url_host(F.col("u")), [(k,) for k in cases])
    assert got == list(cases.values())


def test_resolve_href_reference_branch_order(spark):
    rows = [("/page1",), ("https://example.com/page2",), ("//example.com/page4",), ("rel/x",)]
    got = _eval(
        spark,
        resolve_href(F.col("u"), F.lit("example.com")),
        rows,
    )
    assert got[0] == "https://example.com/page1"
    assert got[1] == "https://example.com/page2"
    # '/'-branch wins over '//' — reference behavior (html_parser.rs:249-259)
    assert got[2] == "https://example.com//example.com/page4"
    assert "page4" in got[2]
    assert got[3] == "https://example.com/rel/x"


def test_same_domain(spark):
    cases = {
        "https://example.com/page": True,
        "https://sub.example.com/page": True,
        "https://other.com/page": False,
        "https://notexample.com/page": False,
    }
    got = _eval(spark, same_domain(F.col("u"), F.lit("example.com")), [(k,) for k in cases])
    assert got == list(cases.values())
