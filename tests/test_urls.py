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


def test_trap_predicates_hand_oracle(spark):
    from smartcrawler_spark.functions import urls as U

    cases = [
        # url, depth, dup, numeric, params, trap
        ("https://h.com/d/42", 2, 0, 1, 0, False),
        ("https://h.com/", 0, 0, 0, 0, False),
        ("https://h.com/a/b/c/d/e/f/g/h/i/j/k/l/m", 13, 0, 0, 0, True),
        ("https://h.com/en/about/en/about/en/x", 6, 3, 0, 0, True),
        ("https://h.com/2026/08/17/2026/08/p", 6, 2, 5, 0, True),
        ("https://h.com/p?a=1&b=2&c=3&d=4&e=5&f=6&g=7&h=8&i=9", 1, 0, 0, 9, True),
        ("https://h.com/docs/api/docs.html", 3, 0, 0, 0, False),
        ("https://h.com/p?" + "x=1&" * 7 + "y=2", 1, 0, 0, 8, False),
    ]
    df = spark.createDataFrame([(u,) for u, *_ in cases], "url string")
    u = F.col("url")
    got = {
        r["url"]: (r["d"], r["dup"], r["num"], r["np"], r["trap"])
        for r in df.select(
            "url",
            U.path_depth(u).alias("d"),
            U.dup_segment_count(u).alias("dup"),
            U.numeric_segment_count(u).alias("num"),
            U.query_param_count(u).alias("np"),
            U.is_trap_url(u).alias("trap"),
        ).collect()
    }
    for url, d, dup, num, np_, trap in cases:
        assert got[url] == (d, dup, num, np_, trap), url
    # length bound: a clean shallow URL over 512 chars is still a trap
    long_url = "https://h.com/" + "x" * 520
    df2 = spark.createDataFrame([(long_url,)], "url string")
    assert df2.select(U.is_trap_url(F.col("url")).alias("t")).first()["t"]


def test_strip_tracking_params_edges(spark):
    from smartcrawler_spark.functions import urls as U

    cases = [
        # tracking param first: '?' moves to the first survivor
        ("https://h/p?utm_source=a&keep=1", "https://h/p?keep=1"),
        # all params tracking: '?' dropped entirely
        ("https://h/p?utm_a=1&gclid=2", "https://h/p"),
        # survivors keep relative order; fragment preserved
        ("https://h/p?a=1&fbclid=x&b=2#frag", "https://h/p?a=1&b=2#frag"),
        # case-insensitive param names
        ("https://h/p?UTM_Source=a&b=1", "https://h/p?b=1"),
        ("https://h/p?PHPSESSID=x", "https://h/p"),
        # no query: passthrough
        ("https://h/p", "https://h/p"),
        ("https://h/p#f", "https://h/p#f"),
        # utm-prefixed VALUE (not name) survives
        ("https://h/p?q=utm_source", "https://h/p?q=utm_source"),
    ]
    df = spark.createDataFrame([(a,) for a, _ in cases], "url string")
    got = {r["url"]: r["s"] for r in df.select(
        "url",
        U.strip_tracking_params(F.col("url")).alias("s")).collect()}
    for raw, want in cases:
        assert got[raw] == want, raw


def test_url_template_collapse(spark):
    from smartcrawler_spark.functions.urls import url_template

    cases = [
        ("https://h.com/doc123?page=4", "https://h.com/doc{n}?page={n}"),
        ("https://h.com/doc999?page=77", "https://h.com/doc{n}?page={n}"),
        ("https://h.com/item/deadbeef01", "https://h.com/item/{hex}"),
        # short hex-ish runs stay; digit runs inside still collapse
        ("https://h.com/cafe/42", "https://h.com/cafe/{n}"),
        ("https://h.com/", "https://h.com/"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [r["t"] for r in df.select(
        url_template(F.col("u")).alias("t")).collect()]
    assert got == [w for _, w in cases]


def test_url_template_stats_trap_signature(spark):
    from smartcrawler_spark.functions.urls import url_template_stats

    rows = [(f"https://h{i % 2}.com/p{i}",) for i in range(40)]
    rows += [("https://h0.com/about",)]
    df = spark.createDataFrame(rows, "url_canon string")
    got = {r["template"]: (r["n_urls"], r["n_hosts"])
           for r in url_template_stats(df).collect()}
    assert got["https://h{n}.com/p{n}"] == (40, 2)
    assert got["https://h{n}.com/about"] == (1, 1)
