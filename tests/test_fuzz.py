"""Seeded fuzz parity: the JVM column expressions must agree with their
pure-Python spec oracles over thousands of structured-random inputs in the
crawl-plausible URL grammar (random case, ports incl. defaults, paths,
queries, fragments, schemeless, userinfo-free authorities), not just the
hand-written goldens. One Spark job per property — the corpus is batched
into a single DataFrame."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from smartcrawler_spark import oracle as O
from smartcrawler_spark.functions import urls as U

SEED = 20260816


def _gen_urls(n: int) -> list[str]:
    rng = random.Random(SEED)
    schemes = ["http", "https", "HTTP", "Https"]
    hosts = ["Example.COM", "a.b.example.com", "xn--bcher-kva.de", "localhost",
             "site-7.example.com", "EXAMPLE.org"]
    ports = ["", ":80", ":443", ":8080", ":1"]
    paths = ["", "/", "/a", "/a/b/c", "/a%20b", "/index.html", "/A/B",
             "/trailing/", "/.well-known/x", "/a//b"]
    queries = ["", "?q=1", "?a=b&c=d", "?empty", "?x=%2F"]
    frags = ["", "#top", "#a/b"]
    out = []
    for _ in range(n):
        s = rng.choice(schemes)
        h = rng.choice(hosts)
        p = rng.choice(ports)
        path = rng.choice(paths)
        q = rng.choice(queries)
        f = rng.choice(frags)
        u = f"{s}://{h}{p}{path}{q}{f}"
        if rng.random() < 0.15:  # schemeless variant (CLI-style input)
            u = f"{h}{p}{path}{q}{f}"
        out.append(u)
    return out


def test_fuzz_canonicalize_matches_python_oracle(spark):
    urls = _gen_urls(2000)
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    rows = df.select(
        "u",
        U.canonicalize_url(F.col("u")).alias("jvm"),
        U.canonicalize_url_udf(F.col("u")).alias("py"),
    ).collect()
    bad = [(r["u"], r["jvm"], r["py"]) for r in rows if r["jvm"] != r["py"]]
    assert not bad, bad[:5]


def test_fuzz_canonicalize_idempotent(spark):
    urls = _gen_urls(2000)
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    canon = U.canonicalize_url(F.col("u"))
    rows = df.select(
        canon.alias("c1"), U.canonicalize_url(canon).alias("c2")
    ).collect()
    bad = [(r["c1"], r["c2"]) for r in rows if r["c1"] != r["c2"]]
    assert not bad, bad[:5]


def test_fuzz_is_root_and_host_match_oracle(spark):
    urls = _gen_urls(1500)
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    rows = df.select(
        "u",
        U.canonicalize_url(F.col("u")).alias("c"),
        U.url_host(U.canonicalize_url(F.col("u"))).alias("h"),
        U.is_root_url(U.canonicalize_url(F.col("u"))).alias("r"),
    ).collect()
    for r in rows:
        assert r["h"] == O.host_of(r["c"]), (r["u"], r["h"], O.host_of(r["c"]))
        assert r["r"] == O.is_root(r["c"]), (r["u"], r["c"])


def test_fuzz_resolve_href_matches_oracle(spark):
    rng = random.Random(SEED + 1)
    hrefs = []
    for _ in range(1000):
        kind = rng.random()
        if kind < 0.25:
            hrefs.append(f"https://other{rng.randrange(9)}.com/p{rng.randrange(99)}")
        elif kind < 0.45:
            hrefs.append(f"/abs/p{rng.randrange(99)}")
        elif kind < 0.55:
            hrefs.append(f"//proto-rel.com/p{rng.randrange(99)}")
        else:
            hrefs.append(f"rel/p{rng.randrange(99)}")
    base = "base.example.com"
    df = spark.createDataFrame([(h,) for h in hrefs], "href string")
    rows = df.select(
        "href", U.resolve_href(F.col("href"), F.lit(base)).alias("abs")
    ).collect()
    for r in rows:
        assert r["abs"] == O.resolve_href(r["href"], base), r["href"]


def test_minhash_portable_unicode_and_edge_docs(spark):
    """Portable md5 minhash: UTF-8 edge docs hash identically in the Spark
    kernel and the python oracle (md5 over utf-8 bytes in both)."""
    from tests.test_dedup import _portable_minhash_pairs

    from smartcrawler_spark.operators import dedup as DD

    rows = [
        (0, ""), (1, "   "), (2, "one"), (3, "one"),
        (4, "bücher über straße"), (5, "bücher über straße"),
        (6, "日本語 テキスト の 文書 です"), (7, "日本語 テキスト の 文書 です"),
        (8, "mixed ascii und bücher text here today"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["a"], r["b"])
        for r in DD.minhash_lsh_pairs_portable(df, num_perm=8, band_rows=2).collect()
    }
    assert got == _portable_minhash_pairs(rows)
    assert {(2, 3), (4, 5), (6, 7)} <= got
