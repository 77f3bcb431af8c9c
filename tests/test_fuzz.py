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


# ---------------------------------------------------------------------------
# fuzz: round-2 pipeline operators (text grammar with embedded PII/unicode)
# ---------------------------------------------------------------------------


def _py_words(text: str) -> list[str]:
    """ASCII-whitespace tokenizer — the cross-engine SPEC. Java regex \\s
    (Spark) and RE2 \\s (DuckDB) are ASCII-only, while python re's \\s is
    unicode-aware and would ALSO split on U+00A0 (NBSP). The engine treats
    NBSP as a word character; the fuzz corpus embeds one (the '\\xa0nb'
    word below) to pin that semantic — a naive python-\\s oracle diverges."""
    import re

    collapsed = re.sub(r"[ \t\n\r\f\v]+", " ", text.lower()).strip(" ")
    return [w for w in collapsed.split(" ") if w]


def _gen_texts(n: int) -> list[str]:
    rng = random.Random(SEED + 1)
    words = ["the", "café", "naïve", "WORD", "x" * 40, "a", "\xa0nb",
             "日本語", "tab\tsep", "mixUP", "1234", "e=mc2", "--", "p6"]
    pii = ["bob@ex.io", "x.y+z@mail.example.org", "10.0.0.1", "255.255.255.255",
           "555-123-4567", "555.000.9999", "not@", "1.2", "12-34-56"]
    out = []
    for _ in range(n):
        k = rng.randint(0, 12)
        toks = [rng.choice(words) for _ in range(k)]
        if rng.random() < 0.5:
            toks.insert(rng.randint(0, len(toks)), rng.choice(pii))
        sep = rng.choice([" ", "  ", "\n", " \t "])
        out.append(sep.join(toks))
    out += ["", " ", "\n\t", None]
    return out


def test_fuzz_redact_pii_idempotent_and_no_residual(spark):
    """redact(redact(x)) == redact(x), and no PII pattern survives a pass —
    checked with python re (same RE2-safe patterns) over the fuzz corpus."""
    import re

    from smartcrawler_spark.functions import textops as T

    texts = _gen_texts(400)
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, t string")
    once = T.redact_pii(F.col("t"))
    rows = df.select("i", once.alias("r1"), T.redact_pii(once).alias("r2")).collect()
    for r in rows:
        assert r["r1"] == r["r2"], r
        if r["r1"] is not None:
            for pat, _ in T.PII_PATTERNS:
                assert not re.search(pat, r["r1"]), (pat, r["r1"])


def test_fuzz_repetition_profile_bounds_and_oracle(spark):
    """0 <= fracs <= 1 and exact agreement with a python recount over the
    fuzz corpus (incl. empty/null/whitespace-only docs)."""
    import re

    from smartcrawler_spark.functions import textops as T

    texts = _gen_texts(300)
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = {r["doc_id"]: r for r in T.repetition_profile(df).collect()}
    for i, t in enumerate(texts):
        toks = _py_words(t or "")
        n = len(toks)
        r = got[i]
        assert r["n_words"] == n
        assert 0.0 <= r["dup_2gram_frac"] <= 1.0
        assert 0.0 <= r["top_word_frac"] <= 1.0
        if n >= 2:
            grams = [" ".join(toks[j:j+2]) for j in range(n - 1)]
            assert r["dup_2gram_frac"] == round(1.0 - len(set(grams)) / len(grams), 4)
            assert r["top_word_frac"] == round(max(toks.count(w) for w in set(toks)) / n, 4)


def test_fuzz_simhash_portable_unicode_parity(spark):
    """Portable simhash signatures on the unicode fuzz corpus equal the
    python md5 oracle bit-for-bit (utf-8 hashing in both engines)."""
    import hashlib
    import re

    from smartcrawler_spark.operators import dedup as DD

    texts = [t for t in _gen_texts(80) if t is not None]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    # signatures via the pair function's internals: recompute with bits=8 and
    # compare pair hamming against python signatures
    pairs = {(r["a"], r["b"]): r["hamming"]
             for r in DD.simhash_pairs_portable(df, bits=8, n_chunks=4,
                                                max_hamming=8).collect()}

    def sig(text):
        toks = _py_words(text)
        votes = [0] * 8
        for w in toks:
            for i in range(8):
                b = ord(hashlib.md5(f"{i}|{w}".encode()).hexdigest()[0]) % 2
                votes[i] += 1 if b == 1 else -1
        return sum(1 << i for i in range(8) if votes[i] > 0)

    sigs = {i: sig(t) for i, t in enumerate(texts)}
    for (a, b), ham in pairs.items():
        assert ham == bin(sigs[a] ^ sigs[b]).count("1"), (a, b)


def test_fuzz_http_entity_decode_never_raises_and_inverts():
    """Seeded fuzz over the WARC HTTP entity path: (a) random bytes in
    any header/body position never raise; (b) well-formed chunked+gzip
    framings of random bodies ALWAYS invert exactly."""
    import gzip
    import random as _r

    from smartcrawler_spark.sources.warc import _dechunk, _split_http

    rng = _r.Random(SEED)
    for i in range(400):
        blob = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 200)))
        _split_http(blob)            # arbitrary garbage
        _dechunk(blob)               # arbitrary garbage
        # damage a VALID framing at one byte
        body = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 120)))
        sizes, pos = [], 0
        while pos < len(body):
            s = min(rng.randrange(1, 40), len(body) - pos)
            sizes.append(s)
            pos += s
        framed = b"".join(f"{s:x}".encode() + b"\r\n"
                          + body[sum(sizes[:j]):sum(sizes[:j]) + s] + b"\r\n"
                          for j, s in enumerate(sizes)) + b"0\r\n\r\n"
        assert _dechunk(framed) == body, i
        cut = rng.randrange(len(framed))
        out = _dechunk(framed[:cut] + b"\x00" + framed[cut + 1:])
        assert out is None or isinstance(out, bytes)  # never raises
        # full stack: chunked gzip response must invert
        comp = gzip.compress(body, mtime=0)
        blk = (b"HTTP/1.1 200 OK\r\nContent-Type: x\r\n"
               b"Transfer-Encoding: chunked\r\nContent-Encoding: gzip\r\n\r\n"
               + f"{len(comp):x}\r\n".encode() + comp + b"\r\n0\r\n\r\n")
        status, _, payload, _xr = _split_http(blk)
        assert (status, payload) == (200, body), i


def test_fuzz_charset_decode_total_function():
    """decode_payload is TOTAL: any (bytes, content-type) pair yields a
    str and a known codec name, and utf-8 round-trips survive sniffing."""
    import codecs
    import random as _r

    from smartcrawler_spark.sources.charset import decode_payload

    rng = _r.Random(SEED)
    ctypes = [None, "", "text/html", "text/html; charset=utf-8",
              "charset==;;", "text/html; charset=\x00bad",
              "charset=" + "x" * 300]
    for i in range(500):
        payload = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 300)))
        t, e = decode_payload(payload, rng.choice(ctypes))
        assert isinstance(t, str)
        codecs.lookup(e)  # always a resolvable codec name
    # printable-utf8 bodies survive any lying header chain un-mangled
    for i in range(100):
        body = "".join(chr(rng.randrange(0x20, 0x2FA0)) for _ in range(50))
        t, e = decode_payload(body.encode("utf-8"))
        assert t == body, i


def test_fuzz_page_directives_never_raise_on_tag_soup():
    """page_directives over adversarial tag soup: total, and flags only
    ever COME FROM a robots meta actually present."""
    import random as _r

    from smartcrawler_spark.sources.html_ingest import page_directives

    rng = _r.Random(SEED)
    bits = ["<meta", ">", "name=robots", 'content="noindex"', "<a", "<<>",
            'rel="nofollow"', 'href="/x"', "</a>", "<link rel=canonical",
            'href="https://c/"', "\x00", "प्रेम", "<base", "&amp;", "=''",
            "<!--", "-->", "<script>", "</p></div>"]
    for i in range(300):
        soup = " ".join(rng.choice(bits) for _ in range(rng.randrange(0, 40)))
        d = page_directives(soup)
        assert set(d) == {"noindex", "nofollow", "canonical", "base_href",
                          "nofollow_hrefs"}
        if d["noindex"] or d["nofollow"]:
            assert "robots" in soup and "content=" in soup, (i, soup)
