"""Raw robots.txt / sitemap.xml ingestion parsers."""

from __future__ import annotations

from pyspark.sql import functions as F

from smartcrawler_spark.sources.robots_txt import (
    parse_robots_rules,
    parse_robots_text,
    robots_path_allowed,
    robots_rules_from_text,
    robots_rules_rfc_from_text,
    sitemap_urls_from_xml,
)

ROBOTS = """
# example robots file
User-agent: *
Disallow: /private
Disallow: /tmp/

User-agent: smartcrawler
User-agent: otherbot
Disallow: /only-for-named
Allow: /only-for-named/ok

User-agent: emptybot
Disallow:
"""


def test_parse_robots_star_group():
    assert parse_robots_text(ROBOTS, "randombot/1.0") == ["/private", "/tmp/"]


def test_parse_robots_specific_agent_beats_star():
    assert parse_robots_text(ROBOTS, "SmartCrawler/0.4") == ["/only-for-named"]
    # second agent alias of the same group resolves identically
    assert parse_robots_text(ROBOTS, "otherbot") == ["/only-for-named"]


def test_parse_robots_empty_disallow_is_allow_all():
    assert parse_robots_text(ROBOTS, "emptybot") == []


def test_parse_robots_edge_cases():
    assert parse_robots_text("", "*") == []
    assert parse_robots_text("Disallow: /orphan\n", "anybot") == []  # no group
    # comments + weird casing + CRLF
    txt = "USER-AGENT: *  # everyone\r\nDISALLOW: /x # comment\r\n"
    assert parse_robots_text(txt, "bot") == ["/x"]


def test_robots_rules_df_matches_kernel(spark):
    rows = [("a.com", ROBOTS), ("b.com", "User-agent: *\nDisallow: /q\n"),
            ("c.com", None)]
    df = spark.createDataFrame(rows, "host string, robots_txt string")
    got = {
        (r["host"], r["disallow_prefix"])
        for r in robots_rules_from_text(df, user_agent="smartcrawler").collect()
    }
    want = set()
    for h, t in rows:
        for p in parse_robots_text(t or "", "smartcrawler"):
            want.add((h, p))
    assert got == want and ("b.com", "/q") in got


SITEMAP = """<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc> https://a.com/page1 </loc><lastmod>2024-01-01</lastmod></url>
  <url><loc>https://a.com/page2</loc></url>
</urlset>"""

SITEMAP_INDEX = """<sitemapindex>
  <sitemap><loc>https://a.com/sitemap-news.xml</loc></sitemap>
  <sitemap><loc>https://a.com/sitemap-archive.xml</loc></sitemap>
</sitemapindex>"""


def test_sitemap_urlset_and_index(spark):
    df = spark.createDataFrame(
        [("a.com", SITEMAP), ("a.com", SITEMAP_INDEX), ("b.com", "<garbage/>")],
        "host string, sitemap_xml string",
    )
    got = {(r["kind"], r["url"]) for r in sitemap_urls_from_xml(df).collect()}
    assert got == {
        ("urlset", "https://a.com/page1"),
        ("urlset", "https://a.com/page2"),
        ("index", "https://a.com/sitemap-news.xml"),
        ("index", "https://a.com/sitemap-archive.xml"),
    }


# --- RFC 9309 group-merge / non-group-record / wildcard semantics ----------

def test_parse_robots_merges_tied_groups():
    """Two groups matching the same agent at the same score MERGE their
    Disallow rules (RFC 9309 treats them as one rule set)."""
    txt = """
User-agent: *
Disallow: /a

User-agent: *
Disallow: /b
"""
    assert parse_robots_text(txt, "anybot") == ["/a", "/b"]


def test_parse_robots_merge_dedups_and_specific_still_wins():
    txt = """
User-agent: *
Disallow: /a
Disallow: /x

User-agent: smartcrawler
Disallow: /s1

User-agent: *
Disallow: /x

User-agent: smartcrawler
Disallow: /s2
"""
    # star groups merge (deduped), but the specific agent outranks them
    assert parse_robots_text(txt, "anybot") == ["/a", "/x"]
    assert parse_robots_text(txt, "smartcrawler/2.0") == ["/s1", "/s2"]


def test_parse_robots_sitemap_is_not_a_group_boundary():
    """A Sitemap: line between User-agent headers must not split the
    agent-header run (it's a non-group record per RFC 9309)."""
    txt = """
User-agent: a-bot
Sitemap: https://example.com/sitemap.xml
User-agent: b-bot
Disallow: /shared
"""
    # both agents belong to the SAME group and share the rule
    assert parse_robots_text(txt, "a-bot") == ["/shared"]
    assert parse_robots_text(txt, "b-bot") == ["/shared"]


def test_parse_robots_wildcards_become_conservative_prefixes():
    txt = """
User-agent: *
Disallow: /cgi/*/del
Disallow: /exact$
Disallow: *
"""
    # '*' truncates (over-block, never under-block); trailing '$' dropped;
    # a LEADING-wildcard pattern ('Disallow: *') truncates to empty, which
    # as a prefix would block NOTHING — it maps to '/' (block-all) so the
    # conservative contract holds
    assert parse_robots_text(txt, "anybot") == ["/cgi/", "/exact", "/"]


# ---------------------------------------------------------------------------
# RFC 9309 full allow/disallow longest-match (the non-conservative path)
# ---------------------------------------------------------------------------

RFC_TXT = """
User-agent: *
Disallow: /private/
Allow: /private/public.html
Disallow: *.pdf$
Allow: /a
Disallow: /a
Allow: /folder
Disallow: /folder/sub
"""


def test_rfc_rules_collect_allow_and_disallow():
    rules = parse_robots_rules(RFC_TXT)
    assert ("/private/public.html", True) in rules
    assert ("/private/", False) in rules
    assert ("*.pdf$", False) in rules


def test_rfc_longest_match_allow_carveout():
    rules = parse_robots_rules(RFC_TXT)
    # longer allow beats shorter disallow
    assert robots_path_allowed("/private/public.html", rules)
    assert not robots_path_allowed("/private/secret.html", rules)


def test_rfc_tie_goes_to_allow():
    rules = parse_robots_rules(RFC_TXT)
    # '/a' appears as BOTH allow and disallow with equal priority: RFC
    # 9309 2.2.2 -- the least restrictive (allow) rule wins the tie
    assert robots_path_allowed("/a", rules)
    assert robots_path_allowed("/abc", rules)


def test_rfc_wildcard_and_anchor():
    rules = parse_robots_rules(RFC_TXT)
    assert not robots_path_allowed("/files/doc.pdf", rules)  # *.pdf$
    assert robots_path_allowed("/files/doc.pdfx", rules)     # $ anchored
    # nested precedence: /folder allowed, /folder/sub disallowed (longer)
    assert robots_path_allowed("/folder/x", rules)
    assert not robots_path_allowed("/folder/sub/x", rules)


def test_rfc_no_match_is_allowed():
    assert robots_path_allowed("/anything", [])
    assert robots_path_allowed("/other", parse_robots_rules(RFC_TXT))


def test_hostile_wildcard_patterns_are_capped():
    """DoS guard: a fetched robots.txt is hostile input — a pattern like
    '/*a*a*a*...$' must not reach the per-row regex gate in a form that
    can backtrack superlinearly. Over-cap Disallow widens to its literal
    prefix (conservative: over-blocks); over-cap Allow is dropped
    (conservative: under-allows)."""
    from smartcrawler_spark.sources.robots_txt import (
        MAX_ROBOTS_WILDCARDS,
        sanitize_robots_pattern,
    )

    hostile = "/x" + "*a" * 40 + "$"
    txt = f"User-agent: *\nDisallow: {hostile}\nAllow: {hostile}\n"
    rules = parse_robots_rules(txt)
    assert rules == [("/x", False)]  # widened disallow kept, allow dropped
    # the widened rule over-blocks (prefix) and can never under-block
    assert not robots_path_allowed("/x" + "a" * 500, rules)
    assert robots_path_allowed("/y", rules)
    # in-cap patterns survive sanitation verbatim (modulo run-collapse)
    assert sanitize_robots_pattern("/a*b*c$", False) == "/a*b*c$"
    assert sanitize_robots_pattern("/a**b", False) == "/a*b"
    # 'p*' and 'p*$' both mean prefix p
    assert sanitize_robots_pattern("/p*", False) == "/p"
    assert sanitize_robots_pattern("/p*$", False) == "/p"
    assert sanitize_robots_pattern("/" + "*a" * MAX_ROBOTS_WILDCARDS, True) \
        == "/" + "*a" * MAX_ROBOTS_WILDCARDS


def test_rfc_regex_is_first_occurrence_linear():
    """The compiled pattern regex uses atomic first-occurrence groups —
    semantics must match plain greedy wildcard matching on tricky
    overlap cases, and an adversarial in-cap pattern must match in
    linear-ish time on a long path (would hang for minutes with plain
    .* chains)."""
    import re
    import time

    from smartcrawler_spark.sources.robots_txt import robots_pattern_regex

    cases = [
        ("/a*b*c", "/a-x-b-y-c", True),
        ("/a*b*c", "/a-c-b", False),
        ("/a*bb*c$", "/a-bb-bb-c", True),   # first 'bb' leaves room for c$
        ("/a*b$", "/a-b-b", True),           # $ anchors the LAST b
        ("/a*b$", "/a-b-x", False),
        ("*mid*", "/x/mid/y", True),
        ("/ab", "/abc", True),               # plain prefix
        ("/ab$", "/abc", False),
    ]
    for pat, path, want in cases:
        got = re.match(robots_pattern_regex(pat), path) is not None
        assert got == want, (pat, path)
    # worst in-cap adversary: 5 stars, repeated-literal path
    rx = re.compile(robots_pattern_regex("/" + "*a" * 5 + "b$"))
    t0 = time.monotonic()
    assert rx.match("/" + "a" * 20000) is None
    assert time.monotonic() - t0 < 1.0


def test_rfc_gate_matches_python_kernel(spark):
    """The Spark robots_gate_rfc (broadcast + JVM regexp fold) must agree
    with the pure-Python RFC kernel on every candidate."""
    from smartcrawler_spark.operators.frontier import robots_gate_rfc

    rules = parse_robots_rules(RFC_TXT)
    paths = [
        "/private/x", "/private/public.html", "/doc.pdf", "/doc.pdfx",
        "/a", "/abc", "/b", "/folder/x", "/folder/sub/x", "/",
    ]
    rdf = robots_rules_rfc_from_text(
        spark.createDataFrame([("h.com", RFC_TXT)],
                              "host string, robots_txt string")
    )
    cands = spark.createDataFrame(
        [("h.com", f"https://h.com{p}") for p in paths]
        + [("unruled.com", "https://unruled.com/q")],
        "host string, url_canon string",
    )
    got = {r["url_canon"]: r["robots_blocked"]
           for r in robots_gate_rfc(cands, rdf).collect()}
    for p in paths:
        assert got[f"https://h.com{p}"] == (not robots_path_allowed(p, rules)), p
    assert got["https://unruled.com/q"] is False


# ---------------------------------------------------------------------------
# Crawl-delay + rich sitemap entries (lastmod/priority)
# ---------------------------------------------------------------------------

from smartcrawler_spark.sources.robots_txt import (  # noqa: E402
    boost_score_with_priority,
    budgets_from_crawl_delay,
    parse_robots_crawl_delay,
    robots_crawl_delays_from_text,
    sitemap_url_entries,
)

DELAY_TXT = """
User-agent: *
Crawl-delay: 2
Disallow: /x

User-agent: smartcrawler
Crawl-delay: 0.5

User-agent: *
Crawl-delay: 10
"""


def test_crawl_delay_group_resolution():
    # tying star groups merge; conservative max wins
    assert parse_robots_crawl_delay(DELAY_TXT, "anybot") == 10.0
    # specific agent outranks star
    assert parse_robots_crawl_delay(DELAY_TXT, "smartcrawler/1.0") == 0.5
    assert parse_robots_crawl_delay("", "x") is None
    assert parse_robots_crawl_delay("User-agent: *\nDisallow: /a\n", "x") is None
    # invalid / negative values ignored
    assert parse_robots_crawl_delay(
        "User-agent: *\nCrawl-delay: nope\n", "x") is None
    assert parse_robots_crawl_delay(
        "User-agent: *\nCrawl-delay: -5\n", "x") is None


def test_crawl_delay_df_and_budgets(spark):
    rows = [("a.com", DELAY_TXT), ("b.com", "User-agent: *\nDisallow: /\n"),
            ("c.com", "User-agent: *\nCrawl-delay: 1\n")]
    df = spark.createDataFrame(rows, "host string, robots_txt string")
    delays = {r["host"]: r["crawl_delay_s"]
              for r in robots_crawl_delays_from_text(df).collect()}
    assert delays == {"a.com": 10.0, "c.com": 1.0}  # b.com declares none
    budgets = {r["host"]: r["budget"] for r in budgets_from_crawl_delay(
        robots_crawl_delays_from_text(df), round_seconds=30,
        default_budget=20).collect()}
    # a.com: floor(30/10)=3; c.com: floor(30/1)=30 capped at 20
    assert budgets == {"a.com": 3, "c.com": 20}
    # a huge delay still yields the min budget of 1
    one = spark.createDataFrame([("d.com", 1e6)], "host string, crawl_delay_s double")
    assert budgets_from_crawl_delay(one, 30, 20).collect()[0]["budget"] == 1


SITEMAP_RICH = """<?xml version="1.0"?>
<urlset>
  <url>
    <loc> https://a.com/p1 </loc>
    <lastmod>2024-03-01</lastmod>
    <priority>0.9</priority>
  </url>
  <url><loc>https://a.com/p2</loc></url>
  <url><priority>0.3</priority><loc>https://a.com/p3</loc></url>
  <url><lastmod></lastmod><loc>https://a.com/p4</loc></url>
</urlset>"""


def test_sitemap_url_entries(spark):
    df = spark.createDataFrame([("a.com", SITEMAP_RICH)],
                               "host string, sitemap_xml string")
    got = {r["url"]: (r["lastmod"], r["priority"])
           for r in sitemap_url_entries(df).collect()}
    assert got == {
        "https://a.com/p1": ("2024-03-01", 0.9),
        "https://a.com/p2": (None, 0.5),   # spec default priority
        "https://a.com/p3": (None, 0.3),   # field order irrelevant
        "https://a.com/p4": (None, 0.5),   # empty lastmod -> null
    }


def test_boost_score_with_priority(spark):
    entries = sitemap_url_entries(spark.createDataFrame(
        [("a.com", SITEMAP_RICH)], "host string, sitemap_xml string"))
    cands = spark.createDataFrame(
        [("https://a.com/p1", 1.0), ("https://a.com/p2", 2.0),
         ("https://a.com/unlisted", 3.0)],
        "url_canon string, score double")
    got = {r["url_canon"]: r["score"]
           for r in boost_score_with_priority(cands, entries, weight=2.0).collect()}
    assert got == {"https://a.com/p1": 1.0 + 2.0 * 0.9,
                   "https://a.com/p2": 2.0 + 2.0 * 0.5,
                   "https://a.com/unlisted": 3.0}


# ---------------------------------------------------------------------------
# RSS / Atom feeds
# ---------------------------------------------------------------------------


_RSS = """<?xml version="1.0"?>
<rss version="2.0"><channel>
  <title>Example News</title>
  <link>https://news.example.com/</link>
  <item>
    <title>First article</title>
    <link> https://news.example.com/a1 </link>
    <pubDate>Mon, 10 Aug 2026 12:00:00 GMT</pubDate>
  </item>
  <item>
    <title>Second &amp; last</title>
    <link>https://news.example.com/a2</link>
    <pubDate>Tue, 11 Aug 2026 09:30:00 +0000</pubDate>
  </item>
  <item><title>no link, dropped</title></item>
</channel></rss>"""

_ATOM = """<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom">
  <title>Example Blog</title>
  <link href="https://blog.example.com/"/>
  <entry>
    <title>Post one</title>
    <link rel="alternate" href="https://blog.example.com/p1"/>
    <updated>2026-08-09T08:00:00Z</updated>
  </entry>
  <entry>
    <title>Post two</title>
    <link href="https://blog.example.com/p2"/>
    <published>2026-08-12T23:59:59+02:00</published>
  </entry>
</feed>"""


def test_feed_entries_rss_and_atom(spark):
    from smartcrawler_spark.sources.feeds import feed_entries

    df = spark.createDataFrame(
        [("news.example.com", _RSS), ("blog.example.com", _ATOM),
         ("junk.example.com", "<html>not a feed</html>"),
         ("empty.example.com", "<rss version=\"2.0\"><channel/></rss>")],
        "host string, feed_xml string")
    rows = {(r["host"], r["url"]): (r["kind"], r["published"], r["title"])
            for r in feed_entries(df).collect()}
    assert rows == {
        ("news.example.com", "https://news.example.com/a1"):
            ("rss", "Mon, 10 Aug 2026 12:00:00 GMT", "First article"),
        ("news.example.com", "https://news.example.com/a2"):
            ("rss", "Tue, 11 Aug 2026 09:30:00 +0000", "Second &amp; last"),
        ("blog.example.com", "https://blog.example.com/p1"):
            ("atom", "2026-08-09T08:00:00Z", "Post one"),
        ("blog.example.com", "https://blog.example.com/p2"):
            ("atom", "2026-08-12T23:59:59+02:00", "Post two"),
    }


def test_feed_published_ts_parses_both_families(spark):
    from smartcrawler_spark.sources.feeds import feed_published_ts
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("Mon, 10 Aug 2026 12:00:00 GMT",), ("2026-08-09T08:00:00Z",),
         ("2026-08-12T23:59:59+02:00",), ("not a date",), ("",)],
        "published string")
    got = [r["ts"] for r in df.select(
        F.date_format(feed_published_ts(F.col("published")),
                      "yyyy-MM-dd HH:mm:ss").alias("ts")).collect()]
    assert got[0] == "2026-08-10 12:00:00"
    assert got[1] == "2026-08-09 08:00:00"
    assert got[2] == "2026-08-12 21:59:59"  # normalized to session UTC
    assert got[3] is None and got[4] is None


def test_feed_freshness_boost_is_deterministic_and_bounded(spark):
    from smartcrawler_spark.sources.feeds import (
        boost_score_with_freshness, feed_entries)
    from pyspark.sql import functions as F

    feeds = spark.createDataFrame(
        [("news.example.com", _RSS), ("blog.example.com", _ATOM)],
        "host string, feed_xml string")
    entries = feed_entries(feeds)
    cands = spark.createDataFrame(
        [("https://news.example.com/a1", 1.0),   # published Aug 10
         ("https://blog.example.com/p1", 1.0),   # published Aug 9
         ("https://other.example.com/x", 1.0)],  # not in any feed
        "url_canon string, score double")
    out1 = {r["url_canon"]: r["score"] for r in boost_score_with_freshness(
        cands, entries, "2026-08-17 12:00:00").collect()}
    out2 = {r["url_canon"]: r["score"] for r in boost_score_with_freshness(
        cands, entries, "2026-08-17 12:00:00").collect()}
    assert out1 == out2  # explicit now_ts -> rerun-stable
    assert out1["https://other.example.com/x"] == 1.0
    # 7-day-old entry boosts by ~2^-1, fresher entries boost more
    assert 1.0 < out1["https://blog.example.com/p1"] \
        < out1["https://news.example.com/a1"] < 2.0
    a1 = out1["https://news.example.com/a1"] - 1.0
    assert abs(a1 - 2.0 ** (-7.0 / 7.0)) < 0.01


def test_sitemap_urls_from_robots(spark):
    from smartcrawler_spark.sources.robots_txt import sitemap_urls_from_robots

    txt = ("User-agent: *\r\n"
           "Disallow: /private\r\n"
           "Sitemap: https://a.com/sitemap.xml\r\n"   # CRLF: no trailing \r
           "  sitemap:https://a.com/s2.xml\n"         # lowercase, indented
           "SITEMAP  :  https://a.com/s3.xml\n"       # spaced key
           "Sitemap: ftp://a.com/nope.xml\n"          # non-http scheme out
           "NotSitemap: https://a.com/x.xml\n")       # other keys ignored
    df = spark.createDataFrame([("a.com", txt), ("b.com", "User-agent: *")],
                               "host string, robots_text string")
    got = sorted((r["host"], r["sitemap_url"])
                 for r in sitemap_urls_from_robots(df).collect())
    assert got == [("a.com", "https://a.com/s2.xml"),
                   ("a.com", "https://a.com/s3.xml"),
                   ("a.com", "https://a.com/sitemap.xml")]
