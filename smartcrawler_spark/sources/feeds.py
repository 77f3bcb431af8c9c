"""RSS 2.0 / Atom feed ingestion — URL discovery beyond sitemaps.

Real crawlers watch feeds for the same reason they watch sitemaps: a
site's feed is a push-shaped list of its newest URLs with timestamps,
i.e. exactly the admission + freshness signal the frontier wants
(reference context: the reference seeds only from CLI domains/links,
/root/reference/src/cli.rs:11-65 — feeds are the discovery channel a
production deployment adds first).

Like the sitemap path (sources/robots_txt.py::sitemap_url_entries),
extraction is ALL JVM regex over the raw XML text — regexp_extract_all
blocks + per-element regexp_extract in a transform. No Python in the
row path, no XML library, whole-stage codegen end to end; malformed
documents yield zero rows instead of errors, which is the only sane
contract for fetched web content at 10^9 feeds.

Scale shape: one narrow projection + explode per feed document. No
shuffle at all until the consumer aggregates; entries inherit the
feed table's partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ITEM_RE = r"(?s)<item[\s>](.*?)</item>"
_ENTRY_RE = r"(?s)<entry[\s>](.*?)</entry>"
_RSS_LINK_RE = r"<link>\s*([^<\s][^<]*?)\s*</link>"
_ATOM_HREF_RE = r"<link[^>]*href\s*=\s*\"([^\"]+)\""
_PUBDATE_RE = r"<pubDate>\s*([^<][^<]*?)\s*</pubDate>"
_UPDATED_RE = r"<(?:updated|published)>\s*([^<\s][^<]*?)\s*</(?:updated|published)>"
_TITLE_RE = r"(?s)<title[^>]*>\s*(.*?)\s*</title>"


def feed_kind(xml: Column) -> Column:
    """'rss' for RSS 2.0 documents, 'atom' for Atom, 'unknown' else."""
    return (
        F.when(xml.contains("<rss"), F.lit("rss"))
        .when(xml.contains("<feed"), F.lit("atom"))
        .otherwise(F.lit("unknown"))
    )


def _entry_struct(block: Column, link_re: str, date_re: str):
    link = F.regexp_extract(block, link_re, 1)
    date = F.regexp_extract(block, date_re, 1)
    title = F.regexp_extract(block, _TITLE_RE, 1)
    return F.struct(
        link.alias("url"),
        F.when(date == "", None).otherwise(date).alias("published"),
        F.when(title == "", None).otherwise(title).alias("title"),
    )


def feed_entries(df: DataFrame, host_col: str = "host",
                 xml_col: str = "feed_xml") -> DataFrame:
    """(host, feed_xml) -> exploded (host, kind, url, published, title)
    rows. RSS items carry <link>text</link> + <pubDate>; Atom entries
    carry <link href="..."/> + <updated>/<published>. Entries without a
    resolvable URL are dropped (feeds in the wild omit links on
    non-article items)."""
    xml = F.col(xml_col)
    kind = feed_kind(xml)
    rss = F.transform(
        F.regexp_extract_all(xml, F.lit(_ITEM_RE), F.lit(1)),
        lambda b: _entry_struct(b, _RSS_LINK_RE, _PUBDATE_RE),
    )
    atom = F.transform(
        F.regexp_extract_all(xml, F.lit(_ENTRY_RE), F.lit(1)),
        lambda b: _entry_struct(b, _ATOM_HREF_RE, _UPDATED_RE),
    )
    empty = F.array().cast(
        "array<struct<url:string,published:string,title:string>>")
    entries = (
        F.when(kind == "rss", rss)
        .when(kind == "atom", atom)
        .otherwise(empty)
    )
    return (
        df.select(
            F.col(host_col).alias("host"),
            kind.alias("kind"),
            F.explode(entries).alias("e"),
        )
        .filter(F.col("e.url") != "")
        .select("host", "kind", "e.url", "e.published", "e.title")
    )


def feed_published_ts(published: Column) -> Column:
    """Parse the two date shapes feeds actually use — RFC 822 with
    4-digit years (RSS pubDate: 'Mon, 07 Aug 2026 12:00:00 GMT' /
    '+0000') and ISO 8601 (Atom updated: '2026-08-07T12:00:00Z') — to a
    timestamp; null when neither matches. try_to_timestamp keeps garbage
    dates from failing the job (ANSI mode)."""
    cleaned = F.trim(published)
    # RFC 822: drop the redundant weekday, normalize named UTC zones to a
    # numeric offset (Spark 3+ datetime patterns reject EEE/zzz combos)
    rfc = F.regexp_replace(
        F.regexp_replace(cleaned, r"^[A-Za-z]{3},\s*", ""),
        r"\s+(GMT|UTC?)$", " +0000")
    return F.coalesce(
        F.try_to_timestamp(rfc, F.lit("dd MMM yyyy HH:mm:ss Z")),
        F.try_to_timestamp(cleaned, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(cleaned, F.lit("yyyy-MM-dd")),
    )


def boost_score_with_freshness(cands: DataFrame, entries: DataFrame,
                               now_ts: str, half_life_days: float = 7.0,
                               weight: float = 1.0,
                               url_col: str = "url_canon") -> DataFrame:
    """Fold feed recency into the admission score: score += weight *
    2^(-age_days / half_life) for URLs some feed lists (unlisted URLs
    unchanged) — the feed analog of sitemap <priority> boosting
    (sources/robots_txt.py::boost_score_with_priority). `now_ts` is an
    explicit 'yyyy-MM-dd HH:mm:ss' string so reruns are deterministic
    (never wall-clock). Dim side is (url)-unique after max-aggregation
    -> broadcast."""
    age_days = (
        F.unix_timestamp(F.lit(now_ts))
        - F.unix_timestamp(feed_published_ts(F.col("published")))
    ) / F.lit(86400.0)
    fresh = (
        entries.select("url", age_days.alias("_age"))
        .filter(F.col("_age").isNotNull() & (F.col("_age") >= 0))
        .groupBy("url")
        .agg(F.min("_age").alias("_age"))
        .select(
            "url",
            F.pow(F.lit(2.0), -F.col("_age") / F.lit(float(half_life_days)))
            .alias("_fresh"),
        )
    )
    return (
        cands.join(F.broadcast(fresh),
                   cands[url_col] == fresh["url"], "left")
        .withColumn(
            "score",
            F.col("score")
            + F.lit(float(weight)) * F.coalesce("_fresh", F.lit(0.0)),
        )
        .drop("url", "_fresh")
    )
