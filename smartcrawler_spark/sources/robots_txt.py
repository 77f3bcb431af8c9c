"""Raw robots.txt / sitemap.xml ingestion.

The crawl engine gates on relational rule tables (`robots_rules(host,
disallow_prefix)`, `sitemaps(host, urls)`). These parsers produce those
tables from RAW fetched artifacts, completing the ingest path:

* robots.txt (reference: policy statement at README.md:112 — "respect
  robots.txt"; the checkout itself never parses it, so semantics here
  follow the de-facto standard subset we need for gating): group-based
  `User-agent:` sections, `Disallow:` prefixes, `#` comments, blank-line
  tolerance. Agent resolution picks the LONGEST matching agent token
  (exact product name beats `*`), matching RFC 9309's most-specific rule.
  Only Disallow is consumed (an empty Disallow value = allow-all, emits
  no rule), because the engine's gate is a prefix anti-join.
  Parsing is a vectorized Arrow pandas UDF: one robots.txt per host is
  control-plane-sized data (1 row/host), and the text is parsed inside
  Arrow batches — no per-row Python at the DataFrame API surface.

* sitemap.xml / sitemap-index.xml: `<loc>` extraction is pure JVM
  (`regexp_extract_all`) — urlset and sitemapindex both carry locations
  in `<loc>` elements, so one expression serves both; `sitemap_kind`
  distinguishes them for the fetch-recursion decision.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

# ---------------------------------------------------------------------------
# robots.txt
# ---------------------------------------------------------------------------


def _wildcard_prefix(value: str) -> str:
    """Reduce an RFC-9309 path pattern to the gate's prefix form.

    The engine's robots gate is a prefix anti-join, so patterns are made
    CONSERVATIVE (never under-block): '*' truncates the pattern (everything
    with the literal prefix before the wildcard is blocked — a superset of
    the rule) and a trailing '$' anchor is dropped (prefix-blocking a
    superset of the exact-match rule)."""
    if "*" in value:
        value = value.split("*", 1)[0]
    if value.endswith("$"):
        value = value[:-1]
    return value


def parse_robots_text(text: str, user_agent: str = "*") -> list[str]:
    """Pure-Python kernel (shared by the UDF and the pytest oracle).

    RFC 9309 semantics: agent matching picks the LONGEST agent token that
    is '*' or a case-insensitive substring of `user_agent` ('*' scores 0 so
    any specific match wins), and the Disallow rules of ALL groups whose
    best agent token ties that winning score are MERGED (the RFC treats
    multiple groups matching the same agent as one rule set). `Sitemap:` is
    a non-group record and does not split an agent-header run. Path
    wildcards are reduced to conservative prefixes (see _wildcard_prefix)."""
    if not text:
        return []
    groups: list[tuple[list[str], list[str]]] = []  # (agents, disallows)
    agents: list[str] = []
    disallows: list[str] = []
    in_group_body = False
    for raw_line in text.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if in_group_body:
                groups.append((agents, disallows))
                agents, disallows = [], []
                in_group_body = False
            agents.append(value.lower())
        elif key == "disallow":
            in_group_body = True
            if value:
                prefix = _wildcard_prefix(value)
                if prefix:
                    disallows.append(prefix)
        elif key in ("allow", "crawl-delay"):
            in_group_body = True  # body keys end the agent-header run
        # 'sitemap' (and unknown keys): non-group records — ignored for
        # group-boundary purposes per RFC 9309
    if agents or disallows:
        groups.append((agents, disallows))

    ua = user_agent.lower()

    def group_score(agent_tokens: list[str]) -> int | None:
        best = None
        for a in agent_tokens:
            if a == "*":
                score = 0
            elif a and a in ua:
                score = len(a)
            else:
                continue
            if best is None or score > best:
                best = score
        return best

    scored = [(group_score(agents), disallows) for agents, disallows in groups]
    winning = max((s for s, _ in scored if s is not None), default=None)
    if winning is None:
        return []
    merged: list[str] = []
    for s, disallows in scored:
        if s == winning:
            merged.extend(d for d in disallows if d not in merged)
    return merged


def robots_disallow_udf(user_agent: str = "*"):
    """Arrow pandas UDF: robots.txt text -> array<string> of Disallow
    prefixes for `user_agent`."""

    @pandas_udf(ArrayType(StringType()))
    def _parse(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: parse_robots_text(t, user_agent) if t else [])

    return _parse


def robots_rules_from_text(df: DataFrame, host_col: str = "host",
                           text_col: str = "robots_txt",
                           user_agent: str = "*") -> DataFrame:
    """(host, robots_txt) -> robots_rules(host, disallow_prefix) — the
    engine's gating table (operators.frontier.robots_gate input)."""
    return (
        df.select(
            F.col(host_col).alias("host"),
            F.explode(robots_disallow_udf(user_agent)(F.col(text_col))).alias(
                "disallow_prefix"
            ),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# sitemap.xml
# ---------------------------------------------------------------------------

_LOC_RE = r"<loc>\s*([^<\s][^<]*?)\s*</loc>"


def sitemap_locs(xml: Column) -> Column:
    """All <loc> values of a sitemap/sitemap-index document (JVM regex)."""
    return F.regexp_extract_all(xml, F.lit(_LOC_RE), F.lit(1))


def sitemap_kind(xml: Column) -> Column:
    """'index' for <sitemapindex> docs (locs are further sitemaps to fetch),
    'urlset' for leaf sitemaps, 'unknown' otherwise."""
    return (
        F.when(xml.contains("<sitemapindex"), F.lit("index"))
        .when(xml.contains("<urlset"), F.lit("urlset"))
        .otherwise(F.lit("unknown"))
    )


def sitemap_urls_from_xml(df: DataFrame, host_col: str = "host",
                          xml_col: str = "sitemap_xml") -> DataFrame:
    """(host, sitemap_xml) -> exploded (host, kind, url) rows; `kind='index'`
    rows are sitemap URLs to fetch recursively, `kind='urlset'` rows are
    crawl candidates feeding the seed/bootstrap path."""
    return df.select(
        F.col(host_col).alias("host"),
        sitemap_kind(F.col(xml_col)).alias("kind"),
        F.explode(sitemap_locs(F.col(xml_col))).alias("url"),
    )
