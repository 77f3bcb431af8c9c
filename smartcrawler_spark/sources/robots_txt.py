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
    superset of the exact-match rule). A LEADING wildcard ('Disallow: *'
    or '*.pdf') truncates to the empty string, which as a prefix would
    block nothing — map it to '/' (block-all) so the contract holds."""
    if "*" in value:
        value = value.split("*", 1)[0]
    if value.endswith("$"):
        value = value[:-1]
    return value or "/"


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
# robots.txt — full RFC 9309 allow/disallow longest-match rules
# ---------------------------------------------------------------------------
#
# The prefix path above is the CONSERVATIVE subset (never under-blocks) the
# crawl loop's anti-join gate consumes. This section is the full-fidelity
# RFC 9309 §2.2.2 model: `Allow:` rules, `*`/`$` wildcards, and
# most-specific-match resolution (longest pattern wins; on a tie, allow
# wins) — how real sites carve exceptions like
#     Disallow: /private/
#     Allow: /private/public.html
# Reference policy statement: /root/reference/README.md:112 ("respect
# robots.txt"); the checkout itself never parses robots, so semantics here
# follow the RFC directly.


# Bounds on UNTRUSTED robots.txt patterns (a fetched robots.txt is hostile
# input): beyond these, Disallow rules widen to their conservative literal
# prefix (over-blocks, never under-blocks) and Allow rules are dropped
# (ditto). Enforced in parse_robots_rules via sanitize_robots_pattern.
MAX_ROBOTS_PATTERN_LEN = 256
MAX_ROBOTS_WILDCARDS = 5


def sanitize_robots_pattern(pattern: str, is_allow: bool) -> str | None:
    """Bound the per-row matching cost of an untrusted pattern before it
    reaches the JVM regexp gate: collapse '*' runs (semantic no-op), drop a
    trailing '*'/'*$' ('p*' and 'p*$' both just mean prefix p), then cap
    length and wildcard count — a hostile '/*a*a*a*...$' otherwise drives
    superlinear regex backtracking per candidate row (crawl-stalling DoS
    from fetched content). Over-cap Disallow patterns fall back to the
    literal prefix before the first '*' (conservative: blocks a superset);
    over-cap Allow patterns return None = rule dropped (conservative:
    allows a subset)."""
    import re as _re

    anchored = pattern.endswith("$")
    core = pattern[:-1] if anchored else pattern
    core = _re.sub(r"\*{2,}", "*", core)
    if core.endswith("*"):
        core, anchored = core[:-1], False
    if len(core) > MAX_ROBOTS_PATTERN_LEN or core.count("*") > MAX_ROBOTS_WILDCARDS:
        if is_allow:
            return None
        core, anchored = core.split("*", 1)[0], False
    return core + ("$" if anchored else "")


def robots_pattern_regex(pattern: str) -> str:
    """RFC 9309 path pattern -> anchored regex. '*' matches any char
    sequence; a trailing '$' anchors the end; everything else is literal.

    Each non-final '*'-gap compiles to an ATOMIC lazy group
    `(?>.*?lit)` — first-occurrence commit, the classic linear wildcard
    match (earliest placement of each middle literal is always optimal),
    so matching is O(path x segments) instead of the combinatorial
    backtracking plain `.*` chains allow. Atomic groups are supported by
    both consumers of this string: java.util.regex (the JVM
    `regexp_like` gate) and Python >= 3.11 `re` (the pytest oracle)."""
    import re as _re

    anchored = pattern.endswith("$")
    core = pattern[:-1] if anchored else pattern
    segs = core.split("*")
    body = _re.escape(segs[0])
    for i, seg in enumerate(segs[1:], start=1):
        last = i == len(segs) - 1
        if last and anchored:
            body += ".*" + _re.escape(seg)  # suffix check: linear scan
        elif last and not seg:
            pass  # trailing '*', unanchored: prefix match already implied
        else:
            body += "(?>.*?" + _re.escape(seg) + ")"
    return "^" + body + ("$" if anchored else "")


def parse_robots_rules(text: str, user_agent: str = "*"
                       ) -> list[tuple[str, bool]]:
    """Pure-Python kernel (shared by the UDF and the pytest oracle):
    robots.txt -> [(pattern, is_allow)] for `user_agent`, patterns kept
    VERBATIM (wildcards intact) for RFC matching.

    Group/agent resolution is identical to parse_robots_text (longest
    matching agent token wins, tying groups merge); unlike the prefix
    path, `Allow:` lines are collected as rules rather than only ending
    the agent-header run. Empty rule values (allow-all / disallow-nothing)
    emit no rule, per the RFC."""
    if not text:
        return []
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    agents: list[str] = []
    rules: list[tuple[str, bool]] = []
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
                groups.append((agents, rules))
                agents, rules = [], []
                in_group_body = False
            agents.append(value.lower())
        elif key in ("disallow", "allow"):
            in_group_body = True
            if value:
                rules.append((value, key == "allow"))
        elif key == "crawl-delay":
            in_group_body = True
        # 'sitemap' and unknown keys: non-group records per RFC 9309
    if agents or rules:
        groups.append((agents, rules))

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

    scored = [(group_score(agents), rules) for agents, rules in groups]
    winning = max((s for s, _ in scored if s is not None), default=None)
    if winning is None:
        return []
    merged: list[tuple[str, bool]] = []
    for s, grules in scored:
        if s == winning:
            merged.extend(r for r in grules if r not in merged)
    out: list[tuple[str, bool]] = []
    for p, a in merged:
        sp = sanitize_robots_pattern(p, a)  # DoS cap on hostile patterns
        if sp is not None and (sp, a) not in out:
            out.append((sp, a))
    return out


def robots_path_allowed(path: str, rules: list[tuple[str, bool]]) -> bool:
    """RFC 9309 §2.2.2 resolution (pure-Python kernel / pytest oracle):
    among matching rules the most specific (longest pattern, by octets)
    wins; on a priority tie, allow wins; no match => allowed."""
    import re as _re

    best: tuple[int, bool] | None = None
    for pattern, is_allow in rules:
        if _re.match(robots_pattern_regex(pattern), path or "/"):
            key = (len(pattern), is_allow)  # True > False => tie -> allow
            if best is None or key > best:
                best = key
    return best is None or best[1]


def robots_rules_rfc_from_text(df: DataFrame, host_col: str = "host",
                               text_col: str = "robots_txt",
                               user_agent: str = "*") -> DataFrame:
    """(host, robots_txt) -> robots_rules_rfc(host, pattern, regex,
    is_allow, priority) — the full-fidelity rule table consumed by
    operators.frontier.robots_gate_rfc. One row per rule; `regex` is the
    precompiled anchored form (JVM regexp_like probes it without Python),
    `priority` the RFC specificity (pattern octet length)."""

    @pandas_udf("array<struct<pattern:string,regex:string,is_allow:boolean,"
                "priority:int>>")
    def _parse(texts: pd.Series) -> pd.Series:
        def one(t):
            if not t:
                return []
            return [
                {"pattern": p, "regex": robots_pattern_regex(p),
                 "is_allow": a, "priority": len(p)}
                for p, a in parse_robots_rules(t, user_agent)
            ]

        return texts.map(one)

    return (
        df.select(
            F.col(host_col).alias("host"),
            F.explode(_parse(F.col(text_col))).alias("r"),
        )
        .select("host", "r.pattern", "r.regex", "r.is_allow", "r.priority")
        .distinct()
    )


def parse_robots_crawl_delay(text: str, user_agent: str = "*") -> float | None:
    """Crawl-delay (de-facto extension, honored by most engines): seconds
    between requests for `user_agent`'s group. Group/agent resolution is
    identical to parse_robots_text; when tying groups both carry a delay
    the LARGEST wins (conservative). None = no delay declared."""
    if not text:
        return None
    groups: list[tuple[list[str], list[float]]] = []
    agents: list[str] = []
    delays: list[float] = []
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
                groups.append((agents, delays))
                agents, delays = [], []
                in_group_body = False
            agents.append(value.lower())
        elif key == "crawl-delay":
            in_group_body = True
            try:
                d = float(value)
                if d >= 0:
                    delays.append(d)
            except ValueError:
                pass
        elif key in ("disallow", "allow"):
            in_group_body = True
    if agents or delays:
        groups.append((agents, delays))

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

    scored = [(group_score(agents), delays) for agents, delays in groups]
    winning = max((s for s, _ in scored if s is not None), default=None)
    if winning is None:
        return None
    merged = [d for s, delays in scored if s == winning for d in delays]
    return max(merged) if merged else None


def robots_crawl_delays_from_text(df: DataFrame, host_col: str = "host",
                                  text_col: str = "robots_txt",
                                  user_agent: str = "*") -> DataFrame:
    """(host, robots_txt) -> (host, crawl_delay_s) for hosts that declare
    one — feeds budgets_from_crawl_delay below."""

    @pandas_udf("double")
    def _delay(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: parse_robots_crawl_delay(t, user_agent) if t else None)

    return (
        df.select(F.col(host_col).alias("host"),
                  _delay(F.col(text_col)).alias("crawl_delay_s"))
        .filter(F.col("crawl_delay_s").isNotNull())
    )


def budgets_from_crawl_delay(delays: DataFrame, round_seconds: float,
                             default_budget: int,
                             min_budget: int = 1) -> DataFrame:
    """(host, crawl_delay_s) -> politeness budgets(host, budget): a host
    asking for `d` seconds between requests gets floor(round_seconds / d)
    fetches per round (at least min_budget, capped at default_budget so a
    tiny declared delay can't RAISE a host above policy). Pure column
    math — composes directly with operators.frontier.politeness_topk."""
    budget = F.greatest(
        F.least(
            F.floor(F.lit(float(round_seconds)) / F.col("crawl_delay_s")),
            F.lit(default_budget).cast("bigint"),
        ),
        F.lit(min_budget).cast("bigint"),
    )
    return delays.select("host", budget.cast("int").alias("budget"))


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


_URL_BLOCK_RE = r"(?s)<url>(.*?)</url>"
_LASTMOD_RE = r"<lastmod>\s*([^<\s][^<]*?)\s*</lastmod>"
_PRIORITY_RE = r"<priority>\s*([0-9.]+)\s*</priority>"


def sitemap_url_entries(df: DataFrame, host_col: str = "host",
                        xml_col: str = "sitemap_xml") -> DataFrame:
    """Rich urlset extraction: (host, url, lastmod, priority) per <url>
    block — the sitemap metadata real crawlers schedule with (<lastmod>
    feeds recrawl freshness, <priority> the admission score; the sitemaps
    spec defaults priority to 0.5 when absent). All JVM regex: blocks via
    dotall regexp_extract_all, fields via per-element regexp_extract in a
    transform — no Python, no XML library."""
    blocks = F.regexp_extract_all(
        F.col(xml_col), F.lit(_URL_BLOCK_RE), F.lit(1)
    )

    def entry(b):
        lastmod = F.regexp_extract(b, _LASTMOD_RE, 1)
        prio = F.regexp_extract(b, _PRIORITY_RE, 1)
        return F.struct(
            F.regexp_extract(b, _LOC_RE, 1).alias("url"),
            F.when(lastmod == "", None).otherwise(lastmod).alias("lastmod"),
            F.coalesce(
                F.when(prio == "", None).otherwise(prio).cast("double"),
                F.lit(0.5),  # spec default
            ).alias("priority"),
        )

    return (
        df.select(
            F.col(host_col).alias("host"),
            F.explode(F.transform(blocks, entry)).alias("e"),
        )
        .filter(F.col("e.url") != "")
        .select("host", "e.url", "e.lastmod", "e.priority")
    )


def boost_score_with_priority(cands: DataFrame, entries: DataFrame,
                              weight: float = 1.0,
                              url_col: str = "url_canon") -> DataFrame:
    """Fold sitemap <priority> into the admission score: score +=
    weight * priority for URLs the host's sitemap lists (unlisted URLs
    unchanged). Small dim side -> broadcast join; deterministic since
    entries are (host, url)-unique after the max-aggregation here."""
    prio = (
        entries.groupBy("url").agg(F.max("priority").alias("_prio"))
    )
    return (
        cands.join(F.broadcast(prio),
                   cands[url_col] == prio["url"], "left")
        .withColumn(
            "score",
            F.col("score") + F.lit(float(weight)) * F.coalesce("_prio", F.lit(0.0)),
        )
        .drop("url", "_prio")
    )


def sitemap_urls_from_robots(df: DataFrame, host_col: str = "host",
                             text_col: str = "robots_text") -> DataFrame:
    """Extract `Sitemap:` directive URLs from raw robots.txt — the
    standard sitemap DISCOVERY channel (robots.txt is fetched first;
    its Sitemap records, RFC 9309 §2.3 non-group lines, point at the
    urlsets `sitemap_urls_from_xml` then ingests). Case-insensitive key,
    any position in the file, tolerant of indentation and CRLF. Pure JVM
    regexp (one extract_all + explode, no UDF); one row per (host,
    sitemap_url)."""
    urls = F.regexp_extract_all(
        F.col(text_col),
        F.lit(r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*(\S+)"), F.lit(1))
    return (
        df.select(F.col(host_col).alias("host"), F.explode(urls).alias("sitemap_url"))
        .filter(F.col("sitemap_url").rlike(r"^https?://"))
    )
