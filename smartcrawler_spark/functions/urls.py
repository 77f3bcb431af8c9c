"""URL canonicalization / predicates as Spark column expressions.

Reference semantics re-expressed (NOT ported):
* canonicalization       — Rust `Url::parse(u).to_string()` behavior for the
                           URL shapes the crawler sees: lowercase scheme+host,
                           strip default port, empty path -> '/'
                           (/root/reference/src/utils.rs:22-30, src/cli.rs:45-65)
* host extraction        — `Url::host_str()` (/root/reference/src/utils.rs:16-20)
* is_root_url            — path in {'','/'}, no query, no fragment
                           (/root/reference/src/utils.rs:32-43)
* resolve_href           — relative-link resolution, branch order preserved:
                           http(s) passthrough, then '/'-prefix (which also
                           captures protocol-relative '//x' — the reference
                           checks '/' BEFORE '//', /root/reference/src/html_parser.rs:249-259)
* same_domain            — host == base or host endswith '.'+base
                           (/root/reference/src/html_parser.rs:261-268)

Everything here is a pure Column expression → stays inside whole-stage
codegen on the JVM; no Python in the hot path. `canonicalize_url_udf` is an
Arrow-vectorized pandas UDF used only as the spec oracle in tests.

The frontier key is `url_hash = xxhash64(url_canon)` (64-bit). At 10^10 URLs
the birthday-collision expectation is ~2.7 pairs in 2^64 — the exact
anti-join keys on (url_hash, url_canon) so collisions cannot corrupt the
seen set; the hash exists to make shuffles/bucketing cheap (8-byte key).
"""

from __future__ import annotations

from urllib.parse import urlsplit

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_SCHEME_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://"


def with_default_scheme(url: Column) -> Column:
    """Prepend https:// when schemeless (reference CLI canonicalization)."""
    return F.when(url.rlike(_SCHEME_RE), url).otherwise(
        F.concat(F.lit("https://"), url)
    )


def canonicalize_url(url: Column) -> Column:
    """Canonical URL as a pure column expression (JVM, codegen-friendly).

    scheme -> lower; host -> lower; default port stripped; empty path -> '/'.
    Query/fragment preserved verbatim (the reference keeps them; is_root
    filters on them separately).
    """
    # After with_default_scheme, u ALWAYS matches ^[scheme]:// (a
    # non-matching input had https:// prepended), and the scheme charset
    # excludes ':' and '/', so the FIRST '://' terminates the scheme.
    # Every regexp_extract of the r5 form therefore collapses to
    # substring arithmetic — one regex (the scheme rlike inside
    # with_default_scheme) instead of seven per URL, same values (fuzz
    # parity vs the urllib twin + idempotency, tests/test_fuzz.py).
    # Each derived piece is _let-bound so the expression tree stays
    # LINEAR: the naive inline form re-references u/authority/rest many
    # times, and a composition like url_host(canonicalize_url(x))
    # multiplied that into a combinatorial tree (measured 6x slower on
    # the url_canonicalize gate query than this form).
    def _body(u: Column) -> Column:
        def with_pos(pos: Column) -> Column:
            scheme = F.lower(F.substring(u, F.lit(1), pos - 1))

            def with_tail(tail: Column) -> Column:
                def with_auth(authority: Column) -> Column:
                    host = F.lower(F.substring_index(authority, ":", 1))
                    last = F.substring_index(authority, ":", -1)
                    port_e = F.when(
                        authority.contains(":") & (last != "")
                        & (F.translate(last, "0123456789", "") == ""),
                        last,
                    ).otherwise("")

                    def with_port(port: Column) -> Column:
                        keep_port = (port != "") & ~(
                            ((scheme == "https") & (port == "443"))
                            | ((scheme == "http") & (port == "80"))
                        )
                        norm_auth = F.when(
                            keep_port, F.concat(host, F.lit(":"), port)
                        ).otherwise(host)

                        def with_rest(rest: Column) -> Column:
                            first_rest = F.substring(rest, F.lit(1), F.lit(1))
                            norm_rest = F.when(rest == "", F.lit("/")).otherwise(
                                # ensure a path component exists before '?'/'#'
                                F.when(first_rest.isin("?", "#"),
                                       F.concat(F.lit("/"), rest))
                                .otherwise(rest)
                            )
                            return F.concat(
                                scheme, F.lit("://"), norm_auth, norm_rest)

                        return _let(
                            F.substr(tail, F.length(authority) + 1), with_rest)

                    return _let(port_e, with_port)

                return _let(
                    F.substring_index(
                        F.substring_index(
                            F.substring_index(tail, "/", 1), "?", 1), "#", 1),
                    with_auth)

            return _let(F.substr(u, pos + 3), with_tail)

        return _let(F.instr(u, "://"), with_pos)

    return _let(with_default_scheme(url), _body)


def _let(val: Column, body) -> Column:
    """Expression-level let-binding: evaluate `val` once per row and
    reference it many times, via a single-element array transform (the
    lambda variable is a cheap slot reference, not a copy of the tree).
    Without it, composing these substring transcriptions — e.g.
    url_host(canonicalize_url(x)) — duplicates the inner expression per
    reference and the tree grows combinatorially (measured 6x on the
    url_canonicalize gate query); with it, composition is linear."""
    return F.element_at(F.transform(F.array(val), body), 1)


def url_host(url: Column) -> Column:
    """Host (lowercased) of an already-canonical URL.

    Direct column transcription of the python spec oracle
    (oracle.host_of): substring after the FIRST '://' (whole string if
    absent), cut at the first of /?#, then before the first ':'. The r5
    implementation called parse_url (a regex URI parse per row — ~3x
    the cost at 30M URLs/round) which agrees with the oracle on the
    crawl URL grammar; the transcription agrees BY CONSTRUCTION
    (tests/test_fuzz.py asserts oracle parity over the fuzz corpus).
    The input is let-bound: an arbitrarily large url expression is
    evaluated once per row however often the spec references it."""
    def _body(u: Column) -> Column:
        pos = F.instr(u, "://")
        rest = F.when(pos > 0, F.substr(u, pos + 3)).otherwise(u)
        auth = F.substring_index(
            F.substring_index(F.substring_index(rest, "/", 1), "?", 1), "#", 1)
        return F.lower(F.substring_index(auth, ":", 1))

    return _let(url, _body)


def url_path(url: Column) -> Column:
    return F.parse_url(url, F.lit("PATH"))


def url_query(url: Column) -> Column:
    return F.parse_url(url, F.lit("QUERY"))


def url_hash(url_canon: Column) -> Column:
    """64-bit frontier key (JVM xxhash64 over the canonical URL string)."""
    return F.xxhash64(url_canon)


def is_root_url(url_canon: Column) -> Column:
    """Reference is_root: path in {'', '/'}, no query, no fragment.

    Column transcription of the python spec oracle (oracle.is_root):
    with no '?' and no '#' anywhere, the path is everything from the
    first '/' after '://' — in {'', '/'} exactly when rest has no '/'
    at all or its first '/' is the final character. Replaces two
    parse_url regex parses per row (fuzz-parity-tested vs the oracle;
    null input stays null through the conjunction like the old expr)."""
    def _body(u: Column) -> Column:
        pos = F.instr(u, "://")
        rest = F.when(pos > 0, F.substr(u, pos + 3)).otherwise(u)
        slash = F.instr(rest, "/")
        return (
            ~u.contains("?")
            & ~u.contains("#")
            & ((slash == 0) | (slash == F.length(rest)))
        )

    return _let(url_canon, _body)


def root_url_for_host(host: Column) -> Column:
    """construct_root_url: host -> https://{host}/ (already canonical)."""
    return F.concat(F.lit("https://"), F.lower(host), F.lit("/"))


def resolve_href(href: Column, base_host: Column) -> Column:
    """Resolve an href against a base host — reference branch order.

    NOTE the reference checks startswith('/') before startswith('//'), so a
    protocol-relative href lands in the '/'-branch and becomes
    https://{base}//other.com/p. We preserve that exact behavior (its own
    test only asserts 'contains page4', /root/reference/src/html_parser.rs:368-385).
    """
    return (
        F.when(href.rlike(r"^https?://"), href)
        .when(href.startswith("/"), F.concat(F.lit("https://"), base_host, href))
        .otherwise(F.concat(F.lit("https://"), base_host, F.lit("/"), href))
    )


def same_domain(url: Column, base_host: Column) -> Column:
    h = url_host(url)
    return (h == base_host) | h.endswith(F.concat(F.lit("."), base_host))


# ---------------------------------------------------------------------------
# Arrow-vectorized spec oracle (tests only — the hot path is the column expr)
# ---------------------------------------------------------------------------

def _canon_one(u: str | None) -> str | None:
    if u is None:
        return None
    if "://" not in u.split("/", 1)[0] and not u.startswith(("http://", "https://")):
        # schemeless per reference CLI: prepend https://
        if "://" not in u:
            u = "https://" + u
    try:
        parts = urlsplit(u)
    except ValueError:
        return u
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    port = parts.port
    if port and not ((scheme == "https" and port == 443) or (scheme == "http" and port == 80)):
        host = f"{host}:{port}"
    path = parts.path or "/"
    out = f"{scheme}://{host}{path}"
    if parts.query:
        out += "?" + parts.query
    if parts.fragment:
        out += "#" + parts.fragment
    return out


from pyspark.sql.types import StringType  # noqa: E402


@pandas_udf(StringType())
def canonicalize_url_udf(urls: pd.Series) -> pd.Series:
    """Arrow-batched canonicalizer (urllib) — cross-check oracle for tests."""
    return urls.map(_canon_one)


def extract_seed_domain(raw: str) -> str:
    """Reference CLI domain validation (S1/P2,
    /root/reference/src/cli.rs:45-65): trim, default the scheme to https,
    parse, return the host. Raises ValueError on unparseable input."""
    trimmed = (raw or "").strip()
    url_str = trimmed if trimmed.startswith(("http://", "https://")) else f"https://{trimmed}"
    try:
        host = urlsplit(url_str).hostname
    except ValueError:
        host = None
    if not host:
        raise ValueError(f"Invalid domain or URL: {raw}")
    return host


def seeds_from_links(links: list[str], expand_domains: bool = False) -> list[str]:
    """--links seeding (S8, reference lineage VIBE.md:529-556): start the
    crawl from an explicit URL list; with expand_domains=True also seed
    each link's domain root (the 'with domain expansion' variant).
    Deterministic order: canonical URL ascending, de-duplicated."""
    seeds: set[str] = set()
    for link in links:
        c = _canon_one(link if "://" in link else f"https://{link}")
        if not c:
            continue
        seeds.add(c)
        if expand_domains:
            host = extract_seed_domain(link)
            seeds.add(f"https://{host.lower()}/")
    return sorted(seeds)


# ---------------------------------------------------------------------------
# Spider-trap heuristics + tracking-param hygiene (crawl-frontier filters)
#
# Classic crawler-trap shapes (calendar pages, session-id explosions,
# self-linking cycles, faceted-search query spam) generate unbounded URL
# spaces under a single host; at a 10^10-URL frontier they crowd out real
# pages long before the politeness cap binds. Every predicate below is a
# pure Column expression over the CANONICAL url (JVM-side, engine-portable:
# regexp + split + array ops that exist identically in DuckDB for the
# oracle) — no UDFs, no shuffle; a map-only filter at any scale.
# ---------------------------------------------------------------------------

# query params that never change page content: analytics attribution
# (utm_*/gclid family), social share ids, and server session ids. Removing
# them BEFORE canonical dedup collapses the classic n-variants-of-one-page
# trap at the cheapest possible point (one regexp on the 1-column dedup
# shuffle input).
_TRACKING_PARAM_RE = (
    r"&(?:utm_[a-zA-Z0-9_]*|fbclid|gclid|dclid|msclkid|yclid|mc_eid|igshid|"
    r"phpsessid|jsessionid|sessionid|session_id|sid)=[^&]*"
)


def _url_base(url: Column) -> Column:
    return F.regexp_extract(url, r"^([^?#]*)", 1)


def _url_query_str(url: Column) -> Column:
    """Query string ('' when absent) — regexp form, not parse_url, so the
    DuckDB oracle mirrors it verbatim."""
    return F.regexp_extract(url, r"\?([^#]*)", 1)


def _url_fragment(url: Column) -> Column:
    return F.regexp_extract(url, r"(#.*)$", 1)


def strip_tracking_params(url: Column) -> Column:
    """Remove tracking/session query params (case-insensitive names),
    preserving the relative order of surviving params; '?' dropped when
    nothing survives, fragment preserved. Pure regexp surgery: prefix the
    query with '&' so every param (including the first) matches the same
    `&name=value` shape, strip, then restore '?'."""
    q = _url_query_str(url)
    stripped = F.regexp_replace(
        F.concat(F.lit("&"), q), "(?i)" + _TRACKING_PARAM_RE, ""
    )
    q2 = F.regexp_replace(stripped, r"^&", "")
    return F.concat(
        _url_base(url),
        F.when(q2 == "", F.lit("")).otherwise(F.concat(F.lit("?"), q2)),
        _url_fragment(url),
    )


def url_path_segments(url: Column) -> Column:
    """Non-empty path segments of a canonical URL as an array."""
    path = F.regexp_extract(url, _SCHEME_RE + r"[^/?#]*([^?#]*)", 1)
    return F.filter(F.split(path, "/"), lambda s: s != "")


def path_depth(url: Column) -> Column:
    return F.size(url_path_segments(url))


def dup_segment_count(url: Column) -> Column:
    """How many path segments are repeats of an earlier segment —
    /a/b/a/b/a has 3. Repetition ANYWHERE in the path (not just adjacent)
    catches mirror cycles (/en/about/en/about/...) that adjacent-only
    checks miss, while legitimate single reuse (/docs/api/docs.html is 0:
    distinct strings) stays clean."""
    segs = url_path_segments(url)
    return F.size(segs) - F.size(F.array_distinct(segs))


def numeric_segment_count(url: Column) -> Column:
    """All-digit path segments — calendar/pagination traps
    (/2026/08/17/2026/08/...) accumulate these without bound."""
    return F.size(
        F.filter(url_path_segments(url), lambda s: s.rlike("^[0-9]+$"))
    )


def query_param_count(url: Column) -> Column:
    q = _url_query_str(url)
    return F.when(q == "", F.lit(0)).otherwise(F.size(F.split(q, "&")))


def is_trap_url(
    url: Column,
    max_depth: int = 12,
    max_dup_segments: int = 2,
    max_numeric_segments: int = 4,
    max_query_params: int = 8,
    max_len: int = 512,
) -> Column:
    """True when any trap heuristic exceeds its bound. Thresholds are
    deliberately loose — a trap filter that rejects real pages is worse
    than one that admits a few trap pages (the per-host cap still bounds
    the damage); defaults follow common crawler practice (IRLbot's
    depth/length limits, Heritrix's pathological-path rules)."""
    return (
        (F.length(url) > max_len)
        | (path_depth(url) > max_depth)
        | (dup_segment_count(url) > max_dup_segments)
        | (numeric_segment_count(url) > max_numeric_segments)
        | (query_param_count(url) > max_query_params)
    )


def url_template(url_canon: Column) -> Column:
    """Collapse an already-canonical URL to its structural template: digit
    runs in the path/query become `{n}`, long hex runs (ids/hashes, >= 8
    chars) become `{hex}`. 'https://h/doc123?page=4' and
    'https://h/doc999?page=7' collapse to the same
    'https://h/doc{n}?page={n}' — the URL-space analog of the content
    template detector (R1-R6). GroupBy on it measures how many distinct
    pages each site pattern generates: crawl-budget facets, trap
    detection (one template exploding into 10^6 URLs), and stratified
    sampling keys. Pure JVM regexp chain."""
    t = F.regexp_replace(url_canon, r"[0-9a-f]{8,}", "{hex}")
    return F.regexp_replace(t, r"[0-9]+", "{n}")


def url_template_stats(df: DataFrame, url_col: str = "url_canon") -> DataFrame:
    """Per-template URL-space profile: (template, n_urls, n_hosts). One
    hash agg; the n_urls >> n_hosts explosion is the classic spider-trap
    / faceted-navigation signature at corpus scale."""
    return (
        df.select(
            url_template(F.col(url_col)).alias("template"),
            url_host(F.col(url_col)).alias("_h"),
        )
        .groupBy("template")
        .agg(F.count("*").alias("n_urls"),
             F.countDistinct("_h").alias("n_hosts"))
    )
