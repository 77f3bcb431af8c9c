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
        return urls.map(lambda u: score_url(u, kw) if u is not None else None)

    return _score


def relevance_score_expr(url: Column, keywords: dict[str, float]) -> Column:
    """JVM-only equivalent: tokenize with regexp_extract_all, weight via a
    literal map, sum with aggregate. Stays in whole-stage codegen."""
    if not keywords:
        return F.lit(0.0)
    path_query = F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*", "")
    tokens = F.regexp_extract_all(F.lower(path_query), F.lit("[a-z0-9]+"), F.lit(0))
    kw_map = F.create_map(
        *[x for k, w in sorted(keywords.items()) for x in (F.lit(k), F.lit(float(w)))]
    )
    weights = F.transform(tokens, lambda t: F.coalesce(kw_map[t], F.lit(0.0)))
    return F.aggregate(weights, F.lit(0.0), lambda acc, x: acc + x)
