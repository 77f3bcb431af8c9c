"""Template detection — exact reference semantics, Arrow-vectorized.

Re-specifies /root/reference/src/template_detection.rs:76-303 in Python:

* float pattern first (regex ``\\b\\d+\\.\\d+\\b``), then integer pattern
  (``\\b\\d+\\b``); for each regex, occurrences are tried IN ORDER and the
  first whose substitution yields a *valid* pattern wins (r.rs:143-203).
* integer variable naming by context window (r.rs:206-255): next word a time
  unit -> 'time'; next word a count descriptor -> 'count'; word two ahead ==
  'ago' -> 'time'; previous word in {page, item} -> 'count'; else value{i}.
  Float names are always value{i}.
* validity (r.rs:258-294): contains '{' and '}', >= 2 whitespace words, and
  at least one word (lowercased, stripped of non-alphabetic edges) in the
  time-unit / count-descriptor vocab or in {ago, per, of}.
* word-position reconstruction mirrors the reference exactly: cumulative
  ``len(word)+1`` over ``split_whitespace`` words — including its inexact
  behavior on runs of whitespace (content is pre-cleaned upstream anyway).

Exposed as plain Python (`detect_template`) for unit tests / the oracle,
and as an Arrow pandas UDF (`detect_template_udf`) for the engine. The UDF
is the sanctioned slow path: regex-try-each-occurrence with validation is
not expressible as a single JVM regexp_replace.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

TIME_UNITS = {
    u
    for base in ("second", "minute", "hour", "day", "week", "month", "year")
    for u in (base, base + "s")
}
COUNT_DESCRIPTORS = {
    u
    for base in ("comment", "reply", "like", "view", "share", "point", "upvote", "item")
    for u in (
        (base, base[:-1] + "ies") if base.endswith("y") else (base, base + "s")
    )
}
_EXTRA_INDICATORS = {"ago", "per", "of"}

NUMBER_RE = re.compile(r"\b\d+\b")
FLOAT_RE = re.compile(r"\b\d+\.\d+\b")
_EDGE_NONALPHA = re.compile(r"^[^a-zA-Z]+|[^a-zA-Z]+$")


def _clean_word(word: str) -> str:
    return _EDGE_NONALPHA.sub("", word.lower())


def _is_valid_pattern(pattern: str) -> bool:
    words = pattern.split()
    if "{" not in pattern or "}" not in pattern:
        return False
    if len(words) < 2:
        return False
    for word in words:
        cw = _clean_word(word)
        if cw in TIME_UNITS or cw in COUNT_DESCRIPTORS or cw in _EXTRA_INDICATORS:
            return True
    return False


def _variable_name(content: str, number_pos: int, index: int) -> str:
    words = content.split()
    current_pos = 0
    for word_idx, word in enumerate(words):
        if current_pos <= number_pos < current_pos + len(word):
            if word_idx + 1 < len(words):
                nxt = words[word_idx + 1].lower()
                if nxt in TIME_UNITS:
                    return "time"
                if nxt in COUNT_DESCRIPTORS:
                    return "count"
                if word_idx + 2 < len(words) and words[word_idx + 2].lower() == "ago":
                    return "time"
            if word_idx > 0:
                prev = words[word_idx - 1].lower()
                if prev in ("page", "item"):
                    return "count"
            break
        current_pos += len(word) + 1
    return f"value{index if index else ''}"


def detect_template(content: str | None) -> tuple[str, str, str] | None:
    """Return (pattern, var_name, var_type) or None — reference semantics."""
    if content is None:
        return None
    content = content.strip()
    if not content:
        return None

    for i, m in enumerate(FLOAT_RE.finditer(content)):
        var = f"value{i if i else ''}"
        candidate = content[: m.start()] + "{" + var + "}" + content[m.end():]
        if _is_valid_pattern(candidate):
            return candidate, var, "Float"

    for i, m in enumerate(NUMBER_RE.finditer(content)):
        var = _variable_name(content, m.start(), i)
        candidate = content[: m.start()] + "{" + var + "}" + content[m.end():]
        if _is_valid_pattern(candidate):
            return candidate, var, "Number"

    return None


def apply_template(content: str) -> str:
    """Pattern if detected else identity (r.rs:297-303)."""
    hit = detect_template(content)
    return hit[0] if hit else content


from pyspark.sql.types import StringType, StructField, StructType  # noqa: E402

TEMPLATE_STRUCT = StructType(
    [
        StructField("pattern", StringType()),
        StructField("var_name", StringType()),
        StructField("var_type", StringType()),
    ]
)


@pandas_udf(TEMPLATE_STRUCT)
def detect_template_udf(texts: pd.Series) -> pd.DataFrame:
    """Arrow-batched template detector. Null struct fields when no template."""
    out = {"pattern": [], "var_name": [], "var_type": []}
    for t in texts:
        hit = detect_template(t)
        if hit is None:
            out["pattern"].append(None)
            out["var_name"].append(None)
            out["var_type"].append(None)
        else:
            out["pattern"].append(hit[0])
            out["var_name"].append(hit[1])
            out["var_type"].append(hit[2])
    return pd.DataFrame(out)


def template_pattern(text: Column) -> Column:
    """Column: detected pattern or NULL."""
    return detect_template_udf(text)["pattern"]


def templated_text(text: Column) -> Column:
    """apply_template as a column: pattern if detected else the text."""
    return F.coalesce(template_pattern(text), text)
