"""Text cleaning (reference utils.rs:50-58 golden) + training-data text ops."""

from __future__ import annotations

from pyspark.sql import functions as F

from smartcrawler_spark.functions.textops import (
    clean_text,
    detect_language,
    fingerprint64,
    quality_score,
    token_count,
)


def test_clean_text_reference_goldens(spark):
    cases = {
        "  hello   world  ": "hello world",
        "line1\n  line2  \n\nline3": "line1 line2 line3",
        "": "",
        "   \n  \n  ": "",
    }
    df = spark.createDataFrame([(k,) for k in cases], "t string")
    got = [r["o"] for r in df.select(clean_text(F.col("t")).alias("o")).collect()]
    assert got == list(cases.values())


def test_token_count(spark):
    df = spark.createDataFrame([("Hello, world! x2",), ("",)], "t string")
    got = [r["o"] for r in df.select(token_count(F.col("t")).alias("o")).collect()]
    # Hello , world ! x 2  -> 6 tokens; empty -> 0
    assert got == [6, 0]


def test_detect_language_markers(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog is in of to",),
            ("der hund und die katze ist nicht",),
            ("xyzzy qwerty",),
        ],
        "t string",
    )
    got = [r["o"] for r in df.select(detect_language(F.col("t")).alias("o")).collect()]
    assert got == ["en", "de", "und"]


def test_quality_and_fingerprint_deterministic(spark):
    df = spark.createDataFrame(
        [("the quick brown fox and the lazy dog",), ("THE  quick brown fox and the lazy dog ",)],
        "t string",
    )
    rows = df.select(
        quality_score(F.col("t")).alias("q"), fingerprint64(F.col("t")).alias("fp")
    ).collect()
    assert 0.0 <= rows[0]["q"] <= 1.0
    # fingerprint is whitespace/case-insensitive → both rows identical
    assert rows[0]["fp"] == rows[1]["fp"]


def test_gopher_rules_bundle(spark):
    from smartcrawler_spark.functions.textops import gopher_rules

    good = ("the quick brown fox jumps over the lazy dog and then continues "
            "to run with great speed because that is what foxes have always "
            "done in stories of this kind where animals behave like people "
            "and the narrative keeps going until we have enough words to "
            "clear the fifty word floor set by the gopher rules paper")
    short = "too few words here"
    bullets = "\n".join(f"• item {i}" for i in range(10))
    ellipsed = "\n".join(f"line {i} trails off..." for i in range(10))
    symbolic = " ".join(["###"] * 60)
    df = spark.createDataFrame(
        [(0, good), (1, short), (2, bullets), (3, ellipsed), (4, symbolic)],
        "doc_id long, text string")
    g = gopher_rules(F.col("text"))
    out = {r["doc_id"]: r.asDict() for r in df.select(
        "doc_id", *[v.alias(k) for k, v in g.items()]).collect()}
    assert out[0]["gopher_pass"] is True
    assert out[0]["n_gopher_stopwords"] >= 2
    assert out[1]["gopher_pass"] is False          # word floor
    assert out[2]["bullet_frac"] == 1.0 and out[2]["gopher_pass"] is False
    assert out[3]["ellipsis_frac"] == 1.0 and out[3]["gopher_pass"] is False
    assert out[4]["symbol_ratio"] > 0.1 and out[4]["gopher_pass"] is False
    # python cross-check of the scalar signals on the good doc
    toks = good.lower().split()
    assert out[0]["n_words"] == len(toks)
    assert out[0]["mean_word_len"] == round(
        sum(len(t) for t in toks) / len(toks), 4)
    assert out[0]["alpha_word_frac"] == 1.0


def test_c4_line_filters(spark):
    from smartcrawler_spark.functions.textops import c4_line_filters

    text = "\n".join([
        "This line has plenty of words and ends properly.",
        "Another good line that survives the filters just fine!",
        'A third keeper line with a quoted ending here too."',
        "no terminal punctuation so this one is dropped",
        "Too short.",
        "This page uses javascript for everything, sadly.",
        "Some lorem ipsum filler text sits in this line.",
        "",
    ])
    df = spark.createDataFrame([(0, text), (1, "Short. {code}")],
                               "doc_id long, text string")
    c4 = c4_line_filters(F.col("text"))
    out = {r["doc_id"]: r.asDict() for r in df.select(
        "doc_id", *[v.alias(k) for k, v in c4.items()]).collect()}
    assert out[0]["n_lines"] == 7  # blank line excluded
    assert out[0]["n_lines_kept"] == 3
    assert out[0]["page_keep"] is True
    kept = out[0]["cleaned"].split("\n")
    assert len(kept) == 3 and all(k[-1] in '.!?"' for k in kept)
    assert "javascript" not in out[0]["cleaned"]
    assert "lorem" not in out[0]["cleaned"]
    # curly brace pages are dropped regardless of kept lines
    assert out[1]["page_keep"] is False
