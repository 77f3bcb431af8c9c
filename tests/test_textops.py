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
