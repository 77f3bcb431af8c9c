"""Golden ports of the reference's 16 template-detection unit tests
(/root/reference/src/template_detection.rs:356-587)."""

from __future__ import annotations

import pytest

from smartcrawler_spark.functions.templates import apply_template, detect_template

GOLDEN_APPLY = [
    # (input, expected apply_template output)
    ("42 comments", "{count} comments"),
    ("16 hours ago", "{time} hours ago"),
    ("1 minute ago", "{time} minute ago"),
    ("5 minutes ago", "{time} minutes ago"),
    ("123 likes", "{count} likes"),
    ("42 views", "{count} views"),
    ("7 replies", "{count} replies"),
    ("1 share", "{count} share"),
    ("999 points", "{count} points"),
    ("30 seconds ago", "{time} seconds ago"),
    ("2 days ago", "{time} days ago"),
    ("1 week ago", "{time} week ago"),
    ("6 months ago", "{time} months ago"),
    ("2 years ago", "{time} years ago"),
    ("Posted 2 hours ago by user123", "Posted {time} hours ago by user123"),
    ("Page 5 of 100", "Page {count} of 100"),
    ("42 COMMENTS", "{count} COMMENTS"),
    ("16 Hours Ago", "{time} Hours Ago"),
    ("999 likes", "{count} likes"),
    ("1.2k views", "{count}.2k views"),
    ("42 shares", "{count} shares"),
    ("10 upvotes", "{count} upvotes"),
    ("500 points", "{count} points"),
    ("just now", "just now"),
    ("1 second ago", "{time} second ago"),
    ("2 minutes ago", "{time} minutes ago"),
    ("1 hour ago", "{time} hour ago"),
    ("5 hours ago", "{time} hours ago"),
    ("yesterday", "yesterday"),
    ("3 weeks ago", "{time} weeks ago"),
    ("last month", "last month"),
    ("1 year ago", "{time} year ago"),
    ("Hello world", "Hello world"),
    ("Just some text", "Just some text"),
]


@pytest.mark.parametrize("inp,expected", GOLDEN_APPLY)
def test_apply_template_goldens(inp, expected):
    assert apply_template(inp) == expected


def test_float_pattern():
    hit = detect_template("4.5 hours ago")
    assert hit == ("{value} hours ago", "value", "Float")


def test_no_pattern():
    for inp in ["Hello world", "Just text", "42", "Random 123 text", ""]:
        assert detect_template(inp) is None, inp


def test_whitespace_handling():
    assert detect_template("  42   comments  ")[0] == "{count}   comments"
    assert detect_template("16\thours\tago")[0] == "{time}\thours\tago"


def test_udf_matches_python(spark):
    from pyspark.sql import functions as F

    from smartcrawler_spark.functions.templates import templated_text

    inputs = [i for i, _ in GOLDEN_APPLY] + ["4.5 hours ago", "", "Random 123 text"]
    df = spark.createDataFrame([(t,) for t in inputs], "text string")
    got = {
        r["text"]: r["out"]
        for r in df.select("text", templated_text(F.col("text")).alias("out")).collect()
    }
    for t in inputs:
        assert got[t] == apply_template(t), t
