"""Charset sniffing/decode: WHATWG detection order, label aliases,
damage tolerance, and the Spark map-only stage."""

from __future__ import annotations

from pyspark.sql import functions as F

from smartcrawler_spark.sources.charset import (
    decode_payload,
    decode_payloads,
    sniff_encoding,
)


def test_bom_wins_over_everything():
    body = "héllo wörld"
    # UTF-8 BOM beats a lying Content-Type AND a lying meta
    payload = b"\xef\xbb\xbf" + (
        '<meta charset="shift_jis">' + body).encode("utf-8")
    t, e = decode_payload(payload, "text/html; charset=utf-16")
    assert e == "utf-8" and body in t and "﻿" not in t
    for bom, enc in ((b"\xff\xfe", "utf-16-le"), (b"\xfe\xff", "utf-16-be")):
        t, e = decode_payload(bom + body.encode(enc), "charset=latin1")
        assert (t, e) == (body, enc)


def test_content_type_beats_meta_prescan():
    body = "caf\xe9 ni\xf1o"
    payload = ('<meta charset="utf-8"><p>' + body).encode("cp1252")
    t, e = decode_payload(payload, "text/html; charset=ISO-8859-1")
    # latin1 family maps to windows-1252 per the Encoding Standard
    assert e == "cp1252" and body in t


def test_meta_prescan_variants_and_limit():
    body = "д" * 10
    for head in ('<meta charset=windows-1251>',
                 "<meta charset='windows-1251'>",
                 '<meta http-equiv="Content-Type" '
                 'content="text/html; charset=windows-1251">'):
        t, e = decode_payload((head + body).encode("cp1251"))
        assert e == "cp1251" and body in t, (head, e)
    # meta past the 1024-byte prescan window is NOT seen -> utf-8 fallback
    far = b" " * 1100 + b'<meta charset="windows-1251">'
    assert sniff_encoding(far + body.encode("cp1251")) == "utf-8"


def test_label_aliases_and_garbage_labels():
    assert sniff_encoding(b"x", "charset=latin1") == "cp1252"
    assert sniff_encoding(b"x", "charset=SJIS") == "shift_jis"
    assert sniff_encoding(b"x", "charset=GB2312") == "gbk"
    assert sniff_encoding(b"x", "charset=utf8") == "utf-8"
    # unknown label falls through to the meta/fallback chain
    assert sniff_encoding(b"x", "charset=klingon-8") == "utf-8"


def test_damage_never_raises():
    # invalid utf-8 -> U+FFFD, never an exception
    t, e = decode_payload(b"ok \xff\xfe\xfa broken", "charset=utf-8")
    assert e == "utf-8" and t.startswith("ok ") and "�" in t
    assert decode_payload(None) == ("", "utf-8")
    assert decode_payload(b"") == ("", "utf-8")
    # binary junk with a bogus declared charset still decodes
    t, e = decode_payload(bytes(range(256)), "charset=no-such-enc")
    assert isinstance(t, str) and e == "utf-8"


def test_spark_stage_is_map_only_and_matches_python(spark):
    cases = [
        ("a", "héllo".encode("utf-8"), "text/html"),
        ("b", b"\xef\xbb\xbf" + "héllo".encode("utf-8"), None),
        ("c", "caf\xe9".encode("cp1252"), "text/html; charset=latin1"),
        ("d", ('<meta charset="windows-1251">' + "да").encode("cp1251"), None),
        ("e", None, "text/html"),
        ("f", b"\xff\xfe" + "wide".encode("utf-16-le"), None),
    ]
    df = spark.createDataFrame(
        cases, "case_id string, payload binary, content_type string")
    out = decode_payloads(df)
    got = {r["case_id"]: (r["text"], r["encoding"]) for r in out.collect()}
    for cid, payload, ct in cases:
        assert got[cid] == decode_payload(payload, ct), cid
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # decode adds no shuffle
