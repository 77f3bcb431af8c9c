"""Archive sources (sources/archive.py). The driver gate pins the
happy path against the construction-parameter oracle; these tests
cover damage tolerance, the bomb guard, directory/special-member
skipping, and compressed-tar sniffing."""

from __future__ import annotations

import gzip
import io
import tarfile
import zipfile

from smartcrawler_spark.sources.archive import (archive_member_table,
                                                _detect)


def _zip(members):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, body in members:
            zf.writestr(name, body)
    return buf.getvalue()


def _tar(members, compress=None):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, body in members:
            info = tarfile.TarInfo(name)
            info.size = len(body)
            tf.addfile(info, io.BytesIO(body))
    raw = buf.getvalue()
    return gzip.compress(raw, mtime=0) if compress == "gz" else raw


def test_detect():
    assert _detect(_zip([("a", b"x")])) == "zip"
    assert _detect(_tar([("a", b"x")])) == "tar"
    assert _detect(_tar([("a", b"x")], "gz")) == "tar"
    assert _detect(b"plain text") is None


def test_members_and_damage_tolerance(spark):
    zp = _zip([("a.txt", b"alpha"), ("dir/", b""), ("b.txt", b"bb")])
    tp = _tar([("x.txt", b"xray")], "gz")
    rows = [
        ("z", bytearray(zp)),
        ("t", bytearray(tp)),
        ("broken", bytearray(zp[:20])),          # truncated zip
        ("junk", bytearray(b"neither")),
    ]
    df = spark.createDataFrame(rows, "archive_ref string, payload binary")
    got = sorted((r["archive_ref"], r["member"], r["kind"], r["n_bytes"],
                  bytes(r["payload"]))
                 for r in archive_member_table(df).collect())
    assert got == [
        ("t", "x.txt", "tar", 4, b"xray"),
        ("z", "a.txt", "zip", 5, b"alpha"),
        ("z", "b.txt", "zip", 2, b"bb"),
    ]


def test_bomb_guard_uses_declared_size(spark):
    big = b"A" * 10_000
    zp = _zip([("big.txt", big), ("small.txt", b"ok")])
    df = spark.createDataFrame([("z", bytearray(zp))],
                               "archive_ref string, payload binary")
    got = archive_member_table(df, max_member_bytes=100).collect()
    assert [r["member"] for r in got] == ["small.txt"]


def test_tar_special_members_skipped(spark):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        d = tarfile.TarInfo("d")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
        link = tarfile.TarInfo("lnk")
        link.type = tarfile.SYMTYPE
        link.linkname = "f.txt"
        tf.addfile(link)
        f = tarfile.TarInfo("f.txt")
        body = b"file"
        f.size = len(body)
        tf.addfile(f, io.BytesIO(body))
    df = spark.createDataFrame([("t", bytearray(buf.getvalue()))],
                               "archive_ref string, payload binary")
    got = archive_member_table(df).collect()
    assert [(r["member"], bytes(r["payload"])) for r in got] == \
        [("f.txt", b"file")]


def test_span_docs_from_archive(spark):
    """Site-export ingest: HTML members decode and parse into the
    engine's standard span-document corpus; non-HTML members are
    filtered before any payload crosses a stage boundary."""
    from smartcrawler_spark.sources.archive import span_docs_from_archive

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("site/index.html",
                    '<html><body><h1>Hello</h1><p>world text here</p>'
                    '<a href="/x">link</a></body></html>')
        zf.writestr("site/data.json", "{}")
        zf.writestr("site/page2.HTM", "<html><body><p>two</p></body></html>")
    df = spark.createDataFrame([("dump.zip", bytearray(buf.getvalue()))],
                               "archive_ref string, payload binary")
    rows = {r["doc_id"]: r for r in span_docs_from_archive(df).collect()}
    assert set(rows) == {"https://dump.zip/site/index.html",
                         "https://dump.zip/site/page2.HTM"}
    idx = rows["https://dump.zip/site/index.html"]
    assert idx["host"] == "dump.zip"
    assert [(s["kind"], s["text"]) for s in idx["spans"]] == [
        ("h1", "Hello"), ("p", "world text here"), ("a", "link")]
