"""WARC source: writer/parser inversion, damage tolerance, Spark ingest,
and span-pipeline integration."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from smartcrawler_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
    response_record,
    warc_documents,
    write_warc,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE_DIR = os.path.join(ROOT, "fixtures", "warc")
GOLDEN = os.path.join(ROOT, "fixtures", "golden", "warc_ingest.parquet")


def _mk_records(n=5):
    return [
        response_record(
            f"https://t.example.com/p{i}", f"2026-08-17T01:00:{i:02d}Z",
            f"t{i}", 200 if i % 3 else 404, "text/html",
            f"<html><body><p>doc {i}</p></body></html>".encode())
        for i in range(n)
    ]


def test_roundtrip_plain_and_gzip():
    recs = _mk_records()
    for gz in (False, True):
        parsed = parse_warc_bytes(write_warc(recs, gzip_members=gz))
        assert len(parsed) == len(recs)
        for i, r in enumerate(parsed):
            assert r["url"] == f"https://t.example.com/p{i}"
            assert r["http_status"] == (200 if i % 3 else 404)
            assert r["payload"] == f"<html><body><p>doc {i}</p></body></html>".encode()
            assert r["record_id"] == f"<urn:uuid:t{i}>"


def test_damage_tolerance_prefix_only_never_crashes():
    """Cutting the stream at ANY byte yields a prefix of the record list
    (deterministic sweep, both plain and gzip framing)."""
    recs = _mk_records(3)
    for gz in (False, True):
        data = write_warc(recs, gzip_members=gz)
        full = [r["record_id"] for r in parse_warc_bytes(data)]
        for cut in range(0, len(data), 37):
            got = [r["record_id"] for r in parse_warc_bytes(data[:cut])]
            assert got == full[:len(got)]
    # garbage bytes: parse to nothing, no exception
    assert parse_warc_bytes(b"\x00\x01garbage" * 50) == []
    assert parse_warc_bytes(b"") == []


def test_fixture_matches_golden_manifest():
    """The checked-in fixtures parse EXACTLY to the writer's golden
    manifest (tools/gen_warc_fixture.py) — fixture freshness + parser
    inversion in one assert, no Spark needed."""
    import hashlib

    want = pq.read_table(GOLDEN).to_pylist()
    got = []
    for path in sorted(glob.glob(os.path.join(FIXTURE_DIR, "*"))):
        for r in parse_warc_bytes(open(path, "rb").read()):
            got.append({
                "file": os.path.basename(path), "warc_type": r["warc_type"],
                "url": r["url"], "date": r["date"],
                "record_id": r["record_id"], "http_status": r["http_status"],
                "content_type": r["content_type"],
                "payload_md5": hashlib.md5(r["payload"]).hexdigest(),
                "n_bytes": len(r["payload"]),
            })
    key = lambda d: (d["file"], d["record_id"])  # noqa: E731
    assert sorted(got, key=key) == sorted(want, key=key)


def test_read_warc_spark_matches_fixture(spark):
    df = read_warc(spark, FIXTURE_DIR)
    assert df.count() == pq.read_table(GOLDEN).num_rows
    row = {r["record_id"]: r for r in df.collect()}["<urn:uuid:r0>"]
    assert row["url"] == "https://a.example.com/p0"
    assert row["http_status"] == 200
    assert row["payload"].startswith(b"<html>")


def test_warc_documents_span_equality(spark):
    """HTML response payloads route through the SAME span decomposition as
    direct ingest: spans from warc_documents == html_to_spans(payload)."""
    from smartcrawler_spark.sources.html_ingest import html_to_spans

    recs = read_warc(spark, FIXTURE_DIR)
    docs = {r["doc_id"]: r["spans"]
            for r in warc_documents(recs).collect()}
    # eligible = 200 + text/html + url (an empty-payload revisit record
    # for p0 is filtered out by status/type rules upstream)
    raw = {r["url"]: bytes(r["payload"]) for r in recs.filter(
        "warc_type = 'response' AND http_status = 200 "
        "AND content_type LIKE 'text/html%'").collect()}
    assert set(docs) == set(raw)
    for url, payload in raw.items():
        want_spans, _ = html_to_spans(payload.decode())
        got = [(s["kind"], s["text"], s["media_ref"], s["offset"])
               for s in (docs[url] or [])]
        want = [(s["kind"], s["text"], s["media_ref"], s["offset"])
                for s in want_spans]
        assert got == want, url


def test_export_corpus_warc_roundtrip(spark):
    """Archive -> re-ingest is EXACT: corpus_from_warc(export(docs))
    reproduces every doc's span sequence; export is byte-deterministic."""
    import tempfile

    from smartcrawler_spark.sources.warc import (
        corpus_from_warc,
        export_corpus_warc,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.expr("""array(
                named_struct('kind','p','text',substr(text,1,40),
                             'media_ref','','offset',0),
                named_struct('kind','a','text','next',
                             'media_ref',concat('/p/', doc_id),'offset',1))
            """).alias("spans"))
    d1, d2 = tempfile.mkdtemp(), tempfile.mkdtemp()
    m1 = export_corpus_warc(docs, d1, "2026-08-17T12:00:00Z", n_files=4)
    files1 = {r["file"]: (r["n_records"], r["n_bytes"]) for r in m1.collect()}
    assert sum(n for n, _ in files1.values()) == docs.count()

    back = {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                          for s in r["spans"]]
            for r in corpus_from_warc(spark, d1).collect()}
    want = {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                          for s in r["spans"]]
            for r in docs.collect()}
    assert back == want

    # byte-determinism: a second export writes identical files
    import hashlib as H
    import os

    m2 = export_corpus_warc(docs, d2, "2026-08-17T12:00:00Z", n_files=4)
    m2.collect()
    h = lambda d: {f: H.md5(open(os.path.join(d, f), 'rb').read()).hexdigest()
                   for f in os.listdir(d)}  # noqa: E731
    assert h(d1) == h(d2)


def _chunked(body: bytes, sizes) -> bytes:
    out, pos = [], 0
    for s in sizes:
        out.append(f"{s:x}".encode() + b"\r\n" + body[pos:pos + s] + b"\r\n")
        pos += s
    assert pos == len(body)
    return b"".join(out) + b"0\r\n\r\n"


def _raw_response(headers: list[str], body: bytes) -> bytes:
    head = "\r\n".join(["HTTP/1.1 200 OK"] + headers) + "\r\n\r\n"
    return head.encode() + body


def test_chunked_transfer_is_reassembled():
    from smartcrawler_spark.sources.warc import (parse_warc_bytes,
                                                 warc_record_bytes)

    body = b"<html><body>" + b"x" * 100 + b"</body></html>"
    block = _raw_response(
        ["Content-Type: text/html", "Transfer-Encoding: chunked"],
        _chunked(body, [5, 1, 50, len(body) - 56]))
    rec = warc_record_bytes("response", "https://c.example.com/", 
                            "2026-08-19T00:00:00Z", "c1", block)
    got = parse_warc_bytes(rec)[0]
    assert got["payload"] == body and got["http_status"] == 200


def test_chunked_with_extensions_and_gzip_content_encoding():
    import gzip as _gz

    from smartcrawler_spark.sources.warc import (parse_warc_bytes,
                                                 warc_record_bytes)

    body = b'{"k": 1}' * 40
    comp = _gz.compress(body, mtime=0)
    # chunk extension after ';' must be ignored (RFC 9112 7.1.1)
    chunks = (f"{len(comp):x};ext=1\r\n".encode() + comp + b"\r\n0\r\n\r\n")
    block = _raw_response(
        ["Content-Type: application/json", "Transfer-Encoding: chunked",
         "Content-Encoding: gzip"], chunks)
    rec = warc_record_bytes("response", "https://c.example.com/j",
                            "2026-08-19T00:00:00Z", "c2", block)
    assert parse_warc_bytes(rec)[0]["payload"] == body


def test_deflate_both_wrappings_and_damage_keeps_raw():
    import zlib as _z

    from smartcrawler_spark.sources.warc import _split_http

    body = b"deflated payload bytes " * 10
    zl = _z.compress(body)                       # zlib-wrapped deflate
    co = _z.compressobj(wbits=-15)
    raw = co.compress(body) + co.flush()         # raw deflate (seen in wild)
    for comp in (zl, raw):
        blk = _raw_response(["Content-Type: text/plain",
                             "Content-Encoding: deflate"], comp)
        assert _split_http(blk)[2] == body
    # damaged chunk framing -> raw block kept, never a crash or partial
    bad = _raw_response(["Transfer-Encoding: chunked"], b"zz\r\nnot hex")
    status, _, payload, _xr = _split_http(bad)
    assert status == 200 and payload == b"zz\r\nnot hex"
    # truncated gzip -> raw bytes kept
    badgz = _raw_response(["Content-Encoding: gzip"], b"\x1f\x8bTRUNC")
    assert _split_http(badgz)[2] == b"\x1f\x8bTRUNC"


def test_span_docs_from_warc_end_to_end(spark, tmp_path):
    """Raw-web path: chunked + gzip + cp1251 HTML inside .warc.gz comes
    out as correctly decoded span documents."""
    import gzip as _gz

    from smartcrawler_spark.sources.warc import (span_docs_from_warc,
                                                 warc_record_bytes,
                                                 write_warc)

    html = ('<html><head><meta charset="windows-1251"></head>'
            '<body><h1>привет мир</h1><p>текст страницы</p>'
            '<a href="/next">дальше</a></body></html>')
    comp = _gz.compress(html.encode("cp1251"), mtime=0)
    chunked = f"{len(comp):x}\r\n".encode() + comp + b"\r\n0\r\n\r\n"
    block = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
             b"Transfer-Encoding: chunked\r\nContent-Encoding: gzip\r\n\r\n"
             + chunked)
    recs = [
        warc_record_bytes("response", "https://ru.example.com/p1",
                          "2026-08-19T00:00:00Z", "r1", block),
        # 404 + non-HTML records must be filtered out at the scan
        warc_record_bytes("response", "https://ru.example.com/miss",
                          "2026-08-19T00:00:01Z", "r2",
                          b"HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\nnope"),
        warc_record_bytes("response", "https://ru.example.com/img",
                          "2026-08-19T00:00:02Z", "r3",
                          b"HTTP/1.1 200 OK\r\nContent-Type: image/png\r\n\r\n\x89PNG"),
    ]
    (tmp_path / "a.warc.gz").write_bytes(write_warc(recs))
    out = span_docs_from_warc(spark, str(tmp_path)).collect()
    assert len(out) == 1
    row = out[0]
    assert row["host"] == "ru.example.com"
    texts = [s["text"] for s in row["spans"] if s["text"]]
    assert "привет мир" in texts and "текст страницы" in texts
    hrefs = [s["media_ref"] for s in row["spans"] if s["kind"] == "a"]
    assert hrefs == ["/next"]


def test_x_robots_tag_header_and_merged_directives(spark, tmp_path):
    """X-Robots-Tag is the HTTP twin of robots meta: header-only,
    meta-only, and agent-scoped-header pages must merge most-restrictive
    per the REP combine rule; drop_noindex excludes opted-out pages."""
    from smartcrawler_spark.sources.warc import (directives_from_warc,
                                                 parse_warc_bytes,
                                                 span_docs_from_warc,
                                                 warc_record_bytes,
                                                 write_warc)

    def resp(url, rid, headers, html):
        head = "\r\n".join(["HTTP/1.1 200 OK", "Content-Type: text/html"]
                           + headers) + "\r\n\r\n"
        return warc_record_bytes("response", url, "2026-08-19T00:00:00Z",
                                 rid, head.encode() + html.encode())

    recs = [
        resp("https://x.example.com/hdr", "x1",
             ["X-Robots-Tag: noindex", "X-Robots-Tag: nofollow"],
             "<p>header says no</p>"),
        resp("https://x.example.com/meta", "x2", [],
             '<meta name="robots" content="noindex"><p>meta says no</p>'),
        resp("https://x.example.com/scoped", "x3",
             ["X-Robots-Tag: googlebot: noindex"],
             "<p>scoped to another agent</p>"),
        resp("https://x.example.com/clean", "x4", [], "<p>welcome</p>"),
        resp("https://x.example.com/none", "x5", ["X-Robots-Tag: none"],
             "<p>none means both</p>"),
        # fully-scoped value: tokens AFTER the comma stay scoped too
        resp("https://x.example.com/scoped2", "x6",
             ["X-Robots-Tag: googlebot: noindex, nofollow"],
             "<p>scoped incl. tail tokens</p>"),
        # colon-bearing directive that is NOT an agent scope
        resp("https://x.example.com/unavail", "x7",
             ["X-Robots-Tag: unavailable_after: 25 Jun 2026, noindex"],
             "<p>dated</p>"),
    ]
    # raw-parse surface: repeated headers accumulate comma-joined
    parsed = {r["url"]: r["x_robots"] for r in
              parse_warc_bytes(write_warc(recs, gzip_members=False))}
    assert parsed["https://x.example.com/hdr"] == "noindex\nnofollow"
    assert parsed["https://x.example.com/clean"] == ""

    (tmp_path / "x.warc.gz").write_bytes(write_warc(recs))
    d = {r["doc_id"]: (r["noindex"], r["nofollow"])
         for r in directives_from_warc(spark, str(tmp_path)).collect()}
    assert d["https://x.example.com/hdr"] == (True, True)
    assert d["https://x.example.com/meta"] == (True, False)
    assert d["https://x.example.com/scoped"] == (False, False)
    assert d["https://x.example.com/clean"] == (False, False)
    assert d["https://x.example.com/none"] == (True, True)
    assert d["https://x.example.com/scoped2"] == (False, False)
    assert d["https://x.example.com/unavail"] == (True, False)

    kept = {r["doc_id"] for r in
            span_docs_from_warc(spark, str(tmp_path),
                                drop_noindex=True).collect()}
    assert kept == {"https://x.example.com/scoped",
                    "https://x.example.com/clean",
                    "https://x.example.com/scoped2"}
    # default keeps everything (archival ingest is lossless)
    assert len(span_docs_from_warc(spark, str(tmp_path)).collect()) == 7
