#!/usr/bin/env python3
"""Deterministic WARC fixture + golden-parquet oracle for the `warc_ingest`
driver gate.

Oracle design differs from gen_golden.py's re-implementation approach: here
the golden rows are the WRITER'S INPUTS (url/status/content-type/payload
fed to sources.warc.response_record), so the gate checks that the repo's
parser exactly INVERTS the serialization — a cross-implementation check
(writer vs parser are separate code paths) with no shared parse logic.

Fixture shapes exercised:
* sample_0.warc.gz — per-record gzip members: warcinfo, request, five
  responses (HTML 200, JSON 200, HTML 404, PNG-ish binary, HTML 301),
  one revisit, one metadata record
* sample_1.warc    — uncompressed, four HTML responses
* sample_2.warc.gz — a valid response followed by a TRUNCATED record
  (cut mid-block): the tail must be dropped silently, golden keeps only
  the intact record

Everything is pinned (fixed dates, fixed ids, mtime=0 gzip) — re-running
this script is byte-stable. Regenerate: python tools/gen_warc_fixture.py
"""

from __future__ import annotations

import hashlib
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smartcrawler_spark.sources.warc import (  # noqa: E402
    _http_block,
    response_record,
    warc_record_bytes,
    write_warc,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WARC_DIR = os.path.join(ROOT, "fixtures", "warc")
GOLDEN = os.path.join(ROOT, "fixtures", "golden", "warc_ingest.parquet")

D = "2026-08-17T00:00:{s:02d}Z"


def _html(i: int) -> bytes:
    return (f"<html><body><h1>Page {i}</h1><p>text {i * 7}</p>"
            f"<a href='/p{i + 1}'>next</a></body></html>").encode()


def build():
    golden = []

    def g(fname, wtype, url, date, rid, status, ctype, payload):
        golden.append({
            "file": fname, "warc_type": wtype, "url": url, "date": date,
            "record_id": f"<urn:uuid:{rid}>", "http_status": status,
            "content_type": ctype,
            "payload_md5": hashlib.md5(payload).hexdigest(),
            "n_bytes": len(payload),
        })

    # ---- sample_0.warc.gz -------------------------------------------------
    recs0 = []
    info_block = b"software: smartcrawler-spark\r\nformat: WARC/1.0\r\n"
    recs0.append(warc_record_bytes(
        "warcinfo", None, D.format(s=0), "w0", info_block,
        content_type="application/warc-fields"))
    g("sample_0.warc.gz", "warcinfo", None, D.format(s=0), "w0",
      None, "application/warc-fields", info_block)

    req_block = (b"GET /p0 HTTP/1.1\r\nHost: a.example.com\r\n"
                 b"User-Agent: graft\r\n\r\n")
    recs0.append(warc_record_bytes(
        "request", "https://a.example.com/p0", D.format(s=1), "q0", req_block,
        content_type="application/http; msgtype=request"))
    g("sample_0.warc.gz", "request", "https://a.example.com/p0",
      D.format(s=1), "q0", None, "application/http; msgtype=request",
      req_block)

    resp0 = [
        ("https://a.example.com/p0", 200, "text/html; charset=utf-8", _html(0)),
        ("https://a.example.com/api", 200, "application/json",
         b'{"k": [1, 2, 3], "v": "x"}'),
        ("https://a.example.com/gone", 404, "text/html", b"<html>404</html>"),
        ("https://a.example.com/img.png", 200, "image/png",
         b"\x89PNG\r\n\x1a\n" + bytes(range(64))),
        ("https://a.example.com/old", 301, "text/html", b"moved"),
    ]
    for i, (url, status, ctype, payload) in enumerate(resp0):
        recs0.append(response_record(url, D.format(s=2 + i), f"r{i}",
                                     status, ctype, payload))
        g("sample_0.warc.gz", "response", url, D.format(s=2 + i), f"r{i}",
          status, ctype, payload)

    revisit_block = _http_block(200, "text/html", b"")
    recs0.append(warc_record_bytes(
        "revisit", "https://a.example.com/p0", D.format(s=10), "v0",
        revisit_block))
    g("sample_0.warc.gz", "revisit", "https://a.example.com/p0",
      D.format(s=10), "v0", 200, "text/html", b"")

    meta_block = b"fetchTimeMs: 120\r\n"
    recs0.append(warc_record_bytes(
        "metadata", "https://a.example.com/p0", D.format(s=11), "m0",
        meta_block, content_type="application/warc-fields"))
    g("sample_0.warc.gz", "metadata", "https://a.example.com/p0",
      D.format(s=11), "m0", None, "application/warc-fields", meta_block)

    # ---- sample_1.warc (uncompressed) ------------------------------------
    recs1 = []
    for i in range(4):
        url = f"https://b.example.com/page/{i}"
        payload = _html(100 + i)
        recs1.append(response_record(url, D.format(s=20 + i), f"b{i}",
                                     200, "text/html", payload))
        g("sample_1.warc", "response", url, D.format(s=20 + i), f"b{i}",
          200, "text/html", payload)

    # ---- sample_2.warc.gz (truncated tail) --------------------------------
    ok_url = "https://c.example.com/ok"
    ok_payload = _html(200)
    ok_rec = response_record(ok_url, D.format(s=30), "c0", 200,
                             "text/html", ok_payload)
    g("sample_2.warc.gz", "response", ok_url, D.format(s=30), "c0",
      200, "text/html", ok_payload)
    cut_rec = response_record("https://c.example.com/cut", D.format(s=31),
                              "c1", 200, "text/html", _html(201))
    truncated = cut_rec[: len(cut_rec) - 40]  # cut mid-block; must be dropped

    os.makedirs(WARC_DIR, exist_ok=True)
    with open(os.path.join(WARC_DIR, "sample_0.warc.gz"), "wb") as f:
        f.write(write_warc(recs0, gzip_members=True))
    with open(os.path.join(WARC_DIR, "sample_1.warc"), "wb") as f:
        f.write(write_warc(recs1, gzip_members=False))
    with open(os.path.join(WARC_DIR, "sample_2.warc.gz"), "wb") as f:
        f.write(write_warc([ok_rec, truncated], gzip_members=True))

    schema = pa.schema([
        ("file", pa.string()), ("warc_type", pa.string()),
        ("url", pa.string()), ("date", pa.string()),
        ("record_id", pa.string()), ("http_status", pa.int32()),
        ("content_type", pa.string()), ("payload_md5", pa.string()),
        ("n_bytes", pa.int64()),
    ])
    cols = {name: [r[name] for r in golden] for name in schema.names}
    pq.write_table(pa.table(cols, schema=schema), GOLDEN)
    print(f"wrote {len(golden)} golden rows, "
          f"{len(os.listdir(WARC_DIR))} warc files")


if __name__ == "__main__":
    build()
