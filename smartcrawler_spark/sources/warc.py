"""WARC (Web ARChive, ISO 28500) source: the standard interchange format
for crawl corpora (Common Crawl, Internet Archive, Heritrix output).

The reference fetches pages live and never persists raw captures
(/root/reference/src/browser.rs:52-84); a production crawl at 10^10 URLs
both WRITES its fetches as WARC and INGESTS third-party WARC corpora, so
this module does both with stdlib-only parsing:

* `warc_record_bytes` / `write_warc` — serialize response records
  (WARC/1.0 headers + HTTP/1.1 response block), optionally one gzip
  member per record (the `.warc.gz` convention: members concatenate, so
  readers can seek record boundaries without decompressing the file).
* `parse_warc_bytes` — tolerant streaming parser: uncompressed or
  multi-member gzip, warcinfo/request/response/revisit/metadata types,
  HTTP status + Content-Type extraction, payload isolation. Malformed
  trailing bytes end the stream (partial capture) instead of raising —
  a 100 TB ingest cannot die on one truncated file.
* `read_warc` — Spark ingest: `binaryFile` scan + `mapInPandas` parse.
  Parallelism is FILE-granular, which is the right unit at scale: WARC
  records are sequential within a file, but archive corpora ship as
  many ~1 GB files (Common Crawl: ~10^5 per snapshot), so the scan
  parallelizes across files/executors with zero shuffle and Arrow-batch
  output. One file never passes through the driver.
* `warc_documents` — route HTML response payloads through the engine's
  span decomposition (sources.html_ingest) into the BASELINE input_hint
  document shape (doc_id, spans).
"""

from __future__ import annotations

import gzip
import hashlib
import io
import zlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CRLF = b"\r\n"


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

def _http_block(status: int, content_type: str, payload: bytes) -> bytes:
    reason = {200: "OK", 301: "Moved Permanently", 302: "Found",
              404: "Not Found", 500: "Internal Server Error"}.get(status, "X")
    head = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode("ascii")
    return head + payload


def warc_record_bytes(
    warc_type: str,
    target_uri: str | None,
    date: str,
    record_id: str,
    block: bytes,
    content_type: str = "application/http; msgtype=response",
) -> bytes:
    """One WARC/1.0 record: named headers, Content-Length of the block,
    block, and the mandated two trailing CRLFs."""
    headers = [
        ("WARC-Type", warc_type),
        ("WARC-Date", date),
        ("WARC-Record-ID", f"<urn:uuid:{record_id}>"),
        ("Content-Type", content_type),
        ("Content-Length", str(len(block))),
    ]
    if target_uri is not None:
        headers.insert(3, ("WARC-Target-URI", target_uri))
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}\r\n".encode("ascii") for k, v in headers
    ) + _CRLF
    return head + block + _CRLF + _CRLF


def response_record(url: str, date: str, record_id: str, status: int,
                    content_type: str, payload: bytes) -> bytes:
    return warc_record_bytes(
        "response", url, date, record_id,
        _http_block(status, content_type, payload))


def write_warc(records: list[bytes], gzip_members: bool = True) -> bytes:
    """Concatenate records into a .warc / .warc.gz byte stream. With
    gzip_members each record is its own gzip member (mtime pinned to 0 so
    output is byte-deterministic)."""
    if not gzip_members:
        return b"".join(records)
    out = io.BytesIO()
    for rec in records:
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(rec)
        out.write(buf.getvalue())
    return out.getvalue()


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

def _iter_gzip_members(data: bytes) -> Iterator[bytes]:
    """Decompress concatenated gzip members one at a time (zlib keeps
    unused_data pointing at the next member)."""
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        try:
            chunk = d.decompress(data[pos:])
        except zlib.error:
            return  # truncated/corrupt tail: stop, keep what we have
        yield chunk + d.flush()
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            return
        pos += consumed


def _parse_records(data: bytes) -> Iterator[dict]:
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0 or not data[pos:pos + 5] == b"WARC/":
            return  # not a record boundary: damaged tail
        head = data[pos:head_end].decode("utf-8", "replace")
        fields: dict[str, str] = {}
        for line in head.split("\r\n")[1:]:
            k, _, v = line.partition(":")
            if _:
                fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields.get("content-length", ""))
        except ValueError:
            return
        block = data[head_end + 4: head_end + 4 + length]
        if len(block) < length:
            return  # truncated capture
        yield {"fields": fields, "block": block}
        pos = head_end + 4 + length


def _dechunk(body: bytes) -> bytes | None:
    """Reassemble an HTTP/1.1 chunked-transfer body (RFC 9112 §7.1):
    hex size line (chunk extensions after ';' ignored) + chunk + CRLF,
    terminated by a 0-size chunk (trailers dropped). Returns None on any
    framing damage — the caller keeps the raw bytes rather than guess."""
    out, pos = [], 0
    while True:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            return None
        size_tok = body[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            return None
        pos = eol + 2
        if size == 0:
            return b"".join(out)
        if pos + size + 2 > len(body) or body[pos + size:pos + size + 2] != b"\r\n":
            return None
        out.append(body[pos:pos + size])
        pos += size + 2


def _split_http(block: bytes) -> tuple[int | None, str | None, bytes, str]:
    """HTTP response block -> (status, content_type, payload, x_robots).

    Web archives capture the response AS SENT, so the payload routinely
    arrives chunked (Transfer-Encoding: chunked) and/or compressed
    (Content-Encoding: gzip|deflate) — both are undone here, in wire
    order (de-chunk first, then decompress), because every downstream
    operator (HTML ingest, dedup fingerprints, content extraction) needs
    the entity bytes, not the transfer framing. Damage policy matches
    the rest of this module: any framing/stream error keeps the raw
    block rather than emitting a partial guess."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0 or not block.startswith(b"HTTP/"):
        return None, None, block, ""
    head = block[:sep].decode("utf-8", "replace")
    lines = head.split("\r\n")
    parts = lines[0].split(" ", 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        status = None
    ctype = None
    chunked = False
    cenc = ""
    x_robots: list[str] = []
    for line in lines[1:]:
        k, _, v = line.partition(":")
        key = k.strip().lower()
        if key == "content-type" and ctype is None:
            ctype = v.strip()
        elif key == "transfer-encoding" and "chunked" in v.lower():
            chunked = True
        elif key == "content-encoding":
            cenc = v.strip().lower()
        elif key == "x-robots-tag":
            # header-level REP (the robots-meta twin for non-HTML payloads;
            # Google/Bing semantics). Repeated headers accumulate; an
            # agent-scoped form 'agent: directives' is kept verbatim — the
            # generic-agent filter happens at directive interpretation.
            x_robots.append(v.strip())
    payload = block[sep + 4:]
    if chunked:
        body = _dechunk(payload)
        if body is not None:
            payload = body
    if cenc in ("gzip", "x-gzip") and payload[:2] == b"\x1f\x8b":
        try:
            payload = gzip.decompress(payload)
        except (OSError, EOFError, zlib.error):
            pass
    elif cenc == "deflate":
        try:  # zlib-wrapped first, raw-deflate fallback (both seen in wild)
            payload = zlib.decompress(payload)
        except zlib.error:
            try:
                payload = zlib.decompress(payload, -zlib.MAX_WBITS)
            except zlib.error:
                pass
    return status, ctype, payload, "\n".join(x_robots)


def parse_warc_bytes(data: bytes) -> list[dict]:
    """WARC bytes (plain or multi-member gzip) -> list of
    {warc_type, url, date, record_id, http_status, content_type, payload}.
    Request/warcinfo/metadata records keep their raw block as payload
    with http_status/content_type None; damaged tails truncate silently."""
    if data[:2] == b"\x1f\x8b":
        data = b"".join(_iter_gzip_members(data))
    out = []
    for rec in _parse_records(data):
        f = rec["fields"]
        wtype = f.get("warc-type", "")
        status, payload, x_robots = None, rec["block"], ""
        if wtype in ("response", "revisit"):
            status, ctype, payload, x_robots = _split_http(rec["block"])
        else:
            # non-HTTP records: the WARC-level Content-Type IS the
            # payload's type (resource/warcinfo/metadata/request)
            ctype = f.get("content-type")
        out.append({
            "warc_type": wtype,
            "url": f.get("warc-target-uri"),
            "date": f.get("warc-date", ""),
            "record_id": f.get("warc-record-id", ""),
            "http_status": status,
            "content_type": ctype,
            "x_robots": x_robots,
            "payload": payload,
        })
    return out


# ---------------------------------------------------------------------------
# Spark ingest
# ---------------------------------------------------------------------------

WARC_SCHEMA = (
    "file string, warc_type string, url string, date string, "
    "record_id string, http_status int, content_type string, "
    "x_robots string, payload binary, payload_md5 string, n_bytes long"
)


def read_warc(spark, path_glob: str) -> DataFrame:
    """Scan .warc/.warc.gz files into records: binaryFile source (one row
    per file, streamed through Arrow) -> mapInPandas stdlib parse. Column
    pruning applies upstream of the parse only at file granularity (WARC
    is a sequential container) — which matches how archive corpora shard:
    many independent files, each one task."""
    import os

    import pandas as pd

    files = spark.read.format("binaryFile").load(path_glob)

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                name = os.path.basename(str(path))
                for r in parse_warc_bytes(bytes(content)):
                    rows.append({
                        "file": name,
                        "warc_type": r["warc_type"],
                        "url": r["url"],
                        "date": r["date"],
                        "record_id": r["record_id"],
                        "http_status": r["http_status"],
                        "content_type": r["content_type"],
                        "x_robots": r["x_robots"],
                        "payload": r["payload"],
                        "payload_md5": hashlib.md5(r["payload"]).hexdigest(),
                        "n_bytes": len(r["payload"]),
                    })
            yield pd.DataFrame(rows, columns=[
                "file", "warc_type", "url", "date", "record_id",
                "http_status", "content_type", "x_robots", "payload",
                "payload_md5", "n_bytes"])

    return files.select("path", "content").mapInPandas(gen, WARC_SCHEMA)


def warc_documents(records: DataFrame) -> DataFrame:
    """Successful HTML response records -> the input_hint document shape
    (doc_id=URL, spans) via the engine's span decomposition. Non-HTML and
    non-200 records are filtered JVM-side BEFORE the Python parse — the
    expensive stage only sees rows it will keep."""
    from .html_ingest import parse_html_docs

    html = (
        records.filter(
            (F.col("warc_type") == "response")
            & (F.col("http_status") == 200)
            & F.col("content_type").startswith("text/html")
            & F.col("url").isNotNull()
        )
        .select(F.col("url").alias("doc_id"),
                F.col("payload").cast("string").alias("html"))
    )
    return parse_html_docs(html)


# ---------------------------------------------------------------------------
# WARC sink (corpus archival)
# ---------------------------------------------------------------------------

def export_corpus_warc(docs: DataFrame, out_dir: str, date: str,
                       n_files: int = 8) -> DataFrame:
    """Archive a span-document corpus as WARC: one `.warc.gz` per output
    partition, written ON THE EXECUTORS (mapInPandas; no rows pass the
    driver), each record a `resource` entry whose payload is the doc's
    span sequence as CANONICAL JSON (sorted keys, fixed separators) —
    archival fidelity over cosmetics, since the corpus IS spans (the
    network payload the reference would have archived does not exist in
    the decomposed data model; input_hint schema). `date` is explicit —
    same no-wall-clock discipline as the feed source.

    Files are range-partitioned by doc_id, so output bytes are a pure
    function of (input, date, n_files) — re-exports are byte-stable and
    `read_warc(out_dir)` + a JSON parse reproduces the exact spans
    (tests assert the full roundtrip). Returns the per-file manifest
    (file, n_records, n_bytes)."""
    import json
    import os

    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        recs, first_id = [], None
        for pdf in batches:
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                if first_id is None:
                    first_id = str(doc_id)
                payload = json.dumps(
                    [{"kind": s["kind"], "text": s["text"],
                      "media_ref": s["media_ref"], "offset": int(s["offset"])}
                     for s in (spans if spans is not None else [])],
                    sort_keys=True, separators=(",", ":")).encode()
                recs.append(warc_record_bytes(
                    "resource", str(doc_id), date,
                    hashlib.md5(str(doc_id).encode()).hexdigest(), payload,
                    content_type="application/json"))
        if not recs:
            return
        data = write_warc(recs, gzip_members=True)
        # name by first doc id's md5: deterministic under range
        # partitioning, no partition-id dependence
        name = f"part-{hashlib.md5(first_id.encode()).hexdigest()[:12]}.warc.gz"
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(data)
        yield pd.DataFrame([{"file": name, "n_records": len(recs),
                             "n_bytes": len(data)}])

    part = docs.select("doc_id", "spans").repartitionByRange(
        n_files, "doc_id").sortWithinPartitions("doc_id")
    return part.mapInPandas(gen, "file string, n_records long, n_bytes long")


def span_docs_from_warc(spark, warc_dir: str,
                        include_statuses: tuple = (200,),
                        drop_noindex: bool = False) -> DataFrame:
    """The raw-web ingest path, end to end: WARC response records ->
    entity bytes (already de-chunked/de-gzipped by the record parser) ->
    charset sniff+decode (sources/charset.py) -> reference-shaped span
    documents (sources/html_ingest.py). One scan, three map-only Arrow
    stages, zero Exchange until a downstream shuffle asks for one —
    point it at a Common-Crawl-style .warc.gz directory and the output
    is the engine's standard (doc_id, host, spans, nodes) corpus.

    Only `include_statuses` responses with an HTML content type are
    parsed; everything else (errors, images, PDFs) is filtered at the
    scan so payload bytes never cross a stage boundary."""
    from .charset import decode_payloads
    from .html_ingest import parse_html_docs

    recs = read_warc(spark, warc_dir).filter(
        (F.col("warc_type") == "response")
        & F.col("http_status").isin(list(include_statuses))
        & F.lower(F.coalesce(F.col("content_type"), F.lit("")))
           .startswith("text/html"))
    decoded = decode_payloads(
        recs.select("url", "payload", "content_type"))
    docs = parse_html_docs(
        decoded.select(F.col("url").alias("doc_id"), F.col("text").alias("html")))
    if drop_noindex:
        # REP opt-outs (robots meta + X-Robots-Tag header, merged most-
        # restrictive) exclude the page from the corpus output — the
        # polite default for training-data harvesting. Anti-join on the
        # URL; the directives side reuses the same scan.
        noidx = directives_from_warc(
            spark, warc_dir, include_statuses
        ).filter(F.col("noindex")).select("doc_id")
        docs = docs.join(noidx, "doc_id", "left_anti")
    return docs


def _hdr_flag(x_robots, *names: str):
    """Column predicate: any GENERIC X-Robots-Tag directive equals one
    of `names`. Headers are newline-joined by the parser (one element
    per X-Robots-Tag line); per the REP header spec, an agent token
    before the first ':' scopes the WHOLE header value ('googlebot:
    noindex, nofollow' applies only to googlebot — including the tokens
    after the comma), and such headers are ignored entirely: this
    engine models the generic agent, same as its robots.txt default.
    The one colon-bearing first token that is NOT an agent scope is the
    'unavailable_after: <date>' directive — those headers stay generic.
    Pure JVM higher-order functions, no Python."""
    headers = F.split(F.coalesce(x_robots, F.lit("")), "\n")

    def _first_tok(h):
        return F.trim(F.lower(F.element_at(F.split(h, ","), 1)))

    generic = F.filter(
        headers,
        lambda h: ~_first_tok(h).contains(":")
        | _first_tok(h).startswith("unavailable_after"),
    )
    toks = F.flatten(F.transform(
        generic,
        lambda h: F.transform(F.split(h, ","), lambda t: F.trim(F.lower(t))),
    ))
    return F.exists(toks, lambda t: t.isin(*names))


def directives_from_warc(spark, warc_dir: str,
                         include_statuses: tuple = (200,)) -> DataFrame:
    """Per-page crawl directives for HTML responses, merged across BOTH
    Robots-Exclusion channels: the X-Robots-Tag HTTP header (captured by
    the record parser) and the in-document robots meta
    (html_ingest.page_directives). Most-restrictive union — any channel
    saying noindex/nofollow sets the flag (Google/Bing combine rule);
    `none` implies both. Returns (doc_id, noindex, nofollow, canonical,
    base_href, n_nofollow_links). One scan; the meta walk is the same
    mapInPandas stage shape as parse_html_docs, plus one join back on
    the URL to attach the header verdict."""
    from .charset import decode_payloads
    from .html_ingest import extract_directives_docs

    recs = read_warc(spark, warc_dir).filter(
        (F.col("warc_type") == "response")
        & F.col("http_status").isin(list(include_statuses))
        & F.lower(F.coalesce(F.col("content_type"), F.lit("")))
           .startswith("text/html"))
    hdr = recs.select(
        F.col("url").alias("doc_id"),
        (_hdr_flag(F.col("x_robots"), "noindex", "none")).alias("_h_noindex"),
        (_hdr_flag(F.col("x_robots"), "nofollow", "none")).alias("_h_nofollow"),
    )
    decoded = decode_payloads(recs.select("url", "payload", "content_type"))
    meta = extract_directives_docs(
        decoded.select(F.col("url").alias("doc_id"),
                       F.col("text").alias("html")))
    return (
        meta.join(hdr, "doc_id")
        .select(
            "doc_id",
            (F.col("noindex") | F.col("_h_noindex")).alias("noindex"),
            (F.col("nofollow") | F.col("_h_nofollow")).alias("nofollow"),
            "canonical", "base_href", "n_nofollow_links",
        )
    )


def corpus_from_warc(spark, warc_dir: str) -> DataFrame:
    """Inverse of export_corpus_warc: resource records -> (doc_id, spans)."""
    import json

    import pandas as pd

    recs = read_warc(spark, warc_dir).filter(
        (F.col("warc_type") == "resource")
        & (F.col("content_type") == "application/json"))

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for url, payload in zip(pdf["url"], pdf["payload"]):
                rows.append({"doc_id": url,
                             "spans": json.loads(bytes(payload).decode())})
            yield pd.DataFrame(rows, columns=["doc_id", "spans"])

    schema = ("doc_id string, spans array<struct<kind:string,text:string,"
              "media_ref:string,offset:int>>")
    return recs.select("url", "payload").mapInPandas(gen, schema)
