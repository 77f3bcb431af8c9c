"""Archive sources: ZIP and TAR payloads -> one row per member file.

Bulk corpus drops arrive as archives (dataset uploads, site exports,
Common-Crawl-style segment bundles); the ingest shape mirrors
sources/warc.py — file-granular binary payloads in, a flat
(archive_ref, member, n_bytes, payload) table out, damage-tolerant:
an archive that fails to parse contributes zero rows instead of
failing the job, and a member whose extraction fails is skipped.

Scale shape: map-only (`mapInPandas` over the payload column; stdlib
zipfile/tarfile on the executors, no shuffle). Archives are parsed
from in-memory bytes, so this tier targets the many-medium-archives
regime (the binaryFile reader already caps single-file size); huge
single archives belong to a streaming splitter at the storage layer.

Reference context: the reference ingests live HTTP only
(/root/reference/src/browser.rs); archive ingest is 100 TB pipeline
breadth alongside WARC.
"""

from __future__ import annotations

import io
import tarfile
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

ARCHIVE_MEMBER_SCHEMA = (
    "archive_ref string, member string, kind string, n_bytes long, "
    "payload binary"
)


def _zip_members(payload: bytes, max_bytes: int):
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        for info in zf.infolist():
            if info.is_dir() or info.file_size > max_bytes:
                continue  # size check on the DECLARED size, pre-extraction
            try:
                body = zf.read(info)
            except Exception:
                continue  # bad CRC / truncated member: skip, keep the rest
            if len(body) <= max_bytes:  # declared size can lie
                yield info.filename, body


def _tar_members(payload: bytes, max_bytes: int):
    # r:* sniffs gzip/bz2/xz/plain framing from the bytes
    with tarfile.open(fileobj=io.BytesIO(payload), mode="r:*") as tf:
        for info in tf:
            if not info.isfile() or info.size > max_bytes:
                continue
            try:
                f = tf.extractfile(info)
                if f is not None:
                    yield info.name, f.read()
            except Exception:
                continue


def _detect(payload: bytes) -> str | None:
    if payload[:4] in (b"PK\x03\x04", b"PK\x05\x06", b"PK\x07\x08"):
        return "zip"
    # tar has no leading magic; ustar sits at offset 257, and compressed
    # tars announce themselves by their compressor magic
    if payload[257:262] == b"ustar" or payload[:2] == b"\x1f\x8b" \
            or payload[:3] == b"BZh" or payload[:6] == b"\xfd7zXZ\x00":
        return "tar"
    return None


def archive_member_table(raw: DataFrame, ref_col: str = "archive_ref",
                         payload_col: str = "payload",
                         max_member_bytes: int = 1 << 30) -> DataFrame:
    """(archive_ref, member, kind, n_bytes, payload) for every regular
    file in every parseable ZIP/TAR payload. Directories, unparseable
    archives, and members above `max_member_bytes` (zip-bomb guard,
    checked against the DECLARED size before extraction) contribute no
    rows. Map-only."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            refs, names, kinds, sizes, payloads = [], [], [], [], []
            for ref, payload in zip(pdf[ref_col], pdf[payload_col]):
                data = bytes(payload)
                kind = _detect(data)
                if kind is None:
                    continue
                members = _zip_members if kind == "zip" else _tar_members
                try:
                    for name, body in members(data, max_member_bytes):
                        refs.append(ref)
                        names.append(name)
                        kinds.append(kind)
                        sizes.append(len(body))
                        payloads.append(bytearray(body))
                except Exception:
                    continue
            yield pd.DataFrame({
                "archive_ref": pd.Series(refs, dtype="object"),
                "member": pd.Series(names, dtype="object"),
                "kind": pd.Series(kinds, dtype="object"),
                "n_bytes": pd.Series(sizes, dtype="int64"),
                "payload": pd.Series(payloads, dtype="object"),
            })

    return (raw.select(ref_col, payload_col)
            .mapInPandas(batches, ARCHIVE_MEMBER_SCHEMA))


def span_docs_from_archive(raw: DataFrame, ref_col: str = "archive_ref",
                           payload_col: str = "payload",
                           html_suffixes: tuple = (".html", ".htm")
                           ) -> DataFrame:
    """Site-export ingest, end to end: archive members -> HTML files by
    suffix -> charset sniff+decode (sources/charset.py) ->
    reference-shaped span documents (sources/html_ingest.py), the same
    three map-only Arrow stages as warc.span_docs_from_warc with
    `archive_ref/member` as the doc id (the html stage canonicalizes it
    URL-shaped — `https://<archive_ref>/<member>` — so the URL-minded
    downstream: link resolution, host_of, dedup keys, all stay
    well-defined with the archive name standing in as the host).
    Point it at a directory of
    site-dump zips/tars and the output is the engine's standard
    (doc_id, host, spans, nodes) corpus."""
    from pyspark.sql import functions as F

    from .charset import decode_payloads
    from .html_ingest import parse_html_docs

    members = archive_member_table(raw, ref_col=ref_col,
                                   payload_col=payload_col)
    suffix_pred = None
    for s in html_suffixes:
        p = F.lower(F.col("member")).endswith(s)
        suffix_pred = p if suffix_pred is None else (suffix_pred | p)
    html = members.filter(suffix_pred).select(
        F.concat_ws("/", "archive_ref", "member").alias("doc_id"),
        "payload",
        F.lit("text/html").alias("content_type"),
    )
    decoded = decode_payloads(html)
    return parse_html_docs(
        decoded.select("doc_id", F.col("text").alias("html")))
