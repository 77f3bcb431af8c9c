"""Charset sniffing + decode: response bytes -> text.

The reference receives DOM text from the browser (WebDriver decodes for
it — /root/reference/src/browser.rs hands back a rendered page), so it
never faces raw bytes. A Spark-native crawler ingesting WARC/HTTP
payloads does: the step between `sources/warc.py` (which now yields
entity bytes, de-chunked and de-gzipped) and `sources/html_ingest.py`
(which wants str) is exactly this module.

Detection order (WHATWG HTML §13.2.3.2 "determining the character
encoding", the parts that matter without a full browser):

1. BOM — UTF-8 / UTF-16LE / UTF-16BE byte-order marks win over
   everything (and the BOM is stripped from the text).
2. Transport layer — the `charset=` parameter of the HTTP Content-Type.
3. Meta prescan — the first `prescan_bytes` (default 1024, the spec's
   figure) are scanned byte-wise for `<meta charset=...>` or
   `<meta http-equiv="content-type" content="...charset=...">`.
4. Fallback — UTF-8 (the modern-web default; the spec's locale-specific
   windows-125x defaults predate UTF-8 dominance).

Decoding NEVER fails: unknown/unsupported labels fall back to UTF-8 and
malformed byte sequences decode with U+FFFD replacement — a crawler
keeps degraded text rather than dropping a page. The common WHATWG
label aliases (latin1->windows-1252 per spec, shift_jis family, gbk)
are mapped explicitly; everything else goes through codecs.lookup.

Spark surface: `decode_payloads` — one Arrow-vectorized pandas UDF
(binary, string) -> struct<text,encoding>; per-batch Python, never
per-row Spark UDFs, and the payload column is pruned immediately after.
"""

from __future__ import annotations

import codecs
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# WHATWG encoding-label quirks: labels whose codecs.lookup name is NOT
# what browsers actually use. Per the Encoding Standard, the whole
# latin1/ascii family maps to windows-1252 (its 0x80-0x9F printables are
# what real pages mean).
_LABEL_OVERRIDES = {
    "latin1": "windows-1252", "latin-1": "windows-1252",
    "iso-8859-1": "windows-1252", "iso8859-1": "windows-1252",
    "us-ascii": "windows-1252", "ascii": "windows-1252",
    "shift-jis": "shift_jis", "sjis": "shift_jis", "x-sjis": "shift_jis",
    "gb2312": "gbk", "gb-2312": "gbk",
    "unicode-1-1-utf-8": "utf-8", "utf8": "utf-8",
}

_CHARSET_PARAM = re.compile(rb"""charset\s*=\s*["']?\s*([a-zA-Z0-9._:\-]+)""",
                            re.IGNORECASE)
_META_CHARSET = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9._:\-]+)""",
    re.IGNORECASE)


def _normalize_label(label: str) -> str | None:
    """Encoding label -> python codec name, None if unusable."""
    lab = label.strip().strip("\"'").lower()
    if not lab:
        return None
    lab = _LABEL_OVERRIDES.get(lab, lab)
    try:
        return codecs.lookup(lab).name
    except (LookupError, ValueError):
        return None


def sniff_encoding(payload: bytes, content_type: str | None = None,
                   prescan_bytes: int = 1024) -> str:
    """Detect the encoding of an HTML/text payload. Returns a python
    codec name; 'utf-8' when nothing declares otherwise."""
    if payload[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig"
    # UTF-16 BOMs before the LE check: FF FE / FE FF
    if payload[:2] == b"\xff\xfe":
        return "utf-16-le"
    if payload[:2] == b"\xfe\xff":
        return "utf-16-be"
    if content_type:
        m = _CHARSET_PARAM.search(content_type.encode("ascii", "ignore"))
        if m:
            enc = _normalize_label(m.group(1).decode("ascii", "ignore"))
            if enc:
                return enc
    head = payload[:prescan_bytes]
    m = _META_CHARSET.search(head)
    if m:
        enc = _normalize_label(m.group(1).decode("ascii", "ignore"))
        if enc:
            return enc
    return "utf-8"


def decode_payload(payload: bytes | None, content_type: str | None = None,
                   prescan_bytes: int = 1024) -> tuple[str, str]:
    """bytes -> (text, encoding-used). Never raises: unknown labels fall
    back to utf-8, malformed sequences become U+FFFD. A stripped BOM
    reports the base codec name (utf-8, utf-16-le/-be)."""
    if not payload:
        return "", "utf-8"
    enc = sniff_encoding(payload, content_type, prescan_bytes)
    text = payload.decode(enc, errors="replace")
    if enc in ("utf-16-le", "utf-16-be") and text[:1] == "\ufeff":
        text = text[1:]
    return text, "utf-8" if enc == "utf-8-sig" else enc


def gate_cases() -> list[tuple[str, bytes, str | None]]:
    """Deterministic (case_id, payload, content_type) vectors shared by
    the driver gate (q_charset_decode) and the golden generator
    (tools/gen_golden.py, which computes EXPECTED outputs independently
    — direct decode with the known-truth codec, no sniffing). Covers
    every rung of the detection ladder plus damage."""
    return [
        ("utf8_plain", "héllo wörld".encode("utf-8"), "text/html"),
        ("utf8_bom", b"\xef\xbb\xbf" + "héllo".encode("utf-8"), None),
        ("utf16le_bom", b"\xff\xfe" + "wide text".encode("utf-16-le"), None),
        ("utf16be_bom", b"\xfe\xff" + "wide text".encode("utf-16-be"), None),
        ("ctype_latin1", "caf\xe9 ni\xf1o".encode("cp1252"),
         "text/html; charset=ISO-8859-1"),
        ("meta_cp1251",
         ('<html><head><meta charset="windows-1251"></head>'
          "<body>привет мир</body></html>").encode("cp1251"), None),
        ("meta_httpequiv_sjis",
         ('<meta http-equiv="Content-Type" '
          'content="text/html; charset=Shift_JIS">'
          "日本語テキスト").encode("shift_jis"), "text/html"),
        ("bogus_label_damage", b"ok \xff\xfa broken",
         "text/html; charset=no-such-encoding"),
        ("empty", b"", "text/html"),
        ("meta_past_prescan",
         b"<html>" + b" " * 1100
         + '<meta charset="windows-1251">эю'.encode("cp1251"),
         None),
    ]


def decode_payloads(df: DataFrame, payload_col: str = "payload",
                    content_type_col: str = "content_type",
                    out_text: str = "text",
                    out_encoding: str = "encoding") -> DataFrame:
    """Spark stage: (payload binary, content_type string) -> + (text,
    encoding) columns via ONE Arrow-vectorized pandas UDF. Map-only —
    adds no Exchange; place it between the WARC scan and parse_html_docs
    and drop the payload column right after to keep shuffles thin."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType([
        StructField("t", StringType()),
        StructField("e", StringType()),
    ])

    @pandas_udf(schema)
    def dec(payloads: pd.Series, ctypes: pd.Series) -> pd.DataFrame:
        texts, encs = [], []
        for p, ct in zip(payloads, ctypes):
            t, e = decode_payload(bytes(p) if p is not None else None,
                                  ct if isinstance(ct, str) else None)
            texts.append(t)
            encs.append(e)
        return pd.DataFrame({"t": texts, "e": encs})

    tmp = dec(F.col(payload_col), F.col(content_type_col))
    return (
        df.withColumn("_dec", tmp)
        .withColumn(out_text, F.col("_dec.t"))
        .withColumn(out_encoding, F.col("_dec.e"))
        .drop("_dec")
    )
