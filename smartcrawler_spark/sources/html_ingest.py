"""Raw HTML -> interleaved span documents (T1 ingest path).

The synthetic corpus ships pre-decomposed spans, but a user migrating from
the reference has raw HTML. This module re-expresses the reference parser's
rules (/root/reference/src/html_parser.rs:109-203) over stdlib
html.parser — no external parsing deps — and flattens with the same
pre-order rules as sources.corpus.flatten:

* ignored tags (script/style/noscript/svg/path/img/video/audio/canvas/
  embed/object/iframe) parse to EMPTY nodes -> pruned as blank by the
  parent (html_parser.rs:114-126,147-149) — except that our span model
  RE-ADMITS media tags (img/video/audio) as kind='media' spans with the
  src attr as media_ref (the interleaved-payload extension; the pure
  reference drops them);
* class attr split on whitespace; id trimmed, empty -> None
  (html_parser.rs:177-194);
* content only on nodes with no surviving element children, as the cleaned
  concatenation of ALL descendant text (html_parser.rs:166-170,196-198);
* blank nodes (no content, no children, no media payload) pruned
  (html_parser.rs:200-202).

Engine surface: `parse_html_docs` — an Arrow `mapInPandas` stage turning
(doc_id, html) rows into the standard (doc_id, host, spans, nodes) layout,
batch-streamed so raw HTML bodies never accumulate in one task.
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser

from ..functions.urls import _canon_one
from .corpus import MEDIA_TAGS, Node, flatten

IGNORED_TAGS = {
    "script", "style", "noscript", "svg", "path", "img", "video", "audio",
    "canvas", "embed", "object", "iframe",
}
_VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
}


class _Elem:
    __slots__ = ("tag", "attrs", "kids")

    def __init__(self, tag: str, attrs: list[tuple[str, str | None]]):
        self.tag = tag
        self.attrs = dict(attrs)
        self.kids: list["_Elem | str"] = []


# Real-web guard: pathological/malicious nesting must not blow the Python
# recursion limit in _to_node/flatten (browsers cap similarly — Blink at
# 512). Elements past the cap attach as siblings at the cap depth: degraded
# structure, never a crash.
MAX_TREE_DEPTH = 256


# HTML5 implied-end-tag recovery (the subset that matters on real pages):
# opening one of these tags first closes a still-open same-group tag at the
# top of the stack — so `<li>one<li>two` yields SIBLING <li>s like
# html5ever, instead of nesting (which would demote the outer text to mixed
# content the flatten rule then drops). Top-of-stack only — html5ever's
# full list-scope search can close through intervening containers; that
# residual divergence is documented in tests/test_tag_soup.py.
_IMPLIED_END = {
    "li": ("li",), "p": ("p",), "tr": ("tr", "td", "th"),
    "td": ("td", "th"), "th": ("td", "th"),
    "dt": ("dt", "dd"), "dd": ("dt", "dd"), "option": ("option",),
}
# block-level starts that auto-close an open <p> (HTML5 8.2.5.4.7 subset)
_P_CLOSERS = {"p", "div", "ul", "ol", "table", "section", "article", "nav",
              "blockquote", "pre", "h1", "h2", "h3", "h4", "h5", "h6", "li"}


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Elem("#document", [])
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        closers = _IMPLIED_END.get(tag, ())
        while len(self.stack) > 1 and (
            self.stack[-1].tag in closers
            or (tag in _P_CLOSERS and self.stack[-1].tag == "p")
        ):
            self.stack.pop()
        el = _Elem(tag, attrs)
        self.stack[-1].kids.append(el)
        if tag not in _VOID_TAGS and len(self.stack) < MAX_TREE_DEPTH:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].kids.append(_Elem(tag, attrs))

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # unmatched close tag: ignore (tag-soup tolerance)

    def handle_data(self, data):
        if data:
            self.stack[-1].kids.append(data)


def _find(el: _Elem, tag: str) -> _Elem | None:
    for k in el.kids:
        if isinstance(k, _Elem):
            if k.tag == tag:
                return k
            hit = _find(k, tag)
            if hit is not None:
                return hit
    return None


def _all_text(el: _Elem) -> list[str]:
    out = []
    for k in el.kids:
        if isinstance(k, str):
            out.append(k)
        elif k.tag not in IGNORED_TAGS:
            out.extend(_all_text(k))
    return out


def _clean(text: str) -> str:
    return " ".join(text.split())


def _to_node(el: _Elem) -> Node:
    tag = el.tag
    if tag in IGNORED_TAGS:
        if tag in MEDIA_TAGS:  # span-model extension: keep media payloads
            src = (el.attrs.get("src") or "").strip()
            return Node(tag, classes=[], id=None, content="", media_ref=src)
        return Node(tag)  # empty -> pruned as blank by the parent

    classes = [c for c in (el.attrs.get("class") or "").split() if c]
    node_id = (el.attrs.get("id") or "").strip() or None
    media_ref = ""
    if tag == "a":
        media_ref = (el.attrs.get("href") or "").strip()

    children = []
    for k in el.kids:
        if isinstance(k, _Elem):
            child = _to_node(k)
            if not _is_blank(child):
                children.append(child)

    content = ""
    if not children:
        content = _clean(" ".join(_all_text(el)))
    return Node(tag, classes=classes, id=node_id, content=content,
                media_ref=media_ref, children=children)


def _is_blank(n: Node) -> bool:
    return (not n.content.strip()) and not n.children and not n.media_ref


def parse_html(html: str) -> Node:
    """HTML string -> reference-shaped Node tree. Root resolution mirrors
    the reference (html_parser.rs:128-142) — <html> element, else <body> —
    with one addition: bare fragments are wrapped in a synthetic
    html>body, matching html5ever's fragment coercion (the reference's
    parser does this implicitly, so `<div>x</div>` is parseable there)."""
    tb = _TreeBuilder()
    tb.feed(html or "")
    tb.close()
    root = _find(tb.root, "html")
    if root is not None:
        return _to_node(root)
    body = _find(tb.root, "body")
    if body is None and tb.root.kids:
        body = _Elem("body", [])
        body.kids = tb.root.kids
        wrapper = _Elem("html", [])
        wrapper.kids = [body]
        return _to_node(wrapper)
    if body is None:
        return Node("html")
    return _to_node(body)


def html_to_spans(html: str) -> tuple[list[dict], list[dict]]:
    """HTML -> (spans, nodes) in the engine's flattened layout."""
    return flatten(parse_html(html))


def extract_links(html: str, base_domain: str,
                  respect_nofollow: bool = False) -> list[str]:
    """Reference extract_links (html_parser.rs:231-247): a[href] resolved
    and same-domain filtered, deduplicated. Deterministic order (sorted —
    the reference returns HashSet order).

    `respect_nofollow=True` additionally honors REP link-level opt-outs
    (default OFF = reference parity; the reference follows every href):
    anchors whose rel contains `nofollow`/`ugc`/`sponsored` are skipped,
    and a page-level robots-meta nofollow drops ALL links."""
    from ..oracle import resolve_href, same_domain

    skip: set[str] = set()
    if respect_nofollow:
        d = page_directives(html)
        if d["nofollow"]:
            return []
        skip = set(d["nofollow_hrefs"])
    spans, _ = html_to_spans(html)
    out = set()
    for s in spans:
        if s["kind"] == "a" and s["media_ref"]:
            if respect_nofollow and s["media_ref"] in skip:
                continue
            url = resolve_href(s["media_ref"], base_domain)
            if same_domain(url, base_domain):
                out.add(url)
    return sorted(out)


# -- page-level crawl directives (robots meta / rel=nofollow / canonical) ----

_NOFOLLOW_RELS = {"nofollow", "ugc", "sponsored"}


def page_directives(html: str) -> dict:
    """Robots Exclusion Protocol page-level directives + canonicalization
    hints the reference never sees (its browser-driven fetch ignores
    them), extracted in ONE tree walk:

    * robots meta (`<meta name="robots" content="...">`): `noindex` /
      `nofollow` flags; `none` implies both (Google/Bing semantics).
      Agent-specific metas (name="googlebot") are ignored — this engine
      models the generic agent, matching its robots.txt default.
    * `<link rel="canonical" href=...>` — first one wins (browser rule).
    * `<base href=...>` — first one wins; surfaced for the caller,
      NOT applied to link resolution (the reference resolves against the
      page domain only — html_parser.rs:231-247 — and span-sequence
      parity pins that behavior).
    * per-anchor rel=nofollow/ugc/sponsored (the 2019 REP extensions) —
      raw hrefs, for link-graph weighting or admission filtering.

    Returns {noindex, nofollow, canonical, base_href, nofollow_hrefs}.
    """
    tb = _TreeBuilder()
    tb.feed(html or "")
    tb.close()
    out = {"noindex": False, "nofollow": False, "canonical": "",
           "base_href": "", "nofollow_hrefs": []}
    seen_hrefs = set()

    def walk(el: _Elem):
        for k in el.kids:
            if not isinstance(k, _Elem):
                continue
            tag = k.tag
            if tag == "meta":
                name = (k.attrs.get("name") or "").strip().lower()
                if name == "robots":
                    toks = {
                        t.strip().lower()
                        for t in (k.attrs.get("content") or "").replace(
                            ",", " ").split()
                    }
                    if "none" in toks:
                        toks |= {"noindex", "nofollow"}
                    out["noindex"] |= "noindex" in toks
                    out["nofollow"] |= "nofollow" in toks
            elif tag == "link":
                rels = {(r or "").lower()
                        for r in (k.attrs.get("rel") or "").split()}
                if "canonical" in rels and not out["canonical"]:
                    out["canonical"] = (k.attrs.get("href") or "").strip()
            elif tag == "base":
                if not out["base_href"]:
                    out["base_href"] = (k.attrs.get("href") or "").strip()
            elif tag == "a":
                rels = {(r or "").lower()
                        for r in (k.attrs.get("rel") or "").split()}
                href = (k.attrs.get("href") or "").strip()
                if href and rels & _NOFOLLOW_RELS and href not in seen_hrefs:
                    seen_hrefs.add(href)
                    out["nofollow_hrefs"].append(href)
            walk(k)

    walk(tb.root)
    return out


DIRECTIVES_SCHEMA = (
    "doc_id string, noindex boolean, nofollow boolean, canonical string, "
    "base_href string, n_nofollow_links int"
)


def extract_directives_docs(df, doc_id_col: str = "doc_id",
                            html_col: str = "html"):
    """(doc_id, html) DataFrame -> one directives row per page via Arrow
    mapInPandas (map-only, no Exchange — same stage shape as
    parse_html_docs; run both in one pass over the raw HTML scan and the
    source is read once). Downstream uses: noindex pages drop out of the
    export corpus; canonical feeds `linkgraph.resolve_redirects` as alias
    edges; n_nofollow_links feeds host-quality features."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for doc_id, html in zip(pdf[doc_id_col], pdf[html_col]):
                d = page_directives(html if isinstance(html, str) else "")
                rows.append({
                    "doc_id": "" if doc_id is None else str(doc_id),
                    "noindex": d["noindex"], "nofollow": d["nofollow"],
                    "canonical": d["canonical"],
                    "base_href": d["base_href"],
                    "n_nofollow_links": len(d["nofollow_hrefs"]),
                })
            yield pd.DataFrame(rows, columns=[
                "doc_id", "noindex", "nofollow", "canonical", "base_href",
                "n_nofollow_links"])

    return df.mapInPandas(gen, DIRECTIVES_SCHEMA)


SPAN_DOC_SCHEMA = (
    "doc_id string, host string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
    "nodes array<struct<offset:int,tag:string,classes:array<string>,id:string,"
    "content:string,size:int,path:array<string>>>"
)


def parse_html_docs(df, doc_id_col: str = "doc_id", html_col: str = "html"):
    """(doc_id, html) DataFrame -> (doc_id, host, spans, nodes) via Arrow
    mapInPandas (batch-streamed; raw HTML never collected)."""
    import pandas as pd

    from ..oracle import host_of

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for doc_id, html in zip(pdf[doc_id_col], pdf[html_col]):
                spans, nodes = html_to_spans(html if isinstance(html, str) else "")
                # doc ids are usually URLs; tolerate numeric/None ids (canon
                # passes non-URL strings through, host becomes "")
                doc_id = "" if doc_id is None else str(doc_id)
                canon = _canon_one(doc_id) or doc_id
                rows.append({"doc_id": canon, "host": host_of(canon),
                             "spans": spans, "nodes": nodes})
            yield pd.DataFrame(rows, columns=["doc_id", "host", "spans", "nodes"])

    return df.mapInPandas(gen, SPAN_DOC_SCHEMA)
