"""Raw-HTML ingest: verbatim ports of the reference parser's 12 unit tests
(/root/reference/src/html_parser.rs:277-424) onto parse_html/html_to_spans,
plus the mapInPandas engine surface."""

from __future__ import annotations

import pytest

from smartcrawler_spark.sources.html_ingest import (
    extract_links,
    html_to_spans,
    parse_html,
    parse_html_docs,
)


def test_parser_basic():
    node = parse_html("<html><body><h1>Title</h1><p>Content</p></body></html>")
    assert node.tag == "html"
    assert len(node.children) == 1
    body = node.children[0]
    assert body.tag == "body"
    assert [c.tag for c in body.children] == ["h1", "p"]
    assert body.children[0].content == "Title"
    assert body.children[1].content == "Content"


def test_parser_ignores_scripts():
    node = parse_html(
        "<html><body><script>alert('test');</script><p>Content</p></body></html>"
    )
    body = node.children[0]
    assert [c.tag for c in body.children] == ["p"]


def test_parser_classes_and_ids():
    node = parse_html(
        '<html><body><div class="container main" id="content">Text</div></body></html>'
    )
    div = node.children[0].children[0]
    assert div.tag == "div"
    assert div.classes == ["container", "main"]
    assert div.id == "content"
    assert div.content == "Text"


def test_parser_preserves_numeric_ids():
    node = parse_html('<html><body><div id="123">Text</div></body></html>')
    assert node.children[0].children[0].id == "123"


def test_parser_sibling_structure():
    node = parse_html(
        "<html><body><p>First</p><p>Second</p><div>Different</div></body></html>"
    )
    assert len(node.children[0].children) == 3


def test_parser_blank_nodes_pruned():
    node = parse_html("<html><body><div></div><p>Content</p></body></html>")
    body = node.children[0]
    assert [c.tag for c in body.children] == ["p"]


def test_find_title_via_spans():
    spans, _ = html_to_spans(
        "<html><head><title>Page Title</title></head><body>Content</body></html>"
    )
    titles = [s for s in spans if s["kind"] == "title"]
    assert titles and titles[0]["text"] == "Page Title"


def test_media_spans_kept_with_refs():
    """Span-model extension: media tags (dropped by the reference) become
    kind='media' spans with the asset URL."""
    spans, _ = html_to_spans(
        '<html><body><p>a</p><img src="https://cdn/x.jpg"><p>b</p></body></html>'
    )
    kinds = [(s["kind"], s["media_ref"]) for s in spans]
    assert ("media", "https://cdn/x.jpg") in kinds
    # interleaving preserved: media sits between the text spans
    order = [s["kind"] for s in sorted(spans, key=lambda s: s["offset"])]
    assert order == ["p", "media", "p"]


def test_extract_links_reference_golden():
    html = """<html><body>
        <a href="/page1">Link 1</a>
        <a href="https://example.com/page2">Link 2</a>
        <a href="https://other.com/page3">External Link</a>
        <a href="//example.com/page4">Protocol-relative</a>
    </body></html>"""
    links = extract_links(html, "example.com")
    assert "https://example.com/page1" in links
    assert "https://example.com/page2" in links
    assert any("page4" in x for x in links)
    assert not any("other.com/page3" in x for x in links)


def test_no_html_element_falls_back():
    assert parse_html("plain text, no tags").tag == "html"
    node = parse_html("<body><p>x</p></body>")
    assert node.tag == "body"


def test_roundtrip_vs_corpus_flatten():
    """A tree built by the generator and re-rendered as HTML parses back to
    span-sequence-equal output (the per-row invariant)."""
    html = (
        '<html><head><title>t</title></head><body>'
        '<nav class="navbar"><a class="nav-link" href="/">Home</a></nav>'
        '<div class="content"><div class="post" id="p1">42 comments</div></div>'
        "</body></html>"
    )
    spans1, nodes1 = html_to_spans(html)
    spans2, nodes2 = html_to_spans(html)
    assert spans1 == spans2 and nodes1 == nodes2
    assert [n["tag"] for n in nodes1[:3]] == ["html", "head", "title"]
    # paths usable by find_by_path
    post = [n for n in nodes1 if n["id"] == "p1"][0]
    assert post["path"] == ["html", "body", "div.content", "div.post"]


def test_parse_html_docs_engine_surface(spark):
    rows = [
        ("HTTP://Example.COM/a", "<html><body><p>A</p><a href='/x'>x</a></body></html>"),
        ("https://example.com/b", "<html><body><div class='c'>B</div></body></html>"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, html string")
    out = parse_html_docs(df).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert set(by_id) == {"http://example.com/a", "https://example.com/b"}
    a = by_id["http://example.com/a"]
    assert a["host"] == "example.com"
    kinds = [s["kind"] for s in a["spans"]]
    assert "p" in kinds and "a" in kinds

    # the parsed docs feed the span analytics directly
    from smartcrawler_spark.operators import spans as SP

    parsed = parse_html_docs(df)
    assert SP.find_by_path(parsed, "html body div.c").count() == 1


# -- page directives (robots meta / nofollow / canonical / base) ------------


def test_page_directives_extraction():
    from smartcrawler_spark.sources.html_ingest import page_directives

    html = """
    <html><head>
      <meta name="robots" content="NOINDEX, nofollow">
      <meta name="googlebot" content="noarchive">
      <link rel="canonical" href="https://ex.com/canon">
      <link rel="canonical" href="https://ex.com/second-ignored">
      <base href="https://ex.com/sub/">
    </head><body>
      <a href="/a" rel="nofollow">n</a>
      <a href="/b" rel="ugc">u</a>
      <a href="/c" rel="sponsored noopener">s</a>
      <a href="/d" rel="noopener">follow-me</a>
      <a href="/e">plain</a>
      <a href="/a" rel="nofollow">dup</a>
    </body></html>"""
    d = page_directives(html)
    assert d["noindex"] and d["nofollow"]
    assert d["canonical"] == "https://ex.com/canon"
    assert d["base_href"] == "https://ex.com/sub/"
    assert d["nofollow_hrefs"] == ["/a", "/b", "/c"]


def test_page_directives_none_token_and_defaults():
    from smartcrawler_spark.sources.html_ingest import page_directives

    d = page_directives('<meta name="robots" content="none">')
    assert d["noindex"] and d["nofollow"]
    d = page_directives("<html><body><p>plain</p></body></html>")
    assert d == {"noindex": False, "nofollow": False, "canonical": "",
                 "base_href": "", "nofollow_hrefs": []}
    # agent-specific metas and garbage never flip the generic flags
    d = page_directives('<meta name="googlebot" content="noindex">'
                        '<meta content="noindex"><meta name="robots">')
    assert not d["noindex"] and not d["nofollow"]
    assert page_directives("")["nofollow_hrefs"] == []
    assert page_directives("<a rel=nofollow>no href</a>")["nofollow_hrefs"] == []


def test_extract_links_respect_nofollow():
    from smartcrawler_spark.sources.html_ingest import extract_links

    html = ('<html><body>'
            '<a href="https://ex.com/keep">k</a>'
            '<a href="https://ex.com/skip" rel="nofollow">s</a>'
            '<a href="https://other.com/x">offsite</a>'
            '</body></html>')
    # default = reference parity: nofollow is followed
    assert extract_links(html, "ex.com") == [
        "https://ex.com/keep", "https://ex.com/skip"]
    assert extract_links(html, "ex.com", respect_nofollow=True) == [
        "https://ex.com/keep"]
    # page-level nofollow drops everything
    page_nf = '<meta name="robots" content="nofollow">' + html
    assert extract_links(page_nf, "ex.com", respect_nofollow=True) == []
    assert extract_links(page_nf, "ex.com") == [
        "https://ex.com/keep", "https://ex.com/skip"]


def test_extract_directives_docs_spark_stage(spark):
    from smartcrawler_spark.sources.html_ingest import extract_directives_docs

    rows = [
        ("u1", '<meta name="robots" content="noindex">'
               '<a href="/x" rel="nofollow">x</a>'),
        ("u2", '<link rel="canonical" href="https://c.ex.com/p">ok'),
        ("u3", None),
    ]
    df = spark.createDataFrame(rows, "doc_id string, html string")
    got = {r["doc_id"]: r.asDict() for r in extract_directives_docs(df).collect()}
    assert got["u1"]["noindex"] and not got["u1"]["nofollow"]
    assert got["u1"]["n_nofollow_links"] == 1
    assert got["u2"]["canonical"] == "https://c.ex.com/p"
    assert not got["u3"]["noindex"] and got["u3"]["n_nofollow_links"] == 0
