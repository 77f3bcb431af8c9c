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
