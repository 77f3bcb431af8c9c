"""Span/tree analytics tests — ports of the reference's duplicate-detection,
filter, and find_by_path unit tests onto the flattened span model
(/root/reference/src/storage.rs:208-375, src/html_parser.rs:387-471)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from smartcrawler_spark.operators import spans as SP
from smartcrawler_spark.sources.corpus import Node, flatten

SPAN_SCHEMA = (
    "doc_id string, host string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
    "nodes array<struct<offset:int,tag:string,classes:array<string>,id:string,"
    "content:string,size:int,path:array<string>>>"
)


def page(doc_id: str, host: str, body_children: list[Node]) -> dict:
    tree = Node("html", children=[Node("body", children=body_children)])
    spans, nodes = flatten(tree)
    return {"doc_id": doc_id, "host": host, "spans": spans, "nodes": nodes}


def docs_df(spark, pages: list[dict]):
    return spark.createDataFrame(pages, SPAN_SCHEMA)


def nav(content="Navigation"):
    return Node("nav", classes=["navbar"], content=content)


def test_signature_equality_and_inequality():
    """Identical subtrees hash equal; any field change flips the hash
    (storage.rs:351-374)."""
    a = Node("div", classes=["x"], id="i", content="hello",
             children=[Node("p", content="c")])
    b = Node("div", classes=["x"], id="i", content="hello",
             children=[Node("p", content="c")])
    c = Node("div", classes=["x"], id="i", content="hello",
             children=[Node("p", content="DIFFERENT")])
    ha = SP.subtree_hashes(flatten(a)[1])
    hb = SP.subtree_hashes(flatten(b)[1])
    hc = SP.subtree_hashes(flatten(c)[1])
    assert ha == hb
    assert ha[0] != hc[0]  # root signature differs (descendant changed)
    assert ha[0] != ha[1]  # parent vs child differ


def test_domain_duplicates_nav_shared(spark):
    """Two pages share nav; contents differ → nav sig duplicated, content
    sigs not (storage.rs:277-310)."""
    p1 = page("u1", "h", [nav(), Node("div", classes=["content"], content="Main one")])
    p2 = page("u2", "h", [nav(), Node("div", classes=["content"], content="Main two")])
    dups = SP.domain_duplicates(docs_df(spark, [p1, p2])).collect()
    nav_sig = SP.subtree_hashes(flatten(nav())[1])[0]
    got = {(r["host"], r["sig"]): r["n"] for r in dups}
    assert got.get(("h", nav_sig)) == 2
    # content divs are unique → absent
    assert all(sig == nav_sig for (_, sig) in got)


def test_occurrence_semantics_same_page_twice(spark):
    """A signature appearing TWICE ON ONE PAGE qualifies, provided the host
    has >= 2 SUCCESS pages (storage.rs:130-148 occurrence counting)."""
    twice = [Node("span", classes=["badge"], content="hot"),
             Node("span", classes=["badge"], content="hot")]
    p1 = page("u1", "h", twice + [Node("div", content="unique A")])
    p2 = page("u2", "h", [Node("div", content="unique B")])
    dups = SP.domain_duplicates(docs_df(spark, [p1, p2])).collect()
    badge_sig = SP.subtree_hashes(flatten(Node("span", classes=["badge"], content="hot"))[1])[0]
    got = {r["sig"]: r["n"] for r in dups}
    assert got.get(badge_sig) == 2


def test_two_page_guard(spark):
    """< 2 pages per host → no duplicates at all (storage.rs:126-128)."""
    twice = [nav(), nav()]
    p1 = page("u1", "solo", twice)
    assert SP.domain_duplicates(docs_df(spark, [p1])).count() == 0


def test_structural_tags_never_counted(spark):
    """html/body etc. shared across pages do NOT become duplicates
    (storage.rs:167-172)."""
    p1 = page("u1", "h", [Node("div", content="A")])
    p2 = page("u2", "h", [Node("div", content="B")])
    dups = SP.domain_duplicates(docs_df(spark, [p1, p2])).collect()
    assert dups == []  # html+body identical across pages but structural


def test_mark_duplicates_structure_preserved(spark):
    """Dup node text → '[FILTERED DUPLICATE]'; everything else (incl. kind,
    media_ref, offsets, order) unchanged (html_parser.rs:388-414)."""
    p1 = page("u1", "h", [nav(), Node("div", classes=["content"], content="Main content"),
                          Node("img", classes=["asset"], media_ref="https://cdn/x.jpg")])
    p2 = page("u2", "h", [nav(), Node("div", classes=["content"], content="Other")])
    df = docs_df(spark, [p1, p2])
    dups = SP.domain_duplicates(df)
    marked = SP.mark_duplicates(df, dups)
    row = {r["doc_id"]: r for r in marked.collect()}["u1"]
    texts = [(s["kind"], s["text"], s["media_ref"]) for s in row["spans"]]
    assert ("nav", "[FILTERED DUPLICATE]", "") in texts
    assert ("div", "Main content", "") in texts
    assert ("media", "", "https://cdn/x.jpg") in texts
    # offsets and order preserved vs original
    orig = [s["offset"] for s in p1["spans"]]
    assert [s["offset"] for s in row["spans"]] == orig


def test_find_by_path_reference_golden(spark):
    """Nested-table golden (html_parser.rs:426-471): 2 hits at the deep
    path, 1 at 'html body', 0 at nonexistent."""
    inner_rows = [
        Node("tr", classes=["athing", "submission"],
             children=[Node("td", classes=["title"], content="First Item")]),
        Node("tr", classes=["athing", "submission"],
             children=[Node("td", classes=["title"], content="Second Item")]),
    ]
    tree_body = [
        Node("center", children=[
            Node("table", children=[
                Node("tbody", children=[
                    Node("tr", children=[
                        Node("td", children=[
                            Node("table", children=[Node("tbody", children=inner_rows)])
                        ])
                    ])
                ])
            ])
        ])
    ]
    df = docs_df(spark, [page("u1", "h", tree_body)])

    deep = "html body center table tbody tr td table tbody tr.athing.submission td.title"
    hits = SP.find_by_path(df, deep).orderBy("offset").collect()
    assert [(r["content"], r["multiplicity"]) for r in hits] == [
        ("First Item", 1), ("Second Item", 1)
    ]
    assert SP.find_by_path(df, "html body").count() == 1
    assert SP.find_by_path(df, "html body div.nonexistent").count() == 0


def test_find_by_path_multiplicity():
    """Multiple ancestor embeddings → reference pushes the node once per
    embedding; our multiplicity counts them exactly."""
    # ancestors: html body div div; parts: div span → two embeddings
    path = ["html", "body", "div", "div", "span"]
    parts = [SP._parse_part(p) for p in "div span".split()]
    assert SP.path_match_count(path, parts) == 2
    assert SP.path_match_count(path, [SP._parse_part("span")]) == 1
    assert SP.path_match_count(path, parts + [SP._parse_part("b")]) == 0


def test_part_matching_semantics():
    """matches_path_part golden (html_parser.rs:473-495)."""
    node_comp = "tr.athing.submission"
    for part, want in [
        ("tr.athing.submission", True), ("tr.athing", True), ("tr", True),
        ("td.athing", False), ("tr.nonexistent", False),
    ]:
        assert SP._comp_matches(node_comp, SP._parse_part(part)) is want


def test_extract_template_paths(spark):
    p1 = page("u1", "h", [Node("div", classes=["comments"], content="42 comments"),
                          Node("div", classes=["other"], content="Just some text")])
    p2 = page("u2", "h", [Node("div", classes=["comments"], content="16 comments")])
    got = SP.extract_template_paths(docs_df(spark, [p1, p2])).collect()
    # both pages produce the SAME (path, pattern) → distinct keeps one row
    assert len(got) == 1
    assert got[0]["pattern"] == "{count} comments"
    assert list(got[0]["path"]) == ["html", "body", "div.comments"]


def test_corpus_listing_golden_count(spark, tmp_path):
    """Synthetic-corpus analog of the HN 'exactly 30 at fixed path' golden
    (tests/real_world_tests.rs:252-264): every page has exactly
    listing_rows hits at the listing path."""
    from smartcrawler_spark.sources.corpus import CorpusConfig, generate_corpus

    d = str(tmp_path / "c")
    generate_corpus(d, CorpusConfig(n_hosts=2, pages_per_host=3, hot_host_pages=3,
                                    listing_rows=4))
    docs = spark.read.parquet(f"{d}/documents.parquet")
    hits = SP.find_by_path(docs, "table tbody tr.athing.submission td.title")
    per_doc = hits.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    assert len(per_doc) == docs.count()
    assert all(r["n"] == 4 for r in per_doc)


def test_find_title(spark):
    p = page("u1", "h", [Node("div", content="x")])
    # corpus pages put title under head; build one manually
    tree = Node("html", children=[
        Node("head", children=[Node("title", content="My Title")]),
        Node("body", children=[Node("div", content="x")]),
    ])
    spans, nodes = flatten(tree)
    df = docs_df(spark, [{"doc_id": "u", "host": "h", "spans": spans, "nodes": nodes}, p])
    got = {r["doc_id"]: r["t"] for r in df.select("doc_id", SP.find_title(df).alias("t")).collect()}
    assert got["u"] == "My Title"
    assert got["u1"] is None
