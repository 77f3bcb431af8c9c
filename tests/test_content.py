"""Main-content extraction (operators/content.py) vs a pure-python
oracle implementing the same spec over sources.corpus.flatten output."""

from __future__ import annotations

from smartcrawler_spark.operators import content as C
from smartcrawler_spark.sources.corpus import Node, flatten
from smartcrawler_spark.sources.html_ingest import parse_html

SPAN_SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
    "nodes array<struct<offset:int,tag:string,classes:array<string>,id:string,"
    "content:string,size:int,path:array<string>>>"
)


def _words(s):
    return [w for w in (s or "").split() if w]


def _oracle(nodes, block_tags=C.BLOCK_TAGS, boiler_tags=C.BOILER_TAGS,
            min_words=5, max_link_ppt=330):
    out = []
    for i, nd in enumerate(nodes):
        if nd["tag"] not in block_tags:
            continue
        sub = nodes[i:i + nd["size"]]
        if any(d["tag"] in block_tags for d in sub[1:]):
            continue  # not innermost
        n_words = sum(len(_words(d["content"])) for d in sub)
        link = sum(
            len(_words(d["content"])) for d in sub
            if any(c.split(".")[0] == "a" for c in d["path"])
        )
        ppt = (1000 * link) // n_words if n_words else 1000
        boiler = any(c.split(".")[0] in boiler_tags for c in nd["path"])
        out.append({
            "offset": nd["offset"], "tag": nd["tag"], "n_words": n_words,
            "n_link_words": link, "link_ppt": ppt, "boiler": boiler,
            "is_content": (not boiler and n_words >= min_words
                           and ppt <= max_link_ppt),
        })
    return out


HTML = """
<html><body>
<nav><ul><li><a href="/">Home page</a></li><li><a href="/a">About this site</a></li></ul></nav>
<article>
  <h1>A fine headline about engines</h1>
  <p>This is the first real paragraph of the article body with plenty of words.</p>
  <p>Second paragraph also has enough words to pass the minimum easily.</p>
  <p>Tiny.</p>
  <p><a href="/x">only link text</a> <a href="/y">and more link text here</a></p>
  <ul><li>A list item with a reasonable number of plain words inside it</li></ul>
</article>
<footer><p>Copyright words words words words words words reserved</p></footer>
</body></html>
"""


def _df(spark, html_pages):
    rows = []
    for i, h in enumerate(html_pages):
        spans, nodes = flatten(parse_html(h))
        rows.append({"doc_id": f"d{i}", "spans": spans, "nodes": nodes})
    return spark.createDataFrame(rows, SPAN_SCHEMA), rows


def test_block_profile_matches_oracle_on_real_html(spark):
    df, rows = _df(spark, [HTML])
    got = sorted(
        (r["offset"], r["tag"], r["n_words"], r["n_link_words"],
         r["link_ppt"], r["boiler"], r["is_content"])
        for r in C.block_profile(df).collect()
    )
    _, nodes = flatten(parse_html(HTML))
    want = sorted(
        (o["offset"], o["tag"], o["n_words"], o["n_link_words"],
         o["link_ppt"], o["boiler"], o["is_content"])
        for o in _oracle(nodes)
    )
    assert got == want
    # the shape we care about: chrome excluded, dense prose kept
    by_tag = {(r["tag"], r["offset"]): r for r in C.block_profile(df).collect()}
    assert any(r["is_content"] for r in by_tag.values())
    assert all(not r["is_content"] for r in by_tag.values()
               if r["boiler"])                      # nav/footer never content
    assert all(r["link_ppt"] == 1000 for r in by_tag.values()
               if r["tag"] == "li" and r["boiler"])  # nav items pure links


def test_main_text_concatenates_content_blocks_in_order(spark):
    df, _ = _df(spark, [HTML])
    row = C.main_text(df).collect()[0]
    _, nodes = flatten(parse_html(HTML))
    want_blocks = [o for o in _oracle(nodes) if o["is_content"]]
    assert row["n_content_blocks"] == len(want_blocks)
    assert row["n_blocks"] == len(_oracle(nodes))
    # document order, headline first, link-soup and chrome absent
    assert row["main_text"].startswith("A fine headline about engines")
    assert "first real paragraph" in row["main_text"]
    assert "Copyright" not in row["main_text"]
    assert "Home page" not in row["main_text"]
    assert "only link text" not in row["main_text"]


def test_nested_blocks_innermost_only(spark):
    # td inside li: only the td (innermost) is a block; the li wrapper is
    # not profiled, so its words are never double-counted
    tree = Node("html", children=[Node("body", children=[
        Node("ul", children=[Node("li", children=[
            Node("table", children=[Node("tr", children=[
                Node("td", content="six plain words sit right here"),
            ])]),
        ])]),
    ])])
    spans, nodes = flatten(tree)
    df = spark.createDataFrame(
        [{"doc_id": "d", "spans": spans, "nodes": nodes}], SPAN_SCHEMA)
    rows = C.block_profile(df).collect()
    assert [r["tag"] for r in rows] == ["td"]
    assert rows[0]["n_words"] == 6 and rows[0]["is_content"]
    got = [(r["tag"], r["n_words"], r["is_content"]) for r in rows]
    want = [(o["tag"], o["n_words"], o["is_content"])
            for o in _oracle(nodes)]
    assert got == want


def test_empty_and_degenerate_docs(spark):
    df = spark.createDataFrame(
        [{"doc_id": "empty", "spans": [], "nodes": []}], SPAN_SCHEMA)
    assert C.block_profile(df).count() == 0
    out = C.main_text(df).collect()[0]
    assert out["main_text"] == "" and out["n_blocks"] == 0


def test_configurable_tag_sets(spark):
    tree = Node("html", children=[Node("body", children=[
        Node("section", children=[
            Node("div", content="five words of div text"),
        ]),
    ])])
    spans, nodes = flatten(tree)
    df = spark.createDataFrame(
        [{"doc_id": "d", "spans": spans, "nodes": nodes}], SPAN_SCHEMA)
    # div not a block by default...
    assert C.block_profile(df).count() == 0
    # ...but configurable in
    rows = C.block_profile(df, block_tags=("div",), min_words=3).collect()
    assert [r["tag"] for r in rows] == ["div"] and rows[0]["is_content"]
    # and boiler_tags override: section marked chrome kills it
    rows = C.block_profile(df, block_tags=("div",),
                           boiler_tags=("section",)).collect()
    assert rows[0]["boiler"] and not rows[0]["is_content"]


def test_block_profile_fuzz_random_trees(spark):
    """Seeded structured-random trees (nested blocks, chrome wrappers,
    anchors, empty/whitespace content, classed tags): the JVM HOF plan
    must equal the python oracle on every block of every doc — one Spark
    job for the whole corpus, test_fuzz.py style."""
    import random

    rng = random.Random(20260818)
    TAGS = ["p", "li", "td", "div", "span", "nav", "footer", "a", "ul",
            "section", "h2", "pre"]
    WORDS = ["alpha", "beta", "gamma", "delta", "link", "text", "words"]

    def rand_tree(depth=0):
        tag = rng.choice(TAGS)
        n_children = 0 if depth >= 4 else rng.randrange(0, 4)
        children = [rand_tree(depth + 1) for _ in range(n_children)]
        content = ""
        if not children and rng.random() < 0.8:
            content = " ".join(rng.choices(WORDS, k=rng.randrange(0, 9)))
            if rng.random() < 0.1:
                content = "   "  # whitespace-only
        classes = rng.choices(["c1", "c2"], k=rng.randrange(0, 2))
        return Node(tag, classes=classes, content=content, children=children)

    pages = []
    for i in range(60):
        tree = Node("html", children=[Node("body", children=[rand_tree()])])
        spans, nodes = flatten(tree)
        pages.append({"doc_id": f"f{i:03d}", "spans": spans, "nodes": nodes})
    df = spark.createDataFrame(pages, SPAN_SCHEMA)
    got = sorted(
        (r["doc_id"], r["offset"], r["tag"], r["n_words"], r["n_link_words"],
         r["link_ppt"], r["boiler"], r["is_content"])
        for r in C.block_profile(df).collect()
    )
    want = sorted(
        (p["doc_id"], o["offset"], o["tag"], o["n_words"], o["n_link_words"],
         o["link_ppt"], o["boiler"], o["is_content"])
        for p in pages for o in _oracle(p["nodes"])
    )
    assert got == want and len(want) > 50
