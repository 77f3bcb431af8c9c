"""Deterministic synthetic web corpus of interleaved text+media span documents.

Replaces the reference's network fetch (WebDriver, /root/reference/src/browser.rs:52-84)
with a scan of a pre-decomposed document table, per BASELINE.json:input_hint:

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string, media_ref:string, offset:int>>)

`spans` is the canonical interleaved payload (offset = pre-order traversal
index of the originating HTML node; kind = leaf tag name, 'a' for anchors
with media_ref=href, 'media' for img/video/audio with media_ref=asset URL,
mirroring how the reference's parser walks trees —
/root/reference/src/html_parser.rs:128-175 — except media tags are KEPT as
spans instead of dropped, /root/reference/src/html_parser.rs:116-123).

A companion `nodes` column carries the full flattened tree (every node in
pre-order with tag/classes/id/content/subtree-size/path) so the structural
analytics (duplicate signatures, template paths, find_by_path) can run
without re-parsing; `spans` remains exactly the input_hint schema.

Everything is seeded — no wall-clock, no randomness outside random.Random.
Pages per host are deliberately skewed (one hot host) to exercise the
salting/politeness machinery.
"""

from __future__ import annotations

import json
import os
import random
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq

# ---------------------------------------------------------------------------
# Tree model (generator-internal; mirrors the reference HtmlNode shape)
# ---------------------------------------------------------------------------


@dataclass
class Node:
    tag: str
    classes: list[str] = field(default_factory=list)
    id: str | None = None
    content: str = ""
    media_ref: str = ""  # href for <a>, asset URL for media tags
    children: list["Node"] = field(default_factory=list)


MEDIA_TAGS = {"img", "video", "audio"}

TEMPLATE_SNIPPETS = [
    "{n} comments",
    "{n} hours ago",
    "{n} points",
    "{n} likes",
    "Page {n} of 400",
    "{n} views",
    "{f} hours ago",
]
PLAIN_SNIPPETS = [
    "Welcome to the site",
    "All about distributed crawling",
    "Contact the team",
    "Read the documentation",
    "Latest updates and news",
    "just now",
    "yesterday",
]


def _page_tree(rng: random.Random, host: str, page_idx: int, hrefs: list[str],
               n_listing_rows: int, media_refs: list[str]) -> Node:
    """Build one page. The nav + footer subtrees are HOST-CONSTANT (so they
    become cross-page duplicate signatures, the reference's target pattern,
    /root/reference/src/storage.rs:277-310)."""
    head = Node("head", children=[Node("title", content=f"{host} page {page_idx}")])

    nav_links = [Node("a", classes=["nav-link"], content="Home", media_ref="/")]
    nav = Node("nav", classes=["navbar"], children=nav_links)

    # listing table: tr.athing.submission > td.title (find_by_path golden,
    # mirrors the HN integration test /root/reference/tests/real_world_tests.rs:252-264)
    rows = []
    for r in range(n_listing_rows):
        rows.append(
            Node(
                "tr",
                classes=["athing", "submission"],
                children=[
                    Node("td", classes=["title"],
                         content=f"Story {page_idx}-{r} on {host}"),
                    Node("td", classes=["meta"],
                         content=f"{rng.randint(1, 999)} points"),
                ],
            )
        )
    table = Node("table", classes=["itemlist"], children=[Node("tbody", children=rows)])

    # content block with template-ish + plain strings
    content_children = []
    for _ in range(rng.randint(2, 5)):
        snippet = rng.choice(TEMPLATE_SNIPPETS + PLAIN_SNIPPETS)
        snippet = snippet.replace("{n}", str(rng.randint(1, 500)))
        snippet = snippet.replace("{f}", f"{rng.randint(1, 9)}.{rng.randint(1, 9)}")
        content_children.append(
            Node("div", classes=["post"], id=f"post-{rng.randint(0, 10**6)}",
                 content=snippet)
        )
    # interleave media spans
    for m in media_refs:
        content_children.insert(
            rng.randrange(len(content_children) + 1),
            Node(rng.choice(sorted(MEDIA_TAGS)), classes=["asset"], media_ref=m),
        )
    content = Node("div", classes=["content"], children=content_children)

    links_block = Node(
        "div",
        classes=["links"],
        children=[
            Node("a", classes=["story-link"], content=f"link to {h}", media_ref=h)
            for h in hrefs
        ],
    )

    footer = Node("footer", classes=["site-footer"],
                  content=f"(c) {host} — all rights reserved")

    body = Node("body", children=[nav, table, content, links_block, footer])
    return Node("html", children=[head, body])


# ---------------------------------------------------------------------------
# Flattening: tree -> spans (input_hint schema) + nodes (analytics companion)
# ---------------------------------------------------------------------------


def flatten(root: Node) -> tuple[list[dict], list[dict]]:
    """Pre-order flatten. Returns (spans, nodes).

    spans: one per leaf-with-payload (text leaf / anchor / media), in
           pre-order => span order == reference tree traversal order.
    nodes: EVERY node with (offset, tag, classes, id, content, size, path)
           where size = subtree node count and path components are
           'tag.cls1.cls2' strings root->node.
    """
    spans: list[dict] = []
    nodes: list[dict] = []

    def walk(node: Node, path: list[str]) -> int:
        offset = len(nodes)
        comp = node.tag + ("." + ".".join(node.classes) if node.classes else "")
        my_path = path + [comp]
        rec = {
            "offset": offset,
            "tag": node.tag,
            "classes": list(node.classes),
            "id": node.id,
            "content": node.content,
            "size": 0,  # patched after children
            "path": my_path,
        }
        nodes.append(rec)

        if node.tag in MEDIA_TAGS:
            spans.append({"kind": "media", "text": "", "media_ref": node.media_ref,
                          "offset": offset})
        elif node.tag == "a":
            spans.append({"kind": "a", "text": node.content,
                          "media_ref": node.media_ref, "offset": offset})
        elif node.content and not node.children:
            spans.append({"kind": node.tag, "text": node.content, "media_ref": "",
                          "offset": offset})

        size = 1
        for ch in node.children:
            size += walk(ch, my_path)
        rec["size"] = size
        return size

    walk(root, [])
    return spans, nodes


# ---------------------------------------------------------------------------
# Corpus generation
# ---------------------------------------------------------------------------


@dataclass
class CorpusConfig:
    seed: int = 42
    n_hosts: int = 5
    pages_per_host: int = 12
    hot_host_pages: int = 40          # one skewed host
    listing_rows: int = 4
    private_pages_per_host: int = 2   # robots-disallowed
    links_per_page: int = 5
    media_per_page: int = 2
    default_budget: int = 4           # politeness: fetches/host/round
    sitemap_coverage: float = 0.5     # fraction of pages listed in sitemap
    robots_allow_carveout: bool = False
    # ^ add "Allow: /private/p1000" to the RAW robots text: an RFC 9309
    # longest-match exception inside the disallowed subtree. Only the
    # raw-artifact + rfc_robots engine mode honors it (the conservative
    # prefix path and the pre-parsed robots.parquet still block all of
    # /private) — the knob exists to e2e-test exactly that difference.


def host_name(i: int) -> str:
    return f"site{i:03d}.example.com"


def page_url(host: str, idx: int, private: bool = False) -> str:
    if idx == 0:
        return f"https://{host}/"
    if private:
        return f"https://{host}/private/p{idx}"
    section = ["news", "docs", "blog"][idx % 3]
    url = f"https://{host}/{section}/item{idx}"
    if idx % 7 == 3:
        url += f"?page={idx % 5}"
    return url


def generate_corpus(out_dir: str, cfg: CorpusConfig | None = None) -> dict:
    """Write documents/sitemaps/robots/politeness/seeds under out_dir.

    Returns a manifest dict (also written as corpus.json)."""
    cfg = cfg or CorpusConfig()
    os.makedirs(out_dir, exist_ok=True)
    rng = random.Random(cfg.seed)

    hosts = [host_name(i) for i in range(cfg.n_hosts)]
    pages_of: dict[str, list[str]] = {}
    private_of: dict[str, list[str]] = {}
    for hi, h in enumerate(hosts):
        n = cfg.hot_host_pages if hi == 0 else cfg.pages_per_host
        pages_of[h] = [page_url(h, i) for i in range(n)]
        private_of[h] = [
            page_url(h, 1000 + i, private=True)
            for i in range(cfg.private_pages_per_host)
        ]

    doc_rows = []
    for hi, h in enumerate(hosts):
        all_pages = pages_of[h] + private_of[h]
        for pi, url in enumerate(all_pages):
            prng = random.Random(f"{cfg.seed}:{h}:{url}")
            # outlinks: same-host (mixed href forms), occasional cross-host
            hrefs: list[str] = []
            candidates = pages_of[h]
            for _ in range(cfg.links_per_page):
                target = prng.choice(candidates)
                form = prng.randrange(4)
                if form == 0:
                    hrefs.append(target)  # absolute
                elif form == 1:
                    hrefs.append(target.replace(f"https://{h}", "") or "/")  # path-abs
                elif form == 2:
                    hrefs.append("//" + target[len("https://"):])  # proto-relative
                else:
                    rel = target.replace(f"https://{h}/", "")
                    hrefs.append(rel if rel else "/")  # relative
            if prng.random() < 0.3:  # external link (filtered by same-domain)
                other = hosts[(hi + 1) % len(hosts)]
                hrefs.append(f"https://{other}/")
            if prng.random() < 0.25:  # robots-disallowed link
                hrefs.append(f"/private/p{1000 + prng.randrange(cfg.private_pages_per_host)}")

            media = [
                f"https://cdn.example.com/{h}/asset{prng.randrange(100)}.jpg"
                for _ in range(cfg.media_per_page)
            ]
            tree = _page_tree(prng, h, pi, hrefs, cfg.listing_rows, media)
            spans, nodes = flatten(tree)
            doc_rows.append(
                {"doc_id": url, "host": h, "spans": spans, "nodes": nodes}
            )

    span_t = pa.struct(
        [("kind", pa.string()), ("text", pa.string()), ("media_ref", pa.string()),
         ("offset", pa.int32())]
    )
    node_t = pa.struct(
        [("offset", pa.int32()), ("tag", pa.string()),
         ("classes", pa.list_(pa.string())), ("id", pa.string()),
         ("content", pa.string()), ("size", pa.int32()),
         ("path", pa.list_(pa.string()))]
    )
    schema = pa.schema(
        [("doc_id", pa.string()), ("host", pa.string()),
         ("spans", pa.list_(span_t)), ("nodes", pa.list_(node_t))]
    )
    table = pa.Table.from_pylist(doc_rows, schema=schema)
    pq.write_table(table, os.path.join(out_dir, "documents.parquet"))

    # sitemaps: a deterministic prefix of each host's pages
    sm_rows = []
    for h in hosts:
        k = max(1, int(len(pages_of[h]) * cfg.sitemap_coverage))
        sm_rows.append({"host": h, "urls": pages_of[h][:k] + private_of[h][:1]})
    pq.write_table(
        pa.Table.from_pylist(
            sm_rows,
            schema=pa.schema([("host", pa.string()), ("urls", pa.list_(pa.string()))]),
        ),
        os.path.join(out_dir, "sitemaps.parquet"),
    )

    robots_rows = [{"host": h, "disallow_prefix": "/private"} for h in hosts]
    pq.write_table(
        pa.Table.from_pylist(
            robots_rows,
            schema=pa.schema([("host", pa.string()), ("disallow_prefix", pa.string())]),
        ),
        os.path.join(out_dir, "robots.parquet"),
    )

    budgets = [{"host": h, "budget": cfg.default_budget} for h in hosts]
    pq.write_table(
        pa.Table.from_pylist(
            budgets, schema=pa.schema([("host", pa.string()), ("budget", pa.int32())])
        ),
        os.path.join(out_dir, "politeness.parquet"),
    )

    # RAW fetched artifacts (robots.txt text, sitemap.xml) whose parsed form
    # equals the rule tables above — the engine's raw-ingest path
    # (plans.crawl EngineConfig.raw_artifacts=True) parses these instead of
    # reading the tables, and must produce the identical crawl.
    carveout = "Allow: /private/p1000\n" if cfg.robots_allow_carveout else ""
    raw_robots = [
        {"host": h,
         "robots_txt": ("# synthetic corpus robots\n"
                        "User-agent: *\nDisallow: /private\n" + carveout)}
        for h in hosts
    ]
    pq.write_table(
        pa.Table.from_pylist(
            raw_robots,
            schema=pa.schema([("host", pa.string()), ("robots_txt", pa.string())]),
        ),
        os.path.join(out_dir, "robots_raw.parquet"),
    )
    raw_sitemaps = [
        {"host": r["host"],
         "sitemap_xml": ("<urlset>"
                         + "".join(f"<url><loc>{u}</loc></url>" for u in r["urls"])
                         + "</urlset>")}
        for r in sm_rows
    ]
    pq.write_table(
        pa.Table.from_pylist(
            raw_sitemaps,
            schema=pa.schema([("host", pa.string()), ("sitemap_xml", pa.string())]),
        ),
        os.path.join(out_dir, "sitemaps_raw.parquet"),
    )

    seeds = [f"https://{h}/" for h in hosts]
    manifest = {
        "seed": cfg.seed,
        "hosts": hosts,
        "n_docs": len(doc_rows),
        "seeds": seeds,
        "default_budget": cfg.default_budget,
    }
    with open(os.path.join(out_dir, "corpus.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    # rng is intentionally unused beyond seeding page RNGs deterministically
    _ = rng
    return manifest


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--hosts", type=int, default=5)
    ap.add_argument("--pages", type=int, default=12)
    ap.add_argument("--hot-pages", type=int, default=40)
    ap.add_argument("--seed", type=int, default=42)
    a = ap.parse_args()
    m = generate_corpus(
        a.out_dir,
        CorpusConfig(seed=a.seed, n_hosts=a.hosts, pages_per_host=a.pages,
                     hot_host_pages=a.hot_pages),
    )
    print(json.dumps(m))
