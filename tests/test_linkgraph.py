"""Link-graph operators vs pure-python oracles (exact equality — both
kernels are integer-deterministic by design)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from smartcrawler_spark.operators import linkgraph as LG


def _py_resolve(edges: dict, max_hops: int):
    out = {}
    for s in edges:
        cur, hops = edges[s], 1
        while cur in edges and hops < max_hops:
            cur = edges[cur]
            hops += 1
        out[s] = (cur, hops, cur in edges)
    return out


def test_resolve_redirects_chains_cycles_and_caps(spark):
    edges = {}
    # plain chain a0->a1->...->a4 (a4 terminal)
    for i in range(4):
        edges[f"a{i}"] = f"a{i + 1}"
    # 3-cycle
    edges["c0"], edges["c1"], edges["c2"] = "c1", "c2", "c0"
    # chain longer than the cap (20 hops, cap 16)
    for i in range(20):
        edges[f"l{i}"] = f"l{i + 1}"
    df = spark.createDataFrame(list(edges.items()), "src string, dst string")
    got = {r["src"]: (r["final"], r["hops"], r["is_loop"])
           for r in LG.resolve_redirects(df, max_hops=16).collect()}
    assert got == _py_resolve(edges, 16)
    # spot semantics: chain resolves fully, cycle saturates and is flagged
    assert got["a0"] == ("a4", 4, False)
    assert got["c0"][1] == 16 and got["c0"][2] is True
    assert got["l0"][1] == 16 and got["l0"][2] is True
    assert got["l10"] == ("l20", 10, False)


def test_resolve_redirects_requires_power_of_two():
    import pytest

    with pytest.raises(ValueError):
        LG.resolve_redirects(None, max_hops=10)


def _py_pagerank(edges, iters, num=85, den=100, scale=10**9):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    deg = {}
    for s, _ in set(edges):
        deg[s] = deg.get(s, 0) + 1
    base = (scale // n) * (den - num)
    r = {v: scale // n for v in nodes}
    for _ in range(iters):
        agg = {v: 0 for v in nodes}
        for s, d in set(edges):
            agg[d] += r[s] // deg[s]
        r = {v: (base + num * agg[v]) // den for v in nodes}
    return r


def test_pagerank_matches_integer_oracle_exactly(spark):
    # varied in/out degrees plus a deliberate hub (everything links to 0)
    edges = [(i % 13, (i * i * 3 + 1) % 13) for i in range(40)]
    edges += [(i, 0) for i in range(1, 9)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"]
           for r in LG.pagerank_fixed_point(df, iters=3).collect()}
    assert got == _py_pagerank(edges, 3)
    # hubs with more in-links outrank leaves
    assert got[0] == max(got.values())  # the hub outranks everything
    assert len(set(got.values())) > 3   # ranks actually differentiate


def test_pagerank_empty_graph(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert LG.pagerank_fixed_point(df, iters=2).count() == 0


# ---------------------------------------------------------------------------
# HITS hubs/authorities (integer fixed-point)
# ---------------------------------------------------------------------------


def _hits_oracle(edges, iters=2, scale=10**9):
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    h = {n: scale for n in nodes}
    a = {}
    for _ in range(iters):
        a = {}
        for s, d in set(edges):
            a[d] = a.get(d, 0) + h.get(s, 0)
        den = max(max(a.values()) // scale, 1)
        a = {k: v // den for k, v in a.items()}
        h = {}
        for s, d in set(edges):
            h[s] = h.get(s, 0) + a.get(d, 0)
        den = max(max(h.values()) // scale, 1)
        h = {k: v // den for k, v in h.items()}
    return {n: (h.get(n, 0), a.get(n, 0)) for n in nodes}


def test_hits_matches_python_oracle(spark):
    from smartcrawler_spark.operators.linkgraph import hits_fixed_point

    rng = random.Random(11)
    edges = list({(rng.randrange(40), rng.randrange(40)) for _ in range(160)})
    # parallel edges must not double-count
    df = spark.createDataFrame(edges + edges[:10], "src long, dst long")
    for iters in (1, 2, 3):
        got = {r["node"]: (r["hub"], r["auth"])
               for r in hits_fixed_point(df, iters=iters).collect()}
        assert got == _hits_oracle(edges, iters=iters), iters


def test_hits_hub_authority_separation(spark):
    """A pure hub (points at everything, nothing points at it) ends with
    auth 0; a pure authority ends with hub 0; the most-pointed-at node
    has the top authority."""
    from smartcrawler_spark.operators.linkgraph import hits_fixed_point

    edges = [(0, i) for i in range(1, 6)] + [(9, 5), (8, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: (r["hub"], r["auth"])
           for r in hits_fixed_point(df, iters=2).collect()}
    assert got[0][1] == 0          # pure hub: no authority
    assert got[5][0] == 0          # pure authority: no hub score
    assert max(got, key=lambda n: got[n][1]) == 5


def test_host_link_graph(spark):
    def span(kind, text=None, media_ref=None, offset=0):
        return {"kind": kind, "text": text, "media_ref": media_ref,
                "offset": offset}

    rows = [
        {"doc_id": "https://a.com/1", "host": "a.com", "spans": [
            span("a", media_ref="https://b.com/x"),
            span("a", media_ref="https://b.com/y"),
            span("a", media_ref="/internal"),        # self-loop dropped
            span("media", media_ref="img.png"),
        ]},
        {"doc_id": "https://a.com/2", "host": "a.com", "spans": [
            span("a", media_ref="https://b.com/z"),
            span("a", media_ref="https://c.com/"),
        ]},
    ]
    docs = spark.createDataFrame(
        rows, "doc_id string, host string, spans array<struct<"
        "kind:string,text:string,media_ref:string,offset:int>>")
    got = {(r["src_host"], r["dst_host"]): (r["n_links"], r["n_pages"])
           for r in LG.host_link_graph(docs).collect()}
    assert got == {("a.com", "b.com"): (3, 2), ("a.com", "c.com"): (1, 1)}


def test_rank_hosts_job_end_to_end(spark, tmp_path, capsys):
    """jobs/run_rank_hosts.py on a generated corpus: real CLI main(),
    output schema, degree cross-check vs host_link_graph."""
    import json
    import os
    import sys

    from smartcrawler_spark.sources.corpus import CorpusConfig, generate_corpus

    jobs = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "jobs")
    sys.path.insert(0, jobs)
    import run_rank_hosts

    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, CorpusConfig(n_hosts=3, pages_per_host=4))
    out = str(tmp_path / "ranks")
    old = sys.argv
    sys.argv = ["run_rank_hosts.py", "--corpus", corpus, "--output", out]
    try:
        assert run_rank_hosts.main() == 0
    finally:
        sys.argv = old
    res = json.loads([ln for ln in capsys.readouterr().out.splitlines()
                      if ln.startswith("{")][-1])
    ranks = spark.read.parquet(out)
    assert set(ranks.columns) == {"host", "pagerank", "hub", "auth",
                                  "out_links", "in_links"}
    assert ranks.count() == res["hosts_ranked"] > 0
    docs = spark.read.parquet(f"{corpus}/documents.parquet")
    edges = LG.host_link_graph(docs)
    want_out = {r["src_host"]: r["s"] for r in edges.groupBy("src_host")
                .agg(F.sum("n_links").alias("s")).collect()}
    got = {r["host"]: r["out_links"] for r in ranks.collect()}
    for h, n in want_out.items():
        assert got[h] == n


def test_host_triangles_hand_oracle(spark):
    from smartcrawler_spark.operators.linkgraph import host_triangles

    # K4 on {a,b,c,d} (4 triangles) + pendant edge d-e + duplicate and
    # reversed edges that must not double-count
    edges = [(x, y) for x, y in [
        ("a", "b"), ("b", "a"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"), ("d", "e"), ("a", "b"),
    ]]
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    got = {tuple(r) for r in host_triangles(df).collect()}
    assert got == {("a", "b", "c"), ("a", "b", "d"),
                   ("a", "c", "d"), ("b", "c", "d")}


def test_host_triangles_max_degree_drops_hubs(spark):
    from smartcrawler_spark.operators.linkgraph import host_triangles

    # 'hub' closes triangles with everything; capping degree removes it
    base = [("a", "b"), ("b", "c"), ("a", "c")]
    hub = [("hub", x) for x in "abcdefgh"]
    closing = [("d", "e"), ("hub", "d"), ("hub", "e")]
    df = spark.createDataFrame(base + hub + closing,
                               "src_host string, dst_host string")
    all_tris = {tuple(r) for r in host_triangles(df).collect()}
    assert ("d", "e", "hub") in all_tris and len(all_tris) > 4
    capped = {tuple(r) for r in host_triangles(df, max_degree=4).collect()}
    assert capped == {("a", "b", "c")}


def _py_opic(edges, iters, scale=10**9):
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    cash = {v: scale // n for v in nodes}
    hist = {v: 0 for v in nodes}
    for _ in range(iters):
        pool = sum(c for v, c in cash.items() if v not in deg)
        inflow = {v: 0 for v in nodes}
        for s, d in edges:
            inflow[d] += cash[s] // deg[s]
        hist = {v: hist[v] + cash[v] for v in nodes}
        cash = {v: inflow[v] + pool // n for v in nodes}
    return {v: (cash[v], hist[v], cash[v] + hist[v]) for v in nodes}


def test_opic_matches_python_oracle_exactly(spark):
    # functional graph + a hub + DANGLING nodes (20,21 appear only as dst)
    edges = [(i % 13, (i * 7 + 3) % 13) for i in range(40)]
    edges += [(i, 0) for i in range(1, 6)]
    edges += [(3, 20), (5, 21)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: (r["cash"], r["hist"], r["opic"])
           for r in LG.opic_fixed_rounds(df, iters=3).collect()}
    assert got == _py_opic(edges, 3)
    # the dangling nodes accumulated history (they received cash) and the
    # virtual-page return path gave every node nonzero cash
    assert all(c > 0 for c, _, _ in got.values())
    assert got[20][1] > 0 and got[21][1] > 0


def test_opic_cash_is_conserved_up_to_division_dust(spark):
    edges = [(i % 11, (i * 5 + 1) % 11) for i in range(30)] + [(4, 99)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = LG.opic_fixed_rounds(df, iters=4, scale=10**9).collect()
    n = len(rows)
    total_cash = sum(r["cash"] for r in rows)
    # initial total = n * (scale div n); each round loses < (n + 1)
    # units of integer-division dust (outdeg splits + the pool split)
    start = n * (10**9 // n)
    assert start - 4 * (sum(1 for _ in rows) + len(edges)) <= total_cash <= start


def test_opic_empty_graph(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert LG.opic_fixed_rounds(df, iters=2).count() == 0
    assert LG.opic_fixed_rounds(df, iters=2, driver_threshold=0).count() == 0


def test_opic_driver_and_distributed_arms_agree(spark):
    """The r6 adaptive small-graph fast path (bounded collect + exact
    Python replay) must be row-identical to the distributed loop — the
    same two-arm equality contract as connected_components."""
    edges = [(i % 13, (i * 7 + 3) % 13) for i in range(40)]
    edges += [(i, 0) for i in range(1, 6)] + [(3, 20), (5, 21)]
    df = spark.createDataFrame(edges, "src long, dst long")
    fast = LG.opic_fixed_rounds(df, iters=3)
    slow = LG.opic_fixed_rounds(df, iters=3, driver_threshold=0)
    assert fast.schema.simpleString() == slow.schema.simpleString()
    assert fast.exceptAll(slow).count() == 0
    assert slow.exceptAll(fast).count() == 0
