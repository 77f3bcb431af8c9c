"""Link-graph operators: redirect-chain resolution and PageRank-style
centrality for crawl prioritization.

Neither exists in the reference (it follows links one page at a time and
never materializes the graph — /root/reference/src/main.rs:57-287 drives a
per-page loop); both are standard components of a web-scale crawler that a
10^10-URL frontier needs:

* `resolve_redirects` — collapse redirect chains (301/302/canonical maps)
  to their final target before frontier admission, so n aliases of one
  page cost one fetch. POINTER DOUBLING: k self-joins resolve chains of
  length 2^k, vs 2^k sequential joins for the naive walk — at web scale
  (chains are short, a few hops; the map has ~10^8 rows) that is 4-5
  shuffles total, each co-partitioned on the join key. Cycles and
  over-long chains are flagged, not silently followed.

* `pagerank_fixed_point` — power-iteration PageRank in PURE BIGINT
  arithmetic (ranks scaled by `scale`, integer division at every step, a
  pinned order of operations) so the result is bit-identical on any
  engine — no float summation-order divergence — and the DuckDB oracle
  can gate it exactly. The per-iteration shape is the canonical Spark
  PageRank plan: ranks⋈edges co-partitioned on src, map-side-combined
  groupBy dst, one shuffle pair per iteration; degrees are computed once.
  Dangling-node mass is dropped (not redistributed) — documented choice,
  identical on both engines.

Also here, same integer-exact discipline: `hits_fixed_point` (hubs &
authorities with an in-plan broadcast rescale), `opic_fixed_rounds`
(batch OPIC — the ONLINE importance measure the crawl loop's
rank_boost_every wiring schedules by), `host_link_graph` (page anchors
aggregated to host granularity), and `host_triangles` (link-farm clique
signal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(
    redirects: DataFrame,
    max_hops: int = 16,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Resolve every redirect source to the end of its chain.

    `redirects` is a functional map (one dst per src — callers dedup;
    duplicate srcs here would multiply rows in the self-join). Returns
    (src, final, hops, is_loop):

    * final — the node reached after following redirects until a node
      with no outgoing edge, or until `max_hops` steps (whichever first)
    * hops  — real steps taken, exactly min(chain_length, max_hops)
    * is_loop — True when `final` STILL has an outgoing edge, i.e. the
      chain was cut by the hop cap (a cycle, or a chain longer than
      max_hops — both are treated as traps and should not be admitted)

    max_hops must be a power of two: the resolution composes the
    absorbing step-map with itself log2(max_hops) times (pointer
    doubling), so hop counts saturate at exactly max_hops — which makes
    the output bit-identical to a sequential hop-capped walk (the DuckDB
    recursive-CTE oracle)."""
    if max_hops & (max_hops - 1):
        raise ValueError("max_hops must be a power of two")
    k = max_hops.bit_length() - 1  # log2

    # cur(node, final, hops): the absorbing map "follow 2^i steps from
    # node" — nodes absent from the map are terminal (step = identity)
    cur = redirects.select(
        F.col(src_col).alias("node"),
        F.col(dst_col).alias("final"),
        F.lit(1).cast("long").alias("hops"),
    )
    for _ in range(k):
        nxt = cur.select(
            F.col("node").alias("_n2"),
            F.col("final").alias("_f2"),
            F.col("hops").alias("_h2"),
        )
        cur = (
            cur.join(nxt, cur.final == nxt._n2, "left")
            .select(
                "node",
                F.coalesce(F.col("_f2"), F.col("final")).alias("final"),
                (F.col("hops") + F.coalesce(F.col("_h2"), F.lit(0)))
                .alias("hops"),
            )
        )
    live = redirects.select(F.col(src_col).alias("_src"),
                            F.lit(True).alias("_live")).distinct()
    return (
        cur.join(live, cur.final == live._src, "left")
        .select(
            F.col("node").alias("src"),
            "final",
            "hops",
            F.coalesce(F.col("_live"), F.lit(False)).alias("is_loop"),
        )
    )


def pagerank_fixed_point(
    edges: DataFrame,
    iters: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**9,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Power-iteration PageRank with bit-exact integer arithmetic.

    Ranks live in units of `scale` (r=scale means rank 1.0). Per
    iteration, with den=damping_den, num=damping_num, n=|nodes|:

        share(u)  = r(u) div outdeg(u)                [bigint div]
        agg(v)    = sum of share(u) over edges u->v   [exact bigint sum]
        r'(v)     = ((den-num) * (scale div n) + num * agg(v)) div den

    Every op is integer and the order is pinned, so any engine computes
    identical ranks (the float formulation would diverge on summation
    order). Dangling mass is dropped — ranks are a relative priority
    signal for crawl scheduling, not probabilities; normalization is not
    needed and redistribution would add an all-to-one shuffle per
    iteration for no ordering benefit.

    Edges are deduped (parallel edges would double-count shares).
    `n` comes from one driver-side count of the node set — a metadata-
    scale action (node COUNT, not node rows). Overflow bound:
    num * agg(v) < 2^63 needs indegree(v) * scale * num < 2^63 —
    at scale=10^9, num=85, safe to indegree ~10^11. Returns (node, rank).
    """
    e = edges.select(F.col(src_col).alias("src"),
                     F.col(dst_col).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0).cast("long"))
    base = (scale // n) * (damping_den - damping_num)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
    ranks = nodes.withColumn("rank", F.lit(scale // n).cast("long"))
    for _ in range(iters):
        shares = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select("dst", F.expr("rank div _deg").alias("_share"))
        )
        agg = shares.groupBy("dst").agg(F.sum("_share").alias("_agg"))
        ranks = (
            nodes.join(agg.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                F.expr(
                    f"({base}L + {damping_num}L * coalesce(_agg, 0L)) "
                    f"div {damping_den}L"
                ).alias("rank"),
            )
        )
    return ranks


def hits_fixed_point(
    edges: DataFrame,
    iters: int = 2,
    scale: int = 10**9,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) with bit-exact integer
    arithmetic — the companion centrality to `pagerank_fixed_point`:
    authorities rank pages many good hubs point AT (fetch-priority
    signal), hubs rank pages that point at many good authorities
    (link-source quality for seed selection).

    Scores live in units of `scale`. Per iteration:

        a(v) = sum of h(u) over edges u->v        [exact bigint sum]
        a    = a div greatest(max(a) div scale, 1)  [divide-first rescale]
        h(u) = sum of a(v) over edges u->v
        h    = h div greatest(max(h) div scale, 1)

    The rescale replaces the float L2 normalization: divide-FIRST keeps
    every intermediate below ~2*scale*max_degree (no 64-bit overflow, no
    multiply-then-divide blowup) and the pinned integer ops make any
    engine produce identical scores — the DuckDB oracle gates them
    exactly. Like pagerank, scores are a relative ordering signal;
    absolute normalization buys nothing for scheduling.

    Scale shape: two co-partitioned join+groupBy shuffles per iteration
    (src then dst — the canonical ranks-join-edges plan) plus one
    broadcast of a 1-row max per rescale (in-plan scalar, no driver
    action). Nodes without in/out edges surface with score 0 via the
    final left joins. Returns (node, hub, auth)."""
    e = edges.select(F.col(src_col).alias("src"),
                     F.col(dst_col).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )

    def _rescale(df: DataFrame, col: str) -> DataFrame:
        m = df.agg(F.max(col).alias("_m"))
        keep = [c for c in df.columns if c != col]
        return df.crossJoin(F.broadcast(m)).select(
            *keep,
            F.expr(f"{col} div greatest(_m div {scale}L, 1L)").alias(col),
        )

    h = nodes.select(F.col("node").alias("src"),
                     F.lit(scale).cast("long").alias("hub"))
    a = None
    for _ in range(iters):
        ar = e.join(h, "src").groupBy("dst").agg(F.sum("hub").alias("auth"))
        a = _rescale(ar, "auth")
        hr = e.join(a, "dst").groupBy("src").agg(F.sum("auth").alias("hub"))
        h = _rescale(hr, "hub")
    out = (
        nodes.join(h.withColumnRenamed("src", "node"), "node", "left")
        .join(a.withColumnRenamed("dst", "node"), "node", "left")
        .select(
            "node",
            F.coalesce(F.col("hub"), F.lit(0).cast("long")).alias("hub"),
            F.coalesce(F.col("auth"), F.lit(0).cast("long")).alias("auth"),
        )
    )
    return out


def opic_fixed_rounds(
    edges: DataFrame,
    iters: int = 3,
    scale: int = 10**9,
    src_col: str = "src",
    dst_col: str = "dst",
    driver_threshold: int = 200_000,
) -> DataFrame:
    """Batch OPIC — On-line Page Importance Computation (Abiteboul,
    Preda & Cobena, WWW 2003) — in bit-exact integer arithmetic.

    OPIC is the importance measure crawlers use ONLINE: unlike PageRank
    (which needs the whole graph converged before it ranks anything),
    OPIC's cash/history pair gives a usable fetch priority after every
    round, so the frontier can schedule by it mid-crawl. The synchronous
    batch variant here processes every node each round:

        hist'(v) = hist(v) + cash(v)                 [spend is recorded]
        share(u→v) = cash(u) div outdeg(u)           [bigint div]
        pool     = sum of cash(u) over dangling u    [virtual page]
        cash'(v) = sum of incoming shares + pool div n

    `importance = hist + cash` (the paper's H+C estimate, unnormalized —
    ranks are a relative scheduling signal, same contract as
    `pagerank_fixed_point`). Dangling cash goes to the paper's virtual
    page and returns uniformly next round, so cash is conserved up to
    integer-division dust and deterministically so.

    Every operation is bigint with a pinned order — the DuckDB oracle
    unrolls the same rounds and matches bit-for-bit. Overflow bound:
    total cash ≈ scale is conserved, so no sum exceeds ~scale + n.

    Scale shape (10^10 nodes): per round, one co-partitioned
    ranks⋈edges join + map-side-combined groupBy(dst) (the canonical
    Spark PageRank shuffle pair) plus ONE 1-row aggregate for the
    dangling pool, broadcast in-plan (crossJoin of a scalar — no driver
    action, same device as `hits_fixed_point`'s rescale). `n` is a
    single metadata-scale count. For many rounds, checkpoint `state`
    every ~5 iterations to cut lineage. Returns (node, cash, hist, opic).
    """
    # ADAPTIVE small-graph path (the connected_components driver_threshold
    # discipline): every OPIC operation is deterministic nonnegative
    # bigint arithmetic, so a bounded limit(threshold+1) collect + exact
    # Python replay produces identical rows without the ~15 tiny
    # distributed jobs the unrolled rounds cost (measured: the entire
    # bench query was per-job overhead, not data). Above the threshold
    # the distributed loop runs with persisted invariants and per-round
    # localCheckpoints (linear work instead of 3^iters lineage
    # re-evaluation).
    spark = edges.sparkSession
    e_small = edges.select(F.col(src_col).alias("src"),
                           F.col(dst_col).alias("dst")).distinct()
    if driver_threshold:
        head = e_small.limit(driver_threshold + 1).collect()
        if len(head) <= driver_threshold:
            node_t = e_small.schema["src"].dataType.simpleString()
            schema = (f"node {node_t}, cash long, hist long, opic long")
            pairs = [(r["src"], r["dst"]) for r in head]
            nodes_l = sorted({s for s, _ in pairs} | {d for _, d in pairs})
            if not nodes_l:
                return spark.createDataFrame([], schema)
            n_nodes = len(nodes_l)
            deg_m: dict = {}
            for s, _ in pairs:
                deg_m[s] = deg_m.get(s, 0) + 1
            cash = {v: scale // n_nodes for v in nodes_l}
            hist = {v: 0 for v in nodes_l}
            for _ in range(iters):
                pool = sum(c for v, c in cash.items() if v not in deg_m)
                inflow: dict = {}
                for s, d in pairs:
                    inflow[d] = inflow.get(d, 0) + cash[s] // deg_m[s]
                ret = pool // n_nodes
                for v in nodes_l:
                    hist[v] += cash[v]
                    cash[v] = inflow.get(v, 0) + ret
            return spark.createDataFrame(
                [(v, cash[v], hist[v], cash[v] + hist[v]) for v in nodes_l],
                schema)
    e = e_small.persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()  # also materializes the e cache
    if n == 0:
        e.unpersist()
        return nodes.select(
            "node",
            F.lit(0).cast("long").alias("cash"),
            F.lit(0).cast("long").alias("hist"),
            F.lit(0).cast("long").alias("opic"),
        )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_deg")).persist()
    state = nodes.select(
        "node",
        F.lit(scale // n).cast("long").alias("cash"),
        F.lit(0).cast("long").alias("hist"),
    ).localCheckpoint(eager=True)
    for it in range(iters):
        if it:  # truncate the PREVIOUS round's lineage (state is read
            # three times per round); the final round stays lazy so the
            # returned plan carries the round shape (and the consumer's
            # action does the last round's work exactly once)
            state = state.localCheckpoint(eager=True)
        pool = (
            state.join(deg.withColumnRenamed("src", "node"), "node", "left_anti")
            .agg(F.coalesce(F.sum("cash"), F.lit(0)).cast("long").alias("_pool"))
        )
        shares = (
            e.join(state.select(F.col("node").alias("src"), "cash"), "src")
            .join(deg, "src")
            .select("dst", F.expr("cash div _deg").alias("_share"))
        )
        inflow = shares.groupBy("dst").agg(F.sum("_share").alias("_in"))
        state = (
            state.select("node", F.col("cash").alias("_oc"),
                         F.col("hist").alias("_oh"))
            .join(inflow.withColumnRenamed("dst", "node"), "node", "left")
            .crossJoin(F.broadcast(pool))
            .select(
                "node",
                (F.coalesce(F.col("_in"), F.lit(0).cast("long"))
                 + F.expr(f"_pool div {n}L")).cast("long").alias("cash"),
                (F.col("_oh") + F.col("_oc")).cast("long").alias("hist"),
            )
        )
    # e/deg stay persisted: the returned final round is lazy (see loop
    # head) and still reads both; Spark evicts the blocks LRU once the
    # consumer is done.
    return state.select(
        "node", "cash", "hist",
        (F.col("cash") + F.col("hist")).cast("long").alias("opic"),
    )


def host_link_graph(docs: DataFrame, spans_col: str = "spans",
                    host_col: str = "host") -> DataFrame:
    """Aggregate the page-level anchor graph to HOST granularity:
    (src_host, dst_host, n_links, n_pages) edges, self-loops dropped.
    Host-level centrality (feed this into `pagerank_fixed_point` /
    `hits_fixed_point`) is how crawl fleets allocate seed and politeness
    budgets — 10^10 URLs collapse to ~10^8 hosts, small enough to rank
    every round. Explode is map-side; the single shuffle is the groupBy
    on the host pair with map-side partial agg."""
    from ..functions import urls as U

    s = F.col("s")
    anchors = (
        docs.select(F.col("doc_id"), F.col(host_col).alias("src_host"),
                    F.explode(F.col(spans_col)).alias("s"))
        .filter((s["kind"] == "a") & s["media_ref"].isNotNull()
                & (s["media_ref"] != ""))
        .select(
            "doc_id", "src_host",
            U.url_host(U.resolve_href(s["media_ref"],
                                      F.col("src_host"))).alias("dst_host"),
        )
        .filter(F.col("dst_host") != F.col("src_host"))
        .filter(F.col("dst_host").isNotNull() & (F.col("dst_host") != ""))
    )
    return anchors.groupBy("src_host", "dst_host").agg(
        F.count("*").alias("n_links"),
        F.countDistinct("doc_id").alias("n_pages"),
    )


def host_triangles(edges: DataFrame, src: str = "src_host",
                   dst: str = "dst_host",
                   max_degree: int | None = None) -> DataFrame:
    """Enumerate undirected triangles in the host graph: rows (a, b, c)
    with a < b < c, each triangle exactly once.

    Dense triangle neighborhoods are the classic link-farm / SEO-ring
    signal (mutually interlinked host cliques), the graph-side complement
    of the content-side dup detectors: a crawl fleet demotes hosts whose
    edges mostly close triangles inside one clique.

    Plan: orient every edge low->high (one distinct on the pair), then
    the standard two-path + closing-edge joins — two shuffles keyed on a
    single host column each. The hazard at 10^10 edges is degree skew:
    a hub host of degree d contributes O(d^2) two-paths. ``max_degree``
    drops hub VERTICES before pairing (count degrees with one
    vocabulary-sized agg, anti-join hot hosts) — same discipline as the
    df_cap in dedup.ngram_jaccard_pairs; triangles through dropped hubs
    are (documented) not reported, which is the standard approximation
    for spam metrics since mega-hubs close triangles with everything.
    """
    a, b = F.col(src), F.col(dst)
    und = (
        edges.select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
    )
    if max_degree is not None:
        deg = (
            und.select(F.col("a").alias("h"))
            .unionAll(und.select(F.col("b").alias("h")))
            .groupBy("h").agg(F.count("*").alias("_d"))
            .filter(F.col("_d") > max_degree)
        )
        und = (
            und.join(deg.select(F.col("h").alias("a")), "a", "left_anti")
            .join(deg.select(F.col("h").alias("b")), "b", "left_anti")
            .select("a", "b")
        )
    ab = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    bc = und.select(F.col("a").alias("y"), F.col("b").alias("z"))
    ac = und.select(F.col("a").alias("x"), F.col("b").alias("z"))
    return ab.join(bc, "y").join(ac, ["x", "z"]).select(
        F.col("x").alias("a"), F.col("y").alias("b"), F.col("z").alias("c")
    )
