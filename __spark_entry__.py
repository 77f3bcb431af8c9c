"""Driver contract for the spark-graft builder (PySpark target).

`queries()` exposes one entry per implemented operator shape from
SURVEY.md §2 plus the training-data-pipeline operators, each runnable on the
driver's testdata tables; `oracle_sql()` gives the DuckDB-equivalent ANSI
SQL. The four numpy/blake2b THROUGHPUT kernels (dedup_minhash,
dedup_simhash, ann_lsh, ann_ivf) cannot be re-expressed in SQL directly;
their gates instead read GOLDEN PARQUET computed by an independent
pure-Python/numpy re-implementation (tools/gen_golden.py, bit-exact vs the
kernels — invariant enforced by tests/test_golden.py) over the fixed
sf0.01 driver tables, making them full rows+schema+hash gates. Each
family additionally carries an engine-portable md5/integer twin with an
in-SQL gate (minhash_lsh_portable, simhash_portable, ann_lsh_portable,
ann_ivf_portable) proving the algorithm spec itself.

Numeric discipline for the value-hash comparison: every float column is
rounded identically on both sides, embeddings are cast to DOUBLE in both
engines (DuckDB's list_cosine_similarity on FLOAT[] computes in float32 and
diverges in the 7th decimal), and averages are only taken over integer
inputs (exact integer sums -> identical doubles).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from smartcrawler_spark.functions import textops as T
from smartcrawler_spark.functions import urls as U
from smartcrawler_spark.operators import dedup as DD
from smartcrawler_spark.operators import frontier as FR
from smartcrawler_spark.operators import invindex as IX
from smartcrawler_spark.operators import similarity as SIM
from smartcrawler_spark.operators import sketches as SK

DEFAULT_SF = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# flagship: the frontier admission pipeline over URL-ified documents
# --------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001: synthesize URLs from `documents`, run the
    frontier candidate pipeline (canonicalize -> hash -> score -> skew-safe
    per-host top-k), return the scheduled queue."""
    return q_frontier_admission(spark, DEFAULT_SF)


def q_frontier_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    raw = docs.select(
        F.concat(
            F.lit("HTTP://"), F.col("source"), F.lit(".Example.COM:80/"),
            F.col("lang"), F.lit("/doc"), F.col("doc_id"),
            F.when(F.col("doc_id") % 3 == 0, "?view=full").otherwise(""),
        ).alias("url")
    )
    # dedup-first (r6): canonicalize -> 1-column batch dedup -> derive
    # hash/host/is_root/score on the survivors only — identical output to
    # with_url_columns(...).dropDuplicates(["url_canon"]) (every derived
    # column is a pure function of url_canon; operator docstring + plan
    # test), with the dedup exchange carrying one column instead of five.
    # This is the engine crawl loop's actual candidate shape.
    cands = FR.with_url_columns_deduped(
        raw, "url", {"doc": 1.0, "view": 0.5, "en": 2.0})
    top = FR.top_k_per_group(
        cands,
        ["host"],
        [F.col("is_root").desc(), F.col("score").desc(), F.col("url_canon").asc()],
        k=5,
    )
    return top.select("host", "url_canon", F.round("score", 4).alias("score"))


# --------------------------------------------------------------------------
# SURVEY §2 operator-shaped queries (TPC-H-ish tables) + training-data ops
# --------------------------------------------------------------------------


def q_seen_anti_join(spark, sf_dir):
    """D1/J1 — frontier seen-set anti-join shape: customers with no
    large order ('seen set' = big-spenders; anti-join keeps the novel)."""
    customer = _t(spark, sf_dir, "customer")
    seen = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return customer.join(seen, "c_custkey", "left_anti").select("c_custkey", "c_name")


def q_dup_signature_count(spark, sf_dir):
    """A2 — groupBy-count-filter>=2 (occurrence semantics) on events."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
    )


def q_dup_occurrence_guard(spark, sf_dir):
    """A2 exact aggregation semantics over synthesized 'nodes' (words of
    documents.text, sig = md5): occurrence count (within AND across pages)
    >= 2 per host=source, gated by the reference's >= 2-pages-per-host
    guard — doc_id < 30 leaves some sources with a single page so the
    guard actually bites. (The span operator itself — subtree hashes over
    the engine corpus — is pytest-gated in tests/test_spans.py; this gates
    the aggregation shape against DuckDB.)"""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    eligible = (
        docs.groupBy("source").agg(F.count("*").alias("_pages"))
        .filter(F.col("_pages") >= 2).select("source")
    )
    nodes = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("s")
    ).filter(F.trim(F.col("s")) != "")
    return (
        nodes.join(F.broadcast(eligible), "source", "left_semi")
        .groupBy("source", F.md5(F.col("s")).alias("sig"))
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 8)
    )


def q_politeness_topk(spark, sf_dir):
    """A6/A7 — skew-safe per-group top-k (two-phase salted window): top-3
    orders per customer by totalprice desc, orderkey asc."""
    orders = _t(spark, sf_dir, "orders")
    top = FR.top_k_per_group(
        orders, ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=3, salt_on="o_orderkey",
    )
    return top.select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("price"))


def q_broadcast_semi_mark(spark, sf_dir):
    """J2 — broadcast duplicate-set membership marking: lineitems of pricey
    parts get their returnflag rewritten (the '[FILTERED DUPLICATE]' shape)."""
    li = _t(spark, sf_dir, "lineitem")
    dups = _t(spark, sf_dir, "part").filter(F.col("p_retailprice") > 1500).select(
        F.col("p_partkey").alias("l_partkey"), F.lit(True).alias("_dup")
    )
    return (
        li.join(F.broadcast(dups), "l_partkey", "left")
        .select(
            "l_orderkey", "l_linenumber",
            F.when(F.col("_dup"), "[FILTERED DUPLICATE]")
            .otherwise(F.col("l_returnflag")).alias("flag"),
        )
    )


def q_robots_prefix_gate(spark, sf_dir):
    """J5 — robots prefix anti-join via broadcast rules + EXISTS."""
    docs = _t(spark, sf_dir, "documents")
    rules = spark.createDataFrame(
        [("src1",), ("src0",)], "disallow_prefix string"
    ).agg(F.collect_list("disallow_prefix").alias("_prefixes"))
    gated = docs.crossJoin(F.broadcast(rules)).filter(
        ~F.exists("_prefixes", lambda p: F.col("source").startswith(p))
    )
    return gated.select("doc_id", "source")


def q_robots_rfc_gate(spark, sf_dir):
    """RFC 9309 §2.2.2 allow/disallow longest-match resolution
    (operators.frontier.robots_gate_rfc): per-host rule structs broadcast,
    JVM regexp filter + aggregate fold to the most specific match (longest
    pattern wins; tie -> allow). Exercises the carve-out (longer Allow
    inside a Disallow subtree), the $-anchored wildcard, the tie->allow
    rule, and unruled hosts. Rules are synthesized relationally so the
    DuckDB oracle resolves the same table with regexp_matches + arg_max."""
    from smartcrawler_spark.operators.frontier import robots_gate_rfc

    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 400)
    k = F.col("c_custkey")
    host = F.concat(F.lit("h"), (k % 20).cast("string"), F.lit(".example.com"))
    path = (
        F.when(k % 5 == 0, F.concat(F.lit("/private/doc"), k.cast("string"),
                                    F.lit(".html")))
        .when(k % 5 == 1, F.lit("/private/pub.html"))
        .when(k % 5 == 2, F.concat(F.lit("/files/f"), k.cast("string"),
                                   F.lit(".pdf")))
        .when(k % 5 == 3, F.lit("/page1"))
        .otherwise(F.concat(F.lit("/other"), k.cast("string")))
    )
    cands = cust.select(
        host.alias("host"),
        F.concat(F.lit("https://"), host, path).alias("url_canon"),
    )
    rules_rows = []
    for i in range(10):  # hosts h10..h19 stay unruled -> always allowed
        h = f"h{i}.example.com"
        rules_rows += [
            (h, "^/private/", False, 9),
            (h, r"^/private/pub\.html", True, 17),
            (h, r"^.*\.pdf$", False, 6),
            (h, "^/page1", False, 6),
            (h, "^/page1", True, 6),  # exact tie -> allow wins
        ]
    rules = spark.createDataFrame(
        rules_rows, "host string, regex string, is_allow boolean, priority int"
    )
    return robots_gate_rfc(cands, rules).select(
        "host", "url_canon", "robots_blocked"
    )


def q_sitemap_entries(spark, sf_dir):
    """Rich sitemap urlset extraction (S7+): per-<url> blocks carrying
    <lastmod>/<priority> parsed back into (host, url, lastmod, priority)
    with the spec's 0.5 priority default — all JVM regex
    (sources/robots_txt.py::sitemap_url_entries). XML synthesized
    deterministically from document rows; every third doc omits priority,
    every fourth omits lastmod."""
    from smartcrawler_spark.sources.robots_txt import sitemap_url_entries

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    d = F.col("doc_id")
    pr = F.when(
        d % 3 != 0,
        F.concat(F.lit("<priority>0."), (d % 9 + 1).cast("string"),
                 F.lit("</priority>")),
    ).otherwise(F.lit(""))
    lm = F.when(
        d % 4 != 0,
        F.concat(F.lit("<lastmod>2024-01-"),
                 F.lpad((d % 28 + 1).cast("string"), 2, "0"),
                 F.lit("</lastmod>")),
    ).otherwise(F.lit(""))
    block = F.concat(
        F.lit("<url><loc>https://"), F.col("source"), F.lit(".example.com/doc"),
        d.cast("string"), F.lit("</loc>"), lm, pr, F.lit("</url>"),
    )
    xml = docs.groupBy("source").agg(
        F.concat(
            F.lit("<urlset>"),
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", block.alias("e")))),
                    lambda s: s["e"],
                ),
            ),
            F.lit("</urlset>"),
        ).alias("sitemap_xml")
    )
    return sitemap_url_entries(xml, host_col="source", xml_col="sitemap_xml")


def _synthetic_frontier(spark, sf_dir):
    """Frontier-shaped rows derived from orders (deterministic): status
    from o_orderstatus, round_fetched from the key for non-PENDING rows."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 4000)
    k = F.col("o_orderkey")
    host = F.concat(F.lit("h"), (F.col("o_custkey") % 50).cast("string"),
                    F.lit(".example.com"))
    status = (
        F.when(F.col("o_orderstatus") == "O", "PENDING")
        .when(F.col("o_orderstatus") == "F", "SUCCESS")
        .otherwise("FAILED")
    )
    return o.select(
        F.concat(F.lit("https://"), host, F.lit("/p"), k.cast("string")).alias("url_canon"),
        F.xxhash64(k.cast("string")).alias("url_hash"),
        host.alias("host"),
        (k % 17 == 0).alias("is_root"),
        F.round((k % 100) / 10.0, 1).alias("score"),
        status.alias("status"),
        F.when(status != "PENDING", (k % 30).cast("int"))
        .otherwise(F.lit(None).cast("int")).alias("round_fetched"),
    )


_SYNTH_FRONTIER_SQL = """
            SELECT 'https://h' || CAST(o_custkey % 50 AS VARCHAR)
                     || '.example.com/p' || CAST(o_orderkey AS VARCHAR) AS url_canon,
                   'h' || CAST(o_custkey % 50 AS VARCHAR) || '.example.com' AS host,
                   o_orderkey % 17 = 0 AS is_root,
                   round((o_orderkey % 100) / 10.0, 1) AS score,
                   CASE o_orderstatus WHEN 'O' THEN 'PENDING'
                        WHEN 'F' THEN 'SUCCESS' ELSE 'FAILED' END AS status,
                   CASE WHEN o_orderstatus <> 'O'
                        THEN CAST(o_orderkey % 30 AS INT) END AS round_fetched
            FROM orders WHERE o_orderkey < 4000
"""


def q_refresh_due(spark, sf_dir):
    """Freshness/recrawl scheduling (operators.frontier.refresh_due):
    SUCCESS rows fetched >= `interval` rounds ago become refresh
    candidates, stalest first; predicate pushdown reaches the scan."""
    fr = _synthetic_frontier(spark, sf_dir)
    return FR.refresh_due(fr, round_no=40, interval=15).select(
        "url_canon", "host", "rounds_stale"
    )


def q_embedding_quantize(spark, sf_dir):
    """Scalar (SQ8) embedding quantization (operators/similarity.
    quantize_embeddings): per-vector min/max range + clamped floor codes,
    computed in double precision on both engines so the integer codes
    hash identically; exploded to (vec_id, pos, code)."""
    from smartcrawler_spark.operators import similarity as SIM

    emb = _t(spark, sf_dir, "embeddings")
    q = SIM.quantize_embeddings(emb)
    return q.select("vec_id", F.posexplode("codes").alias("pos", "code"))


def q_export_manifest(spark, sf_dir):
    """Deterministic export manifest (sources/export.export_manifest):
    md5-mod shard assignment + order-independent per-shard content
    checksums (sum of md5-int60 row serializations mod 2^63) over
    (doc_id, text) — the integrity artifact export_dataset writes."""
    from smartcrawler_spark.sources import export as EX

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return EX.export_manifest(docs, "doc_id", 8)


def q_update_intervals(spark, sf_dir):
    """Publish-cadence revisit intervals (plans.analysis.
    intervals_from_updates): events as a per-host update log -> mean
    inter-update spacing in epoch seconds -> clamped rounds. All
    integral; keys with one update emit nothing."""
    from smartcrawler_spark.plans.analysis import intervals_from_updates

    ev = _t(spark, sf_dir, "events")
    ups = ev.select(
        F.concat(F.lit("h"), (F.col("user_id") % 20).cast("string"))
        .alias("host"),
        "ts",
    )
    return intervals_from_updates(ups, seconds_per_round=3600,
                                  max_interval=48)


def q_revalidate_robots(spark, sf_dir):
    """Robots rule-change revalidation (operators/frontier.
    revalidate_pending): PENDING frontier rows re-gated against a new
    prefix rule set; output = the now-disallowed queue entries."""
    fr = _synthetic_frontier(spark, sf_dir)
    robots = spark.createDataFrame(
        [(f"h{i}.example.com", "/p1") for i in range(10)],
        "host string, disallow_prefix string",
    )
    return FR.revalidate_pending(fr, robots=robots).select(
        "url_canon", "host"
    )


def q_retry_backoff(spark, sf_dir):
    """Failure retry with exponential backoff (operators/frontier.
    retry_due): FAILED rows re-enter after base*2^(attempts-1) rounds,
    capped at max_retries; attempt counts synthesized from the url key
    (the production source is attempts_from_log over the crawl log)."""
    fr = _synthetic_frontier(spark, sf_dir)
    att = fr.select(
        "url_canon",
        (1 + F.regexp_extract("url_canon", r"/p(\d+)$", 1).cast("int") % 4)
        .cast("long")
        .alias("n_attempts"),
    )
    return FR.retry_due(fr, att, round_no=40, base_backoff=2,
                        max_retries=3).select(
        "url_canon", "host", "n_attempts", "rounds_waited"
    )


def q_shard_assign(spark, sf_dir):
    """Rendezvous-hash shard assignment (operators/frontier.
    assign_shards): every distinct host pinned to the argmax-weight
    shard of 8 — the consistent placement a politeness-sharded fetch
    fleet uses (ties break to the higher shard, md5 arithmetic
    engine-replayable)."""
    hosts = _synthetic_frontier(spark, sf_dir).select("host").distinct()
    return FR.assign_shards(hosts, 8)


def q_dup_content_hosts(spark, sf_dir):
    """Duplicate-content trap-host detection (operators/frontier.
    duplicate_content_hosts): hosts whose URL space explodes over
    near-constant content. Synthesized pages: md5-parity hosts serve 4
    URL variants per document (identical text -> identical fingerprint),
    the rest 1 — planted traps trip the integer dup-ratio + volume floor,
    clean hosts don't. Crawl-loop wiring: EngineConfig.
    dup_trap_detect_every (tests/test_trap_loop.py e2e)."""
    docs = _t(spark, sf_dir, "documents")
    nv = F.when(
        F.expr("ascii(substring(md5(host), 1, 1)) % 2 = 0"), F.lit(4)
    ).otherwise(F.lit(1))
    pages = (
        docs.select(F.col("source").alias("host"), "doc_id", "text")
        .withColumn("_nv", nv)
        .withColumn("v", F.explode(F.sequence(F.lit(0), F.col("_nv") - 1)))
        .select(
            "host",
            F.concat_ws("/", F.col("host"), F.col("doc_id").cast("string"),
                        F.col("v").cast("string")).alias("url_canon"),
            F.md5("text").alias("fingerprint"),
        )
    )
    return FR.duplicate_content_hosts(pages, min_urls=50, trap_ratio_bp=5000)


def q_priority_aging(spark, sf_dir):
    """Starvation-free priority aging (operators/frontier.age_priority):
    PENDING rows rank with effective score = score + rounds_waited * 0.25
    (weight_bp 2500 — an exact binary fraction, so the aged doubles are
    IEEE-exact and the per-host top-3 is engine-reproducible). round_added
    synthesized as o_orderkey % 7, round_no = 10. Crawl-loop wiring:
    EngineConfig.aging_weight_bp."""
    fr = _synthetic_frontier(spark, sf_dir).filter(F.col("status") == "PENDING")
    fr = fr.withColumn(
        "round_added",
        (F.regexp_extract("url_canon", r"/p(\d+)$", 1).cast("long") % 7)
        .cast("int"),
    )
    aged = FR.age_priority(fr, round_no=10, weight_bp=2500)
    top = FR.top_k_per_group(
        aged, ["host"],
        [F.col("is_root").desc(), F.col("score").desc(),
         F.col("url_canon").asc()],
        k=3,
    )
    return top.select(
        "host", "url_canon",
        (F.lit(10) - F.col("round_added")).cast("long").alias("rounds_waited"),
    )


def q_host_stats(spark, sf_dir):
    """Per-host crawl health rollup (plans.analysis.host_report): lifecycle
    counts + success rate over attempted fetches; one hash aggregation."""
    from smartcrawler_spark.plans.analysis import host_report

    return host_report(_synthetic_frontier(spark, sf_dir))


def q_crawl_progress(spark, sf_dir):
    """Per-round crawl progress rollup (plans.analysis.crawl_progress):
    admissions by round_added, fetch outcomes by round_fetched, full
    outer merge, cumulative frontier size over rounds. round_added
    synthesized from the url key (o_orderkey % 25). All-integer."""
    from smartcrawler_spark.plans.analysis import crawl_progress

    fr = _synthetic_frontier(spark, sf_dir).withColumn(
        "round_added",
        (F.regexp_extract("url_canon", r"/p(\d+)$", 1).cast("int") % 25),
    )
    return crawl_progress(fr)


def q_adaptive_budget(spark, sf_dir):
    """Failure-aware politeness budgets (operators.frontier.
    adaptive_budgets): hosts whose FAILED share of attempted fetches
    reaches 1/2 get their budget halved (floor 1); integer arithmetic
    end-to-end. One hash agg + a broadcast full-outer join with the
    budgets dim."""
    fr = _synthetic_frontier(spark, sf_dir)
    budgets = spark.range(25).select(
        F.concat(F.lit("h"), F.col("id").cast("string"),
                 F.lit(".example.com")).alias("host"),
        ((F.col("id") % 5) + 2).cast("int").alias("budget"),
    )
    return FR.adaptive_budgets(fr, budgets, default_budget=4)


def q_weighted_sample(spark, sf_dir):
    """Deterministic weighted Bernoulli sampling (operators.sampling.
    weighted_sample): keep probability = min(n_chars * 8192, 2^24) parts
    per 2^24 — integer thresholds against a portable md5-derived 24-bit
    uniform, so longer docs survive more often and membership is a pure
    function of (doc_id, salt)."""
    from smartcrawler_spark.operators import sampling as SA

    docs = _t(spark, sf_dir, "documents")
    w = F.least(F.col("n_chars").cast("long") * 8192, F.lit(1 << 24))
    return SA.weighted_sample(docs, w).select("doc_id", "u24")


def q_temperature_mix(spark, sf_dir):
    """Temperature-scaled source mixing, alpha=1/2 integer-exact kernel
    (operators.sampling.temperature_mix_sqrt): per-source keep rates
    target an output distribution ∝ sqrt(n_source), thresholds computed
    entirely in bigint (floor-sqrt weights, integer div) against the
    portable md5 24-bit draw — zero float ops that could diverge
    across engines."""
    from smartcrawler_spark.operators import sampling as SA

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 600)
    out = SA.temperature_mix_sqrt(docs, total_target=200)
    return out.select("source", "doc_id", "n_group", "p24", "u24")


def q_gopher_rules(spark, sf_dir):
    """Gopher document-quality rule bundle (Rae et al. 2021 §A1.1) as pure
    Column exprs: word-count/mean-word-length windows, symbol ratio,
    bullet/ellipsis line fractions, alpha-word fraction, the 8-stopword
    floor, and the composite gopher_pass gate."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    g = T.gopher_rules(F.col("text"))
    return docs.select(
        "doc_id",
        g["n_words"].alias("n_words"),
        g["mean_word_len"].alias("mean_word_len"),
        g["symbol_ratio"].alias("symbol_ratio"),
        g["alpha_word_frac"].alias("alpha_word_frac"),
        g["n_gopher_stopwords"].alias("n_gopher_stopwords"),
        g["gopher_pass"].alias("gopher_pass"),
    )


def q_c4_filters(spark, sf_dir):
    """C4 line-cleaning rules (Raffel et al. 2020 §2.2): terminal
    punctuation, per-line word floor, lorem-ipsum/javascript drops, and
    the >=3-kept-lines + no-curly page gate. Document text is re-lined at
    sentence boundaries first so the line rules have real lines to act
    on."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    relined = F.regexp_replace(F.col("text"), r"\. ", ".\n")
    c4 = T.c4_line_filters(relined)
    return docs.select(
        "doc_id",
        c4["n_lines"].alias("n_lines"),
        c4["n_lines_kept"].alias("n_lines_kept"),
        F.md5(c4["cleaned"]).alias("cleaned_md5"),
        c4["page_keep"].alias("page_keep"),
    )


def q_crawl_order_emission(spark, sf_dir):
    """W2 — deterministic total-order emission (crawl_log shape)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    w = Window.orderBy(F.col("value").desc(), F.col("event_id").asc())
    return ev.select(
        F.row_number().over(w).alias("seq"), "event_id", F.round("value", 2).alias("value")
    )


def q_crawl_two_rounds(spark, sf_dir):
    """Composed crawl-loop shape (E1/E3), two admission rounds with carried
    frontier state: seeds -> discover (join) -> seen anti-join -> skew-safe
    per-host top-k -> deterministic crawl-order emission; round-2 candidates
    re-discover round-1 URLs (lineitems point back at their order), so the
    seen anti-join does real work. Oracle = chained CTEs in DuckDB."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    seeds = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 20 == 0)
        .select(
            F.concat(F.lit("https://c"), F.col("c_custkey").cast("string")).alias("url_canon"),
            F.col("c_custkey").alias("key"),
        )
    )
    order_rank = [F.col("score").desc(), F.col("url_canon").asc()]

    def emit(adm, rnd):
        w = Window.orderBy(*order_rank)
        return adm.select(
            F.lit(rnd).alias("rnd"), F.row_number().over(w).alias("seq"), "url_canon"
        )

    cand1 = orders.join(
        seeds.select(F.col("key").alias("o_custkey")), "o_custkey"
    ).select(
        F.concat(F.lit("https://o"), F.col("o_orderkey").cast("string")).alias("url_canon"),
        F.concat(F.lit("h"), (F.col("o_custkey") % 10).cast("string")).alias("host"),
        F.col("o_totalprice").alias("score"),
        F.col("o_orderkey").alias("okey"),
    )
    seen0 = seeds.select("url_canon")
    novel1 = cand1.join(seen0, "url_canon", "left_anti")
    adm1 = FR.top_k_per_group(novel1, ["host"], order_rank, k=5)
    seen1 = seen0.unionByName(adm1.select("url_canon"))

    cand2 = li.join(
        adm1.select(F.col("okey").alias("l_orderkey")), "l_orderkey"
    ).select(
        F.when(
            F.col("l_linenumber") == 1,
            F.concat(F.lit("https://o"), F.col("l_orderkey").cast("string")),
        ).otherwise(
            F.concat(
                F.lit("https://l"), F.col("l_orderkey").cast("string"),
                F.lit("-"), F.col("l_linenumber").cast("string"),
            )
        ).alias("url_canon"),
        F.concat(F.lit("h"), (F.col("l_suppkey") % 10).cast("string")).alias("host"),
        F.col("l_extendedprice").alias("score"),
    )
    novel2 = cand2.join(seen1, "url_canon", "left_anti")
    adm2 = FR.top_k_per_group(novel2, ["host"], order_rank, k=5)
    return emit(adm1, 1).unionByName(emit(adm2, 2))


def q_url_canonicalize(spark, sf_dir):
    """P2/P3 — URL canonicalization + is_root + host extraction."""
    docs = _t(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("HTTP://"), F.col("source"), F.lit(".Example.COM:80/d/"), F.col("doc_id"),
        F.when(F.col("doc_id") % 3 == 0, "?q=1").otherwise(""),
    )
    canon = U.canonicalize_url(raw)
    return docs.select(
        "doc_id",
        canon.alias("url_canon"),
        U.url_host(canon).alias("host"),
        U.is_root_url(canon).alias("is_root"),
    )


def q_url_traps(spark, sf_dir):
    """Spider-trap heuristics + tracking-param stripping
    (functions.urls.is_trap_url / strip_tracking_params): five synthetic
    URL shapes per doc bucket — clean, deep path, mirror cycle, calendar
    spam, query/tracking spam — flagged by the pure-Column trap bounds
    and rewritten with tracking params removed."""
    docs = _t(spark, sf_dir, "documents")
    host = F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com"))
    sid = F.col("doc_id").cast("string")
    raw = (
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(host, F.lit("/d/"), sid))
        .when(F.col("doc_id") % 5 == 1,
              F.concat(host, F.lit("/a/b/c/d/e/f/g/h/i/j/k/l/m/n/"), sid))
        .when(F.col("doc_id") % 5 == 2,
              F.concat(host, F.lit("/en/about/en/about/en/"), sid))
        .when(F.col("doc_id") % 5 == 3,
              F.concat(host, F.lit("/2026/08/17/2026/08/"), sid))
        .otherwise(
            F.concat(host, F.lit("/p?a=1&utm_source=feed&b=2&gclid="), sid,
                     F.lit("&utm_medium=x&c=3&d=4&e=5&f=6&g=7&h=8")))
    )
    return docs.select(
        "doc_id",
        raw.alias("url"),
        U.path_depth(raw).cast("long").alias("depth"),
        U.dup_segment_count(raw).cast("long").alias("dup_segs"),
        U.numeric_segment_count(raw).cast("long").alias("num_segs"),
        U.query_param_count(raw).cast("long").alias("n_params"),
        U.is_trap_url(raw, max_depth=12, max_dup_segments=2,
                      max_numeric_segments=4, max_query_params=8,
                      max_len=512).alias("is_trap"),
        U.strip_tracking_params(raw).alias("stripped"),
    )


def q_redirect_resolve(spark, sf_dir):
    """Redirect-chain resolution (operators.linkgraph.resolve_redirects):
    pointer-doubling (log2(max_hops) self-joins) over a synthetic
    functional redirect map — consecutive-id chains broken every 10 ids,
    plus a planted 2-cycle — must equal a sequential hop-capped walk
    (the DuckDB recursive-CTE oracle): final node, exact hop count,
    loop flag."""
    from smartcrawler_spark.operators import linkgraph as LG

    docs = _t(spark, sf_dir, "documents")
    edges = docs.filter(F.col("doc_id") % 10 < 6).select(
        F.col("doc_id").alias("src"), (F.col("doc_id") + 1).alias("dst"))
    cycle = spark.createDataFrame([(-1, -2), (-2, -1)], "src long, dst long")
    return LG.resolve_redirects(edges.unionByName(cycle), max_hops=16)


def q_pagerank(spark, sf_dir):
    """Fixed-point integer PageRank (operators.linkgraph.
    pagerank_fixed_point, 3 iterations, d=0.85, scale=1e9): every step is
    bigint arithmetic with a pinned op order, so ranks are bit-identical
    to the oracle's unrolled-CTE evaluation — no float summation-order
    divergence."""
    from smartcrawler_spark.operators import linkgraph as LG

    docs = _t(spark, sf_dir, "documents")
    edges = docs.select(
        (F.col("doc_id") % 97).alias("src"),
        ((F.col("doc_id") * F.col("doc_id") * 3 + 1) % 97).alias("dst"),
    )
    out = LG.pagerank_fixed_point(edges, iters=3)
    return out.select("node", F.col("rank").alias("pr"))


def q_opic(spark, sf_dir):
    """Batch OPIC crawl importance (operators.linkgraph.opic_fixed_rounds,
    3 rounds, scale=1e9): cash/history power accumulation with the paper's
    virtual page for dangling cash (Abiteboul et al., WWW 2003). Nodes
    ≡ 0 (mod 7) have their out-edges removed, so the dangling-pool path
    (1-row in-plan broadcast + uniform return) is genuinely exercised.
    All-bigint with pinned op order — the oracle unrolls the same three
    rounds and matches bit-for-bit."""
    from smartcrawler_spark.operators import linkgraph as LG

    docs = _t(spark, sf_dir, "documents")
    edges = docs.select(
        (F.col("doc_id") % 89).alias("src"),
        ((F.col("doc_id") * 13 + 7) % 89).alias("dst"),
    ).filter(F.col("src") % 7 != 0)
    return LG.opic_fixed_rounds(edges, iters=3)


def q_shingle_containment(spark, sf_dir):
    """Asymmetric shingle containment (operators.dedup.
    shingle_containment_pairs): ordered (inner_id, outer_id) pairs where
    >= min_pct of the inner doc's 3-gram shingles appear in the outer doc
    — the quote/subset detector symmetric Jaccard misses. Integer pct
    (100*common div inner_size), df_cap=100 mirrors the engine's
    quadratic control in the oracle."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    return DD.shingle_containment_pairs(docs, n=3, min_pct=20, df_cap=100)


def q_page_directives(spark, sf_dir):
    """Robots-meta / rel=nofollow / canonical / base extraction
    (sources.html_ingest.extract_directives_docs, one Arrow mapInPandas
    tree walk): HTML is synthesized deterministically from doc_id so the
    oracle can compute every expected field in closed form — the ENGINE
    must still parse real markup (quoted attrs, rel token lists, a
    googlebot-meta decoy, a duplicate canonical that must lose)."""
    from smartcrawler_spark.sources.html_ingest import extract_directives_docs

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    did = F.col("doc_id")
    robots = (
        F.when(did % 4 == 0, F.lit('<meta name="robots" content="noindex">'))
        .when(did % 4 == 1, F.lit('<meta name="robots" content="NOFOLLOW">'))
        .when(did % 4 == 2, F.lit('<meta name="robots" content="none">'))
        .otherwise(F.lit('<meta name="googlebot" content="noindex">'))
    )
    canon = F.when(
        did % 5 == 0,
        F.concat(F.lit('<link rel="canonical" href="https://c.example.com/p'),
                 did.cast("string"),
                 F.lit('"><link rel="canonical" href="https://loser.example.com/">')),
    ).otherwise(F.lit(""))
    base = F.when(did % 11 == 0,
                  F.lit('<base href="https://b.example.com/dir/">')
                  ).otherwise(F.lit(""))
    anchors = F.when(
        did % 7 == 0,
        F.lit('<a href="/nf1" rel="nofollow">x</a>'
              '<a href="/nf2" rel="ugc sponsored">y</a>'),
    ).when(did % 7 == 1, F.lit('<a href="/nf3" rel="sponsored">z</a>')
           ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<html><head>"), robots, canon, base,
        F.lit('</head><body><a href="/plain" rel="noopener">p</a>'),
        anchors, F.lit("<p>"), F.substring(F.col("text"), 1, 20),
        F.lit("</p></body></html>"),
    )
    return extract_directives_docs(
        docs.select(did.cast("string").alias("doc_id"), html.alias("html")))


def q_x_robots_flags(spark, sf_dir):
    """X-Robots-Tag header interpretation (sources.warc._hdr_flag, pure
    JVM higher-order functions): comma-separated directive lists with
    mixed case, whitespace, agent-scoped segments ('googlebot: noindex'
    — ignored for the generic-agent model), 'none' implying both flags,
    and empty headers. Header strings are synthesized deterministically
    from doc_id; the oracle replays the same tokenization in SQL."""
    from smartcrawler_spark.sources.warc import _hdr_flag

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 600)
    did = F.col("doc_id")
    hdr = (
        F.when(did % 8 == 0, F.lit("noindex, nofollow"))
        .when(did % 8 == 1, F.lit(" NOINDEX "))
        .when(did % 8 == 2, F.lit("none"))
        .when(did % 8 == 3, F.lit("googlebot: noindex, nofollow"))
        .when(did % 8 == 4, F.lit("nofollow, noarchive"))
        .when(did % 8 == 5, F.lit("noindex\ngooglebot: nofollow"))
        .when(did % 8 == 6,
              F.lit("unavailable_after: 25 Jun 2026, noindex"))
        .otherwise(F.lit(""))
    )
    return docs.select(
        "doc_id",
        _hdr_flag(hdr, "noindex", "none").alias("noindex"),
        _hdr_flag(hdr, "nofollow", "none").alias("nofollow"),
    )


def q_charset_decode(spark, sf_dir):
    """Charset sniff+decode (sources.charset.decode_payloads, one Arrow
    pandas UDF, map-only): fixed byte vectors covering the WHATWG
    detection ladder — BOMs > Content-Type charset > meta prescan (1024-
    byte window) > utf-8-replace fallback — vs a golden parquet whose
    expected text/encoding were computed INDEPENDENTLY in
    tools/gen_golden.py (direct known-truth codec decode, no sniffing)."""
    from smartcrawler_spark.sources.charset import decode_payloads, gate_cases

    df = spark.createDataFrame(
        gate_cases(), "case_id string, payload binary, content_type string")
    return decode_payloads(df).select("case_id", "text", "encoding")


def q_datacard(spark, sf_dir):
    """Corpus datacard rollup (plans.analysis.corpus_datacard): per
    (split, lang) doc counts, token totals and length spread — split
    assigned by the engine's md5 hash_split, token counts by the engine
    tokenizer; the oracle replays both (the md5-bucket arithmetic and
    the token regexp) in DuckDB. All-integer."""
    from smartcrawler_spark.functions.textops import token_count
    from smartcrawler_spark.operators.sampling import hash_split
    from smartcrawler_spark.plans.analysis import corpus_datacard

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
    d = hash_split(docs).withColumn("n_tokens", token_count(F.col("text")))
    return corpus_datacard(d)


def q_incremental_dedup(spark, sf_dir):
    """Incremental-ingestion dedup (operators.dedup.dedup_against_corpus,
    exact tier): a 'new batch' (doc_id 200-699) anti-joined against the
    existing corpus (doc_id < 400) on the normalized-text fingerprint —
    the overlap region (200-399) must vanish. The oracle anti-joins on
    the normalized text itself (the fingerprint is engine-internal)."""
    from smartcrawler_spark.operators.dedup import dedup_against_corpus

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") < 400).select("doc_id", "text")
    new = docs.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 700)) \
              .select("doc_id", "text")
    out = dedup_against_corpus(new, corpus)
    return out.select("doc_id", F.md5("text").alias("text_md5"))


def q_uniform_sample(spark, sf_dir):
    """Deterministic uniform k-per-group sampling (operators.sampling.
    uniform_sample_k): k smallest md5(id|salt) draws per language — the
    seeded, engine-portable reservoir; oracle replays the draw + window
    rank in DuckDB."""
    from smartcrawler_spark.operators.sampling import uniform_sample_k

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000) \
        .select("doc_id", "lang")
    return uniform_sample_k(docs, k=25, salt="gate")


def q_stratified_sample(spark, sf_dir):
    """Exact stratified sampling (operators.sampling.stratified_sample):
    largest-remainder apportionment of a 100-row budget across languages
    (integer-exact, sum(quota) == 100 — frontier.apportion_budget) then
    the quota smallest md5 draws per stratum (two-phase salted per-group
    ranking). The 'sample exactly N docs stratified by lang' corpus-
    assembly primitive; oracle replays apportionment + draws in SQL."""
    from smartcrawler_spark.operators.sampling import stratified_sample

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_sample(docs, total=100, group_col="lang")


def q_chunk_documents(spark, sf_dir):
    """Fixed-size token-window chunking with overlap (operators.sampling
    .chunk_documents): 32-token windows every 24 tokens (8-token
    overlap), ragged tail kept, token-less docs emit nothing. Pure
    Column expressions (tokenize once, explode a chunk-index sequence,
    slice + rejoin); chunk text gated as md5 to keep rows narrow."""
    from smartcrawler_spark.operators.sampling import chunk_documents

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    out = chunk_documents(docs, chunk_tokens=32, overlap=8)
    return out.select("doc_id", "chunk_idx",
                      F.md5("text").alias("chunk_md5"), "n_tokens")


def q_url_templates(spark, sf_dir):
    """URL template mining (functions.urls.url_template_stats): digit
    runs -> {n}, long hex runs -> {hex}, then a (template -> n_urls,
    n_hosts) profile — the spider-trap / faceted-navigation signature.
    URLs synthesized from `documents` with both digit and md5-hex
    segments; the oracle replays the regexp chain in DuckDB."""
    from smartcrawler_spark.functions.urls import url_template_stats

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 800)
    d = F.col("doc_id")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/sec"),
        (d % 5).cast("string"), F.lit("/doc"), d.cast("string"),
        F.when(d % 4 == 0,
               F.concat(F.lit("/"),
                        F.substring(F.md5(d.cast("string")), 1, 12)))
        .otherwise(F.lit("")),
    )
    return url_template_stats(docs.select(url.alias("url_canon")))


def q_host_graph(spark, sf_dir):
    """Host-level link graph (operators.linkgraph.host_link_graph):
    anchor spans aggregated to (src_host, dst_host, n_links, n_pages)
    edges with self-loops dropped — the rollup host-centrality
    (pagerank/HITS) runs on. Span docs synthesized from `documents`
    (each doc links to two arithmetic-derived hosts, one of which may
    collide with its own host and must then be dropped)."""
    from smartcrawler_spark.operators.linkgraph import host_link_graph

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 600)
    d = F.col("doc_id")

    def link(expr):
        return F.struct(
            F.lit("a").alias("kind"), F.lit("x").alias("text"),
            F.concat(F.lit("https://src"), expr.cast("string"),
                     F.lit(".example.com/p"), d.cast("string")).alias("media_ref"),
            F.lit(0).cast("int").alias("offset"),
        )

    span_docs = docs.select(
        F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com/p"),
                 d.cast("string")).alias("doc_id"),
        F.concat(F.col("source"), F.lit(".example.com")).alias("host"),
        F.array(link((d * 3) % 20), link((d * 7 + 1) % 20)).alias("spans"),
    )
    return host_link_graph(span_docs)


# Mirrors tools/gen_golden.py IMAGE_INFO_CASES literally — the golden
# table is the synthesis parameters; the parser under test contributes
# nothing to its own oracle.
_IMAGE_INFO_CASES = [
    ("i01.png", "png", 31, 24, False, 0),
    ("i02.ppm", "ppm", 23, 17, False, 0),
    ("i03.jpg", "jpeg", 16, 16, False, 0),
    ("i04.jpg", "jpeg", 33, 20, True, 0),
    ("i05.jpg", "jpeg", 24, 8, False, 6),
    ("i06.jpg", "jpeg", 40, 9, True, 8),
    ("i07.bin", "unknown", None, None, None, None),
]


def _exif_app1_segment(orientation: int) -> bytes:
    import struct as _st

    tiff = (b"II" + _st.pack("<H", 42) + _st.pack("<I", 8)
            + _st.pack("<H", 1) + _st.pack("<HHI", 0x0112, 3, 1)
            + _st.pack("<H", orientation) + b"\x00\x00" + _st.pack("<I", 0))
    body = b"Exif\x00\x00" + tiff
    return b"\xFF\xE1" + _st.pack(">H", len(body) + 2) + body


def q_image_stream_info(spark, sf_dir):
    """Header-only image metadata (multimodal.image_stream_info_table):
    dims, bit depth, SOF2 progressive flag, EXIF IFD0 orientation, APNG/
    GIF frame counts — no pixel decode. Inputs are REAL files produced by
    the engine's own encoders (PNG/PPM/baseline+progressive JPEG, EXIF
    APP1 spliced after SOI); the golden oracle is the encoder parameter
    table (tools/gen_golden.py golden_image_stream_info)."""
    import numpy as np

    from smartcrawler_spark import multimodal as MM
    from smartcrawler_spark.jpeg import (encode_jpeg_baseline,
                                         encode_jpeg_progressive)

    rows = []
    for i, (ref, fmt, w, h, prog, orient) in enumerate(_IMAGE_INFO_CASES):
        if fmt == "unknown":
            payload = b"\x00\x01\x02 not an image"
        else:
            px = np.random.default_rng(i).integers(
                0, 256, (h, w, 3), dtype=np.uint8)
            if fmt == "png":
                payload = MM.encode_png(px)
            elif fmt == "ppm":
                payload = MM.encode_ppm(px)
            else:
                enc = encode_jpeg_progressive if prog else encode_jpeg_baseline
                payload = enc(px, quality=85)
                if orient:
                    payload = payload[:2] + _exif_app1_segment(orient) + payload[2:]
        rows.append((ref, bytearray(payload)))
    raw = spark.createDataFrame(rows, "media_ref string, payload binary")
    return MM.image_stream_info_table(raw)


# Mirrors tools/gen_golden.py IMAGE_DHASH_CASES / _dhash_case_pixels
# literally (pixel SYNTHESIS is shared input data; the dHash oracle there
# is an independent per-box double loop, vs the engine's integral-image
# kernel). Encodings here are LOSSLESS (PNG/PPM) so the golden can derive
# every hash from known pixel truth without running the engine decoder.
_IMAGE_DHASH_CASES = [
    ("img00.png", 0, 48, 36, None), ("img01.ppm", 1, 64, 48, None),
    ("img02.png", 2, 32, 24, None), ("img03.ppm", 3, 80, 60, None),
    ("img04.png", 4, 40, 40, None), ("img05.ppm", 5, 56, 42, None),
    ("img06.png", 6, 72, 54, None), ("img07.ppm", 7, 24, 20, None),
    ("img08.png", 8, 60, 44, None), ("img09.ppm", 9, 36, 28, None),
    ("img10.png", 10, 52, 38, None), ("img11.ppm", 11, 44, 34, None),
    ("img00_twin.ppm", 0, 48, 36, None), ("img03_twin.png", 3, 80, 60, None),
    ("img01_near.png", 1, 64, 48, 24), ("img04_near.ppm", 4, 40, 40, 24),
    ("img06_near.png", 6, 72, 54, 32), ("img08_near.ppm", 8, 60, 44, 24),
    ("img02_far.png", 2, 32, 24, 120), ("img05_far.ppm", 5, 56, 42, 120),
]


def _dhash_case_pixels(seed, w, h, variant_amp):
    import numpy as np

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255 // max(w - 1, 1)).astype(np.int64)
    g = (yy * 255 // max(h - 1, 1)).astype(np.int64)
    b = ((xx + yy) * 127 // max(w + h - 2, 1)).astype(np.int64)
    px = np.stack([r, g, b], axis=-1)
    for _ in range(5):
        x0 = int(rng.integers(0, max(w - 4, 1)))
        y0 = int(rng.integers(0, max(h - 4, 1)))
        bw = int(rng.integers(3, max(w // 3, 4)))
        bh = int(rng.integers(3, max(h // 3, 4)))
        val = rng.integers(0, 256, 3)
        px[y0:y0 + bh, x0:x0 + bw] = (px[y0:y0 + bh, x0:x0 + bw] + val) // 2
    if variant_amp is not None and variant_amp <= 32:
        vrng = np.random.default_rng(1000 + seed)
        bh, bw = max(h // 8, 1), max(w // 9, 1)
        for _ in range(2):
            y0 = int(vrng.integers(0, max(h - bh, 1)))
            x0 = int(vrng.integers(0, max(w - bw, 1)))
            px[y0:y0 + bh, x0:x0 + bw] += variant_amp
    elif variant_amp is not None:
        px[: h // 2, : w // 2] += variant_amp
        px[h // 2:, w // 2:] -= variant_amp
    return px.clip(0, 255).astype(np.uint8)


def _image_dhash_raw(spark):
    import numpy as np

    from smartcrawler_spark import multimodal as MM

    rows = []
    for ref, seed, w, h, amp in _IMAGE_DHASH_CASES:
        px = _dhash_case_pixels(seed, w, h, amp)
        enc = MM.encode_png if ref.endswith(".png") else MM.encode_ppm
        rows.append((ref, bytearray(enc(px))))
    # undecodable / sub-grid payloads: the operator must DROP these
    rows.append(("junk0.bin", bytearray(b"\x00\x01 not an image")))
    rows.append(("tiny0.ppm", bytearray(MM.encode_ppm(
        np.zeros((6, 6, 3), dtype=np.uint8)))))
    return spark.createDataFrame(rows, "media_ref string, payload binary")


def q_image_dhash(spark, sf_dir):
    """Perceptual 64-bit difference hash per image (operators.imagedup):
    decode (in-repo PNG/PPM codecs here; JPEG/GIF/BMP in pytest) ->
    integer luma -> 8x9 integer box-mean grid -> horizontal gradient
    sign bits. Map-only, zero Exchange. Oracle: golden parquet whose
    hashes derive from KNOWN pixel truth via an independent per-box
    double-loop dHash (tools/gen_golden.py golden_image_dhash); junk and
    sub-grid inputs must be dropped."""
    from smartcrawler_spark.operators import imagedup as ID

    return ID.image_dhash_table(_image_dhash_raw(spark))


def q_image_dhash_pairs(spark, sf_dir):
    """Image near-dup pairs at hamming <= 6 via exact multi-index
    banding (8 disjoint 8-bit bands -> equi-join -> bit_count filter;
    pigeonhole makes recall perfect for k <= 7). The banded exchange
    carries (id64, dhash, band) longs only; refs join back once. Oracle:
    brute-force O(n^2) hamming over the golden known-truth hashes
    (tools/gen_golden.py golden_image_dhash_pairs)."""
    from smartcrawler_spark.operators import imagedup as ID

    hashes = ID.image_dhash_table(_image_dhash_raw(spark))
    return ID.dhash_near_dup(hashes, max_hamming=6)


# Video gate corpus: MJPEG-AVIs whose scene structure (and therefore
# shot table and frame-set overlap) is known by CONSTRUCTION — each
# scene repeats one encoded JPEG byte-identically, scene images are the
# dHash case pixels whose pairwise distance (>= 10 bits, measured and
# pinned by the imagedup golden gate) clears the threshold (5) while
# identical bytes decode to hamming 0. The oracles are literal
# parameter tables, the image_stream_info convention.
_VIDEO_SCENES = {  # ref -> list of (seed, n_frames) scenes, 48x36 q85
    "vidA.avi": [(0, 4), (5, 3), (13, 5)],
    "vidB.avi": [(5, 2), (0, 6)],
    "vidC.avi": [(13, 3)],
    # APNG twin of vidC: same scenes, LOSSLESS container — the
    # cross-container video-dedup case (JPEG-tier dHash stability at
    # this size/quality makes its hashes equal vidC's)
    "vidC_apng.png": [(13, 3)],
}


def _video_raw(spark):
    from smartcrawler_spark import multimodal as MM

    rows = []
    for ref, scenes in sorted(_VIDEO_SCENES.items()):
        frames = []
        for seed, n in scenes:
            px = _dhash_case_pixels(seed, 48, 36, None)
            frames.extend([px] * n)
        if ref.endswith(".png"):
            payload = MM.encode_apng(frames)
        else:
            payload = MM.encode_avi_mjpeg(frames, quality=85)
        rows.append((ref, bytearray(payload)))
    rows.append(("junk.bin", bytearray(b"RIFFnope")))
    return spark.createDataFrame(rows, "media_ref string, payload binary")


# Audio gate corpus: clips built from bin-centered tones — each segment
# spans whole analysis frames (multiples of 256 samples) at an integer
# number of cycles per frame, so the dominant rFFT bin per frame IS the
# construction parameter and the landmark table is parameter-derived.
# audC is byte-different (FLAC vs WAV) but sample-identical to audA:
# the cross-codec near-dup case.
_AUDIO_CLIPS = {  # ref -> [(bin, n_frames)], frame=256, rate=8000
    "audA.wav": [(32, 8), (77, 8)],
    "audB.wav": [(50, 6), (77, 10)],
    "audC.flac": [(32, 8), (77, 8)],
}
_AUDIO_FRAME = 256


def _audio_clip_samples(segments):
    import numpy as np

    parts = []
    for b, n in segments:
        i = np.arange(n * _AUDIO_FRAME)
        parts.append(0.5 * np.sin(2 * np.pi * b * i / _AUDIO_FRAME))
    # quantize to int16 once so WAV and FLAC encode IDENTICAL samples
    x = np.concatenate(parts)
    return np.round(x * 32767).astype(np.int64)


def _audio_raw(spark):
    from smartcrawler_spark import multimodal as MM
    from smartcrawler_spark.flac import encode_flac

    rows = []
    for ref, segs in sorted(_AUDIO_CLIPS.items()):
        q = _audio_clip_samples(segs)
        if ref.endswith(".flac"):
            payload = encode_flac(q, rate=8000, bps=16)
        else:
            payload = MM.encode_wav(q.astype("float64") / 32768.0, rate=8000)
        rows.append((ref, bytearray(payload)))
    rows.append(("junk.bin", bytearray(b"not audio")))
    return spark.createDataFrame(rows, "media_ref string, payload binary")


def _audio_peak_values():
    """DuckDB VALUES table of per-frame peak bins, straight from the
    clip construction parameters."""
    rows = []
    for ref, segs in sorted(_AUDIO_CLIPS.items()):
        t = 0
        for b, n in segs:
            for _ in range(n):
                rows.append(f"('{ref}', {t}, {b})")
                t += 1
    return "(VALUES " + ", ".join(rows) + ") AS pk(media_ref, t, b)"


def q_audio_fingerprints(spark, sf_dir):
    """Constellation audio fingerprints (operators/audiodup): decode
    (WAV + FLAC paths both exercised) -> dominant rFFT bin per frame ->
    landmark hash (b1<<20 | b2<<10 | dt). Map-only. Oracle: the peak
    bins are construction parameters (bin-centered whole-frame tones),
    so the landmark table is a self-join over a VALUES table."""
    from smartcrawler_spark.operators import audiodup as AD

    return AD.audio_fingerprint_table(
        _audio_raw(spark), frame=_AUDIO_FRAME, fanout=1)


def q_audio_overlap(spark, sf_dir):
    """Audio near-dup: landmark-set containment between clips (the
    generic videodup overlap over fp longs). audA (WAV) vs audC (FLAC)
    carry identical samples -> containment 10000 bp both ways — the
    cross-codec dedup case; A/B and B/C share one landmark (the common
    77-bin segment's self-pair)."""
    from smartcrawler_spark.operators import audiodup as AD

    fps = AD.audio_fingerprint_table(
        _audio_raw(spark), frame=_AUDIO_FRAME, fanout=1)
    return AD.audio_overlap(fps)


# Archive gate corpus: member names/bodies are construction parameters,
# so the oracle is a literal table (md5s computed from the same dict at
# oracle-build time — oracle_sql() is python).
_ARCHIVE_MEMBERS = {
    "bundle1.zip": [("docs/a.txt", b"alpha alpha"), ("docs/b.txt", b"beta"),
                    ("img/c.bin", bytes(range(64)))],
    "bundle2.tar.gz": [("x.txt", b"xray"), ("deep/path/y.txt", b"yankee " * 9)],
}


def _archive_raw(spark):
    import gzip
    import io
    import tarfile
    import zipfile

    rows = []
    for ref, members in sorted(_ARCHIVE_MEMBERS.items()):
        buf = io.BytesIO()
        if ref.endswith(".zip"):
            with zipfile.ZipFile(buf, "w") as zf:
                for name, body in members:
                    zf.writestr(name, body)
            payload = buf.getvalue()
        else:
            with tarfile.open(fileobj=buf, mode="w") as tf:
                for name, body in members:
                    info = tarfile.TarInfo(name)
                    info.size = len(body)
                    tf.addfile(info, io.BytesIO(body))
            payload = gzip.compress(buf.getvalue(), mtime=0)
        rows.append((ref, bytearray(payload)))
    rows.append(("junk.bin", bytearray(b"not an archive")))
    return spark.createDataFrame(rows, "archive_ref string, payload binary")


def q_archive_members(spark, sf_dir):
    """Archive ingestion (sources/archive.archive_member_table): ZIP and
    gzip-TAR payloads flatten to one row per member file, map-only,
    damage-tolerant (the junk payload contributes nothing). Payload
    gated as md5; the oracle is the construction-parameter member
    table."""
    from smartcrawler_spark.sources.archive import archive_member_table

    out = archive_member_table(_archive_raw(spark))
    return out.select("archive_ref", "member", "kind", "n_bytes",
                      F.md5("payload").alias("member_md5"))


def q_video_shots(spark, sf_dir):
    """Video shot segmentation (operators/videodup.shot_bounds): MJPEG
    frame decode -> per-frame integer dHash (map-only) -> one window per
    video cutting where consecutive-frame hamming > 5. Within-scene
    frames are byte-identical (hamming 0); cuts measure >= 10 bits —
    the margin that makes the construction-parameter oracle exact."""
    from smartcrawler_spark.operators import videodup as VD

    frames = VD.frame_dhash_table(_video_raw(spark))
    return VD.shot_bounds(frames, threshold=5)


def q_video_frame_overlap(spark, sf_dir):
    """Frame-set containment between videos (operators/videodup
    .video_frame_overlap): distinct frame hashes per video, candidate
    pairs via an exact equi-join on dhash longs (never all-pairs),
    integer-div containment basis points. Shared scenes reuse the same
    encoded bytes, so the overlap counts are construction parameters."""
    from smartcrawler_spark.operators import videodup as VD

    frames = VD.frame_dhash_table(_video_raw(spark))
    return VD.video_frame_overlap(frames)


# Mirrors tools/gen_golden.py _cdc_payload / CDC_REFS literally (payload
# SYNTHESIS is shared input data; the chunking oracle there is the scalar
# Gear recurrence, independent of the engine's vectorized kernel).
def _cdc_payload(ref: str) -> bytes:
    import hashlib

    blocks = [hashlib.blake2b(f"cdc-block-{j}".encode(),
                              digest_size=32).digest() * 8
              for j in range(8)]
    seq = [int(hashlib.md5(f"{ref}|{i}".encode()).hexdigest(), 16) % 8
           for i in range(24)]
    return b"".join(blocks[j] for j in seq)


def _cdc_raw(spark):
    rows = [(ref, bytearray(_cdc_payload(ref)))
            for ref in [f"m{i:02d}" for i in range(12)]]
    return spark.createDataFrame(rows, "media_ref string, payload binary")


def q_cdc_chunks(spark, sf_dir):
    """Content-defined chunking (operators.dedup.cdc_chunk_table): Gear
    rolling hash, vectorized as a 64-term windowed sum; the golden oracle
    recomputes every boundary with the textbook per-byte recurrence
    (tools/gen_golden.py golden_cdc_chunks) over the same deterministic
    block payloads — vectorization bugs cannot cancel."""
    from smartcrawler_spark.operators.dedup import cdc_chunk_table

    return cdc_chunk_table(_cdc_raw(spark))


def q_cdc_stats(spark, sf_dir):
    """Corpus CDC dedup ratio (operators.dedup.cdc_dedup_stats) over the
    same chunk table; the oracle replays the two-level aggregation in SQL
    over the golden chunk parquet. All-integer output."""
    from smartcrawler_spark.operators.dedup import (cdc_chunk_table,
                                                    cdc_dedup_stats)

    return cdc_dedup_stats(cdc_chunk_table(_cdc_raw(spark)))


def q_robots_sitemap_discovery(spark, sf_dir):
    """Sitemap discovery from robots.txt `Sitemap:` records
    (sources.robots_txt.sitemap_urls_from_robots): case/space/CRLF
    tolerant JVM regexp over synthesized robots files (one per source,
    doc_id-derived sitemap URLs, one lowercase + indented variant, one
    non-group Disallow line in between)."""
    from smartcrawler_spark.sources.robots_txt import sitemap_urls_from_robots

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    line = F.concat(F.lit("Sitemap: https://"), F.col("source"),
                    F.lit(".example.com/sm"),
                    (F.col("doc_id") % 7).cast("string"), F.lit(".xml"))
    robots = docs.groupBy("source").agg(
        F.concat(
            F.lit("User-agent: *\nDisallow: /private\n"),
            F.concat_ws("\n", F.array_sort(F.collect_set(line))),
            F.lit("\n  sitemap:https://"), F.col("source"),
            F.lit(".example.com/extra.xml\nCrawl-delay: 2\n"),
        ).alias("robots_text")
    ).select(F.col("source").alias("host"), "robots_text")
    return sitemap_urls_from_robots(df=robots)


def q_cluster_survivors(spark, sf_dir):
    """Quality-aware canonical selection over dedup clusters
    (operators.dedup.cluster_survivors): per cluster keep the
    highest-quality member (tie -> min id) and map every member to it.
    Clusters and scores synthesized from `documents` (component =
    doc_id % 97, score = n_chars); the oracle replays the argmax with a
    window. All-integer/boolean output."""
    from smartcrawler_spark.operators.dedup import cluster_survivors

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
    clusters = docs.select("doc_id", (F.col("doc_id") % 97).alias("component"))
    quality = docs.select("doc_id", F.col("n_chars").alias("score"))
    return cluster_survivors(clusters, quality)


def q_hits(spark, sf_dir):
    """Integer fixed-point HITS hubs/authorities (operators.linkgraph.
    hits_fixed_point, 2 iterations, scale=1e9): divide-first rescale in
    place of the float L2 norm, pinned bigint op order — the DuckDB
    oracle unrolls the same two iterations as CTEs and matches exactly."""
    from smartcrawler_spark.operators import linkgraph as LG

    docs = _t(spark, sf_dir, "documents")
    edges = docs.select(
        (F.col("doc_id") % 97).alias("src"),
        ((F.col("doc_id") * F.col("doc_id") * 3 + 1) % 97).alias("dst"),
    )
    return LG.hits_fixed_point(edges, iters=2)


def q_warc_ingest(spark, sf_dir):
    """WARC archive ingest (sources.warc.read_warc): binaryFile scan +
    stdlib mapInPandas parse over the deterministic fixture files
    (gzip-member + plain + truncated-tail shapes). The oracle is the
    WRITER'S input manifest (tools/gen_warc_fixture.py golden parquet),
    so the gate proves the parser exactly inverts the serialization —
    writer and parser share no parse logic."""
    from smartcrawler_spark.sources import warc as W

    recs = W.read_warc(spark, "/root/repo/fixtures/warc")
    return recs.select(
        "file", "warc_type", "url", "date", "record_id",
        "http_status", "content_type", "payload_md5", "n_bytes")


# Mirrors tools/gen_golden.py AUDIO_INFO_CASES literally — the golden
# generator re-derives the expected values from the container specs'
# framing arithmetic without importing the parser; tests/test_golden.py
# keeps the two lists in lockstep.
_AUDIO_INFO_CASES = [
    ("a01.mp3", "mp3", dict(version=1, layer=3, kbps=128, rate=44100, ch=2, n=38, xing=False)),
    ("a02.mp3", "mp3", dict(version=2, layer=3, kbps=64, rate=22050, ch=1, n=50, xing=False)),
    ("a03.mp3", "mp3", dict(version=1, layer=2, kbps=192, rate=48000, ch=2, n=20, xing=False)),
    ("a04.mp3", "mp3", dict(version=1, layer=1, kbps=256, rate=32000, ch=2, n=20, xing=False)),
    ("a05.mp3", "mp3", dict(version=2.5, layer=3, kbps=16, rate=8000, ch=1, n=12, xing=False)),
    ("a06.mp3", "mp3", dict(version=1, layer=3, kbps=128, rate=44100, ch=2, n=100, xing=True)),
    ("a07.opus", "ogg", dict(codec="opus", rate=48000, ch=2, n_pages=4, spp=48000, preskip=312, body=420)),
    ("a08.opus", "ogg", dict(codec="opus", rate=24000, ch=1, n_pages=6, spp=12000, preskip=104, body=200)),
    ("a09.ogg", "ogg", dict(codec="vorbis", rate=44100, ch=1, n_pages=3, spp=44100, body=420)),
    ("a10.ogg", "ogg", dict(codec="vorbis", rate=11025, ch=2, n_pages=5, spp=5000, body=300)),
    ("a11.flac", "flac", dict(rate=96000, ch=2, bps=24, total=480000, frame_bytes=4096)),
    ("a12.flac", "flac", dict(rate=44100, ch=1, bps=16, total=44100, frame_bytes=1000)),
    ("a13.wav", "wav", dict(rate=8000, n=8000)),
    ("a14.bin", "junk", dict()),
]


def q_anchor_relevance(spark, sf_dir):
    """Anchor-text relevance aggregation (operators.frontier.
    anchor_relevance): incoming-link anchor text votes for its target —
    the focused-crawler admission signal. Span docs are synthesized
    JVM-side from `documents` (every doc gets an in-domain anchor whose
    text embeds its lang token, plus a hub anchor for doc_id%3==0, plus a
    text span and a media span that must be ignored); the DuckDB oracle
    re-derives targets and integer keyword hits directly from the table.
    All-integer outputs — hash-safe."""
    from smartcrawler_spark.operators.frontier import anchor_relevance

    kw = {"doc": 1, "en": 2, "fr": 3, "hub": 5}
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 600)
    d = F.col("doc_id")
    a1 = F.struct(
        F.lit("a").alias("kind"),
        F.concat(F.lit("Read doc "), F.col("lang"), F.lit(" now")).alias("text"),
        F.concat(F.lit("/doc"), ((d * 7) % 311).cast("string")).alias("media_ref"),
        F.lit(0).cast("int").alias("offset"),
    )
    a2 = F.struct(
        F.lit("a").alias("kind"),
        F.concat(F.lit("hub "), F.col("source")).alias("text"),
        F.concat(F.lit("https://"), F.col("source"),
                 F.lit(".example.com/hub")).alias("media_ref"),
        F.lit(1).cast("int").alias("offset"),
    )
    noise_text = F.struct(
        F.lit("text").alias("kind"), F.lit("hub doc en").alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        F.lit(2).cast("int").alias("offset"),
    )
    noise_media = F.struct(
        F.lit("media").alias("kind"), F.lit(None).cast("string").alias("text"),
        F.lit("img.png").alias("media_ref"), F.lit(3).cast("int").alias("offset"),
    )
    spans = F.when(d % 3 == 0, F.array(a1, a2, noise_text, noise_media)) \
        .otherwise(F.array(a1, noise_text, noise_media))
    span_docs = docs.select(
        F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com/p"),
                 d.cast("string")).alias("doc_id"),
        F.concat(F.col("source"), F.lit(".example.com")).alias("host"),
        spans.alias("spans"),
    )
    return anchor_relevance(span_docs, kw)


def q_audio_stream_info(spark, sf_dir):
    """Compressed-audio stream metadata (multimodal.audio_stream_info_table):
    header-only MP3/Ogg/FLAC/WAV parse — codec, rate, channels, duration,
    bitrate, frame count — over deterministically synthesized containers.
    The oracle is golden parquet whose values come from the SPECS' framing
    arithmetic (tools/gen_golden.py golden_audio_stream_info), never from
    the parser, so the gate proves parse == spec on the production
    mapInPandas path."""
    import numpy as np

    from smartcrawler_spark import multimodal as MM

    rows = []
    for ref, kind, p in _AUDIO_INFO_CASES:
        if kind == "mp3":
            payload = MM.encode_mp3_stream(
                n_frames=p["n"], bitrate_kbps=p["kbps"], rate=p["rate"],
                version=p["version"], layer=p["layer"], channels=p["ch"],
                xing=p["xing"])
        elif kind == "ogg":
            payload = MM.encode_ogg_stream(
                p["codec"], rate=p["rate"], channels=p["ch"],
                n_pages=p["n_pages"], samples_per_page=p["spp"],
                preskip=p.get("preskip", 312),
                page_body_bytes=p["body"])
        elif kind == "flac":
            payload = MM.encode_flac_info(
                rate=p["rate"], channels=p["ch"], bps=p["bps"],
                total_samples=p["total"], frame_bytes=p["frame_bytes"])
        elif kind == "wav":
            payload = MM.encode_wav(np.zeros(p["n"]), p["rate"])
        else:
            payload = b"\x00\x01\x02 not audio"
        rows.append((ref, bytearray(payload)))
    raw = spark.createDataFrame(rows, "media_ref string, payload binary")
    return MM.audio_stream_info_table(raw)


_MP3_DECODE_CASES = [
    ("m01.mp3", dict(line=26, n=9216, ch=1)),            # 1014.45 Hz mono
    ("m02.mp3", dict(line=78, n=9216, ch=1)),            # 3005.47 Hz mono
    ("m03.mp3", dict(line=26, line2=52, n=9216, ch=2)),  # stereo, distinct tones
    ("m04.mp3", dict(line=130, n=4608, ch=1)),           # 4996 Hz, short clip
    ("m05.bin", dict(junk=True)),
]


def q_mp3_decode(spark, sf_dir):
    """Full MPEG-1 Layer III decode (mp3.decode_mp3: side info, Huffman,
    requantization, alias reduction, IMDCT, polyphase synthesis) over
    in-repo encoder fixtures, Arrow-batched via mapInPandas — the
    production decode shape.  The oracle is golden parquet derived from
    SIGNAL PHYSICS only (tools/gen_golden.py golden_mp3_decode): each
    decoded channel's FFT-dominant tone must land on the fixture's MDCT
    line and the sample count must be exactly n_frames*1152, so a
    window/sign/indexing bug anywhere in the decode chain shifts a
    golden value.  Reference lineage: the reference drops media refs
    (/root/reference/src/html_parser.rs:116-123); this is the enrich
    tier on top."""
    import numpy as np
    import pandas as pd

    from smartcrawler_spark import mp3 as M3

    rate = 44100
    rows = []
    for ref, p in _MP3_DECODE_CASES:
        if p.get("junk"):
            payload = b"\x00\x01\x02 not audio" * 4
        else:
            t = np.arange(p["n"])
            tone = lambda line: 0.5 * np.sin(
                2 * np.pi * ((line + 0.5) * rate / 1152) / rate * t)
            x = (np.stack([tone(p["line"]), tone(p["line2"])], axis=1)
                 if p["ch"] == 2 else tone(p["line"]))
            payload = M3.encode_mp3_fixture(x)
        rows.append((ref, bytearray(payload)))
    raw = spark.createDataFrame(rows, "media_ref string, payload binary")
    schema = ("media_ref string, sample_rate int, channels int, "
              "n_samples int, line0 int, line1 int")
    cols = ["media_ref", "sample_rate", "channels", "n_samples",
            "line0", "line1"]

    def batches(it):
        for pdf in it:
            out = []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                dec = M3.decode_mp3(bytes(payload))
                if dec is None:
                    out.append((ref, None, None, None, None, None))
                    continue
                samples, sr = dec
                lines = []
                for ch in range(samples.shape[1]):
                    x = samples[1024:1024 + 8192, ch]
                    n = len(x)
                    sp = np.abs(np.fft.rfft(x * np.hanning(n)))
                    f = float(np.argmax(sp)) * sr / n
                    lines.append(int(round(f / (sr / 1152.0) - 0.5)))
                out.append((ref, sr, samples.shape[1], samples.shape[0],
                            lines[0], lines[1] if len(lines) > 1 else None))
            yield pd.DataFrame(out, columns=cols)

    return raw.mapInPandas(batches, schema)


def q_template_rewrite_sql(spark, sf_dir):
    """R1-R6 (SQL-expressible core) — count/like-pattern rewrite."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_replace(
            F.col("text"), r"(\d+) (comments|likes|views|points)", r"{count} $2"
        ).alias("templated"),
    )


_SYNTH_UNITS = ["days", "hours", "minutes", "points", "comments", "items",
                "rows", "blobs"]


def q_template_detect(spark, sf_dir):
    """R1-R6 FULL semantics gate: try-each-occurrence + context naming +
    validation (/root/reference/src/template_detection.rs:143-255) over
    deterministically synthesized numeric content (the corpus text has no
    digits, so raw text would gate nothing). The engine side runs the real
    detect_template_udf; the DuckDB oracle implements the reference's
    decision table independently (derived by hand from the spec, validated
    0/6000 against the kernel — covers: float-pass-first, occurrence order,
    time/count/value naming by next-word / two-ahead-'ago' / prev-'page'
    context, validity via vocabulary words INCLUDING digit-attached tokens
    that clean to indicators, and the \\b\\d+\\b no-match on attached
    digits)."""
    from smartcrawler_spark.functions.templates import detect_template_udf

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
    d = F.col("doc_id")
    units = F.array(*[F.lit(u) for u in _SYNTH_UNITS])
    u1 = F.element_at(units, (d % 8 + 1).cast("int"))
    u2 = F.element_at(units, (F.floor(d / 8).cast("long") % 8 + 1).cast("int"))
    n1 = (d % 90 + 1).cast("string")
    n2 = ((d * 7) % 90 + 1).cast("string")
    w1 = F.element_at(
        F.array(F.lit("bravo"), F.lit("ago"), F.lit("page")), (d % 3 + 1).cast("int")
    )
    v = d % 4
    content = (
        F.when(v == 0, F.concat_ws(" ", F.lit("alpha"), n1, u1, w1, n2, u2))
        .when(v == 1, F.concat(F.lit("alpha "), n1, u1, F.lit(" "), w1,
                               F.lit(" "), n2, F.lit(" "), u2))
        .when(v == 2, F.concat(F.lit("alpha "), n1, F.lit(" "), u1, F.lit(" "),
                               w1, F.lit(" "), n2, u2))
        .otherwise(F.concat(F.lit("alpha "), n1, F.lit(".5 "), u1, F.lit(" "),
                            w1, F.lit(" "), n2, F.lit(" "), u2))
    )
    hit = detect_template_udf(content)
    return docs.select(
        "doc_id",
        hit["pattern"].alias("pattern"),
        hit["var_name"].alias("var_name"),
        hit["var_type"].alias("var_type"),
    )


# --------------------------------------------------------------------------
# T3/T5/T6 span-tree gates over deterministically synthesized trees
# --------------------------------------------------------------------------


def _synth_tree_docs(spark, sf_dir, n_docs: int = 500, max_nodes: int = 20):
    """Deterministic span/node trees from documents.text: node i = word i of
    the cleaned text (first `max_nodes`), subtree size = 1 + len(word) % 3
    (truncated at the document end), path = words[1..i], spans aligned 1:1
    with nodes by offset. The identical construction is replicated in the
    DuckDB oracles, so the span/tree kernels get rows+schema+hash gates."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < n_docs)
    words = F.slice(
        F.filter(
            F.split(F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))), " "),
            lambda x: x != "",
        ),
        1, max_nodes,
    )
    n = F.size(words)

    def node(i):
        w = F.element_at(words, i)
        return F.struct(
            i.cast("int").alias("offset"),
            w.alias("tag"),
            F.array().cast("array<string>").alias("classes"),
            F.lit(None).cast("string").alias("id"),
            w.alias("content"),
            F.least(F.lit(1) + F.length(w) % 3, n - i + 1).cast("int").alias("size"),
            F.slice(words, 1, i).alias("path"),
        )

    def span(i):
        return F.struct(
            F.lit("p").alias("kind"),
            F.element_at(words, i).alias("text"),
            F.lit("").alias("media_ref"),
            i.cast("int").alias("offset"),
        )

    seq = F.sequence(F.lit(1), n)
    return docs.filter(n >= 1).select(
        "doc_id",
        F.col("source").alias("host"),
        F.transform(seq, span).alias("spans"),
        F.transform(seq, node).alias("nodes"),
    )


def q_subtree_hashes(spark, sf_dir):
    """T5 — per-node pre-order subtree signatures, portable md5 twin of the
    blake2b kernel (same slice algorithm, oracle-checkable; reference
    NodeSignature /root/reference/src/storage.rs:377-422)."""
    from smartcrawler_spark.operators import spans as SP

    synth = _synth_tree_docs(spark, sf_dir)
    z = SP.with_signatures(synth, portable=True)
    return z.select(
        "doc_id", F.explode(F.arrays_zip("nodes", "sigs")).alias("z")
    ).select(
        "doc_id",
        F.col("z.nodes.offset").cast("long").alias("pos"),
        F.col("z.sigs").alias("sig"),
    )


def q_find_by_path(spark, sf_dir):
    """T3 — find_by_path EXACT emit multiplicity (the reference recursion's
    subsequence-embedding count, /root/reference/src/html_parser.rs:48-106)
    on synthesized ancestor chains; oracle counts ordered embeddings via a
    self-join."""
    from smartcrawler_spark.operators.spans import find_by_path

    synth = _synth_tree_docs(spark, sf_dir)
    hits = find_by_path(synth, "table value a", portable=True)
    return hits.select(
        "doc_id", "host", F.col("offset").cast("long").alias("pos"),
        "content", "multiplicity",
    )


def q_mark_duplicates(spark, sf_dir):
    """T6/D4/D5 — the full duplicate pipeline: occurrence-counted domain
    duplicates (>=2-pages guard, structural-tag exclusion) -> broadcast
    semi-mark -> structure-preserving span rewrite
    (/root/reference/src/html_parser.rs:204-229, storage.rs:119-195) — all
    on the portable md5 signature twin so DuckDB replays it exactly."""
    from smartcrawler_spark.operators import spans as SP

    synth = _synth_tree_docs(spark, sf_dir)
    dups = SP.domain_duplicates(synth, portable=True)
    marked = SP.mark_duplicates(synth, dups, portable=True)
    return marked.select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id",
        F.col("s.offset").cast("long").alias("pos"),
        F.col("s.text").alias("text"),
    )


def q_sitemap_roundtrip(spark, sf_dir):
    """S7 — sitemap.xml ingestion: build one urlset XML per source from
    document URLs, parse the <loc> values back out with the engine's JVM
    regex extractor (sources/robots_txt.py::sitemap_urls_from_xml)."""
    from smartcrawler_spark.sources.robots_txt import sitemap_urls_from_xml

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    loc = F.concat(
        F.lit("<url><loc>https://"), F.col("source"), F.lit(".example.com/doc"),
        F.col("doc_id").cast("string"), F.lit("</loc></url>"),
    )
    xml = docs.groupBy("source").agg(
        F.concat(
            F.lit("<urlset>"),
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", loc.alias("e")))),
                    lambda s: s["e"],
                ),
            ),
            F.lit("</urlset>"),
        ).alias("sitemap_xml")
    )
    return sitemap_urls_from_xml(xml, host_col="source", xml_col="sitemap_xml")


def q_feed_entries(spark, sf_dir):
    """RSS/Atom feed ingestion roundtrip: build one RSS feed (even
    doc_ids) and one Atom feed (odd doc_ids) per source from document
    URLs, parse entries back out with the engine's JVM regex extractor
    (sources/feeds.py::feed_entries), and parse the published dates
    (both RFC 822 and ISO 8601) to tz-proof epoch seconds. The oracle
    computes the expected entries directly from `documents` — a true
    independent roundtrip check."""
    from smartcrawler_spark.sources.feeds import (feed_entries,
                                                  feed_published_ts)

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    url = F.concat(F.lit("https://"), F.col("source"),
                   F.lit(".example.com/doc"), F.col("doc_id").cast("string"))
    sec = F.lpad((F.col("doc_id") % 60).cast("string"), 2, "0")
    day = F.lpad(((F.col("doc_id") % 27) + 1).cast("string"), 2, "0")
    item = F.concat(
        F.lit("<item><title>Doc "), F.col("doc_id").cast("string"),
        F.lit("</title><link>"), url,
        F.lit("</link><pubDate>Mon, 10 Aug 2026 12:00:"), sec,
        F.lit(" GMT</pubDate></item>"))
    entry = F.concat(
        F.lit('<entry><title>Doc '), F.col("doc_id").cast("string"),
        F.lit('</title><link rel="alternate" href="'), url,
        F.lit('"/><updated>2026-08-'), day,
        F.lit("T08:00:00Z</updated></entry>"))

    def feed_xml(body, head, tail):
        return F.concat(
            F.lit(head),
            F.concat_ws("", F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id",
                                                     body.alias("e")))),
                lambda s: s["e"])),
            F.lit(tail))

    rss = (docs.filter(F.col("doc_id") % 2 == 0).groupBy("source")
           .agg(feed_xml(item, '<rss version="2.0"><channel>',
                         "</channel></rss>").alias("feed_xml"))
           .select(F.concat(F.col("source"), F.lit("-rss")).alias("host"),
                   "feed_xml"))
    atom = (docs.filter(F.col("doc_id") % 2 == 1).groupBy("source")
            .agg(feed_xml(entry, '<feed xmlns="http://www.w3.org/2005/Atom">',
                          "</feed>").alias("feed_xml"))
            .select(F.concat(F.col("source"), F.lit("-atom")).alias("host"),
                    "feed_xml"))
    out = feed_entries(rss.unionByName(atom))
    return out.select(
        "host", "kind", "url", "published", "title",
        F.unix_timestamp(feed_published_ts(F.col("published")))
        .alias("published_epoch"))


def q_explode_distinct(spark, sf_dir):
    """T4/D2/D3 — explode + distinct (link-set dedup shape)."""
    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        "lang", F.explode(F.split(F.col("text"), " ")).alias("w")
    ).filter(F.col("w") != "")
    return words.groupBy("lang").agg(F.countDistinct("w").alias("n_words"))


def q_text_clean(spark, sf_dir):
    """P7 — trim + whitespace collapse."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return docs.select("doc_id", T.clean_text(F.col("text")).alias("cleaned"))


# ----- training-data ops ---------------------------------------------------


def q_dedup_exact(spark, sf_dir):
    """Exact dedup: survivor per normalized-text group."""
    docs = _t(spark, sf_dir, "documents")
    return DD.exact_dedup(docs)


def q_line_dedup(spark, sf_dir):
    """C4-style cross-corpus line dedup: first occurrence of every
    eligible (>=10 trimmed chars) line survives, later copies are cut
    and documents reassembled. Text is re-lined at sentence boundaries
    first (same trick as c4_filters) so the corpus has real lines."""
    docs = (_t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
            .withColumn("text",
                        F.regexp_replace(F.col("text"), r"\. ", ".\n")))
    out = DD.line_dedup_corpus(docs)
    return out.select(
        "doc_id",
        F.md5("text_deduped").alias("deduped_md5"),
        "n_lines",
        "n_lines_kept",
    )


def q_winnow_fingerprints(spark, sf_dir):
    """Winnowing passage fingerprints (Schleimer et al., SIGMOD 2003):
    per doc, md5-24bit hash every 8-token gram and keep the rightmost
    minimum of each 4-hash sliding window — local fingerprints that
    guarantee any shared passage of >= k+window-1 tokens collides on at
    least one identical (fp). Pure JVM higher-order functions, no UDF,
    no shuffle; the DuckDB oracle replays the exact md5/hex arithmetic."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    return DD.winnow_fingerprints(docs, k=8, window=4)


def q_duplicate_passages(spark, sf_dir):
    """Per-doc duplicated-passage coverage from winnowing fingerprints:
    share of a doc's fingerprints selected by >= 2 distinct docs, in
    integer basis points (float-free gate discipline). Localizes WHICH
    passages are boilerplate, complementing whole-doc MinHash/SimHash."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    return DD.duplicate_passages(docs, k=8, window=4)


def q_exact_substring_spans(spark, sf_dir):
    """Exact-substring duplication map (Lee et al. 2022 ExactSubstr,
    position-level k-gram re-expression): maximal spans of tokens whose
    10-gram occurs >= 2 times corpus-wide. One map-side-combined shuffle
    on gram hashes + a per-doc-bounded window; never all-pairs. The
    DuckDB oracle replays the gram/island arithmetic on gram STRINGS
    (same equivalence classes as the portable md5 keying)."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    return DD.exact_substring_spans(docs, k=10, portable=True)


def q_exact_substring_removal(spark, sf_dir):
    """Exact-substring dedup, removal form: duplicated >=10-gram spans
    are cut from all but the corpus-first occurrence (deterministic
    (doc_id,pos)-min survivor) and documents reassembled from surviving
    tokens. md5 of the deduped text keeps the gate row narrow."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    out = DD.exact_substring_removal(docs, k=10, portable=True)
    return out.select(
        "doc_id",
        F.md5("text_deduped").alias("deduped_md5"),
        "n_tokens",
        "n_tokens_kept",
    )


def q_hll_registers(spark, sf_dir):
    """HyperLogLog register table per source (operators.sketches): md5-48bit
    hash -> top-8-bit register routing -> leading-zero rank, aggregated by
    groupBy(source, bucket).max(rho) — the mergeable, bounded-size distinct
    sketch (keys x 256 rows out regardless of input rows). All-integer
    output; the float estimate is consumer-side (pytest-verified)."""
    docs = _t(spark, sf_dir, "documents")
    return SK.hll_registers(docs, ["source"], "doc_id", b=8, nbits=48)


def q_cms_registers(spark, sf_dir):
    """Count-min frequency sketch per lang (operators.sketches): 4 x 64
    integer counters over the source column — bounded-exchange hot-item
    counting (counter rows <= keys x depth x width no matter the input);
    mergeable by SUM. Point queries are consumer-side (pytest: one-sided
    guarantee + eps*N bound)."""
    docs = _t(spark, sf_dir, "documents")
    return SK.cms_registers(docs, ["lang"], "source", depth=4, width=64)


def q_kmv_registers(spark, sf_dir):
    """K-minimum-values sketch per source over text fingerprints
    (operators.sketches): the 32 smallest distinct md5-48bit hashes —
    supports distinct estimates AND set operations (union/intersection),
    which HLL cannot. Two-phase salted top-k, skew-safe."""
    docs = _t(spark, sf_dir, "documents").withColumn("fp", F.md5("text"))
    return SK.kmv_registers(docs, ["source"], "fp", k=32)


def q_kmv_overlap(spark, sf_dir):
    """Pairwise corpus-overlap estimate between sources from KMV sketches:
    k smallest hashes of sketch(a) UNION sketch(b), count in both —
    n_common/k_used estimates Jaccard(A,B). All-integer, dimension-sized
    (2*k*S^2 longs regardless of corpus size)."""
    docs = _t(spark, sf_dir, "documents").withColumn("fp", F.md5("text"))
    regs = SK.kmv_registers(docs, ["source"], "fp", k=32)
    return SK.kmv_overlap_pairs(regs, "source", k=32)


def q_corpus_diff(spark, sf_dir):
    """Snapshot-to-snapshot corpus diff (plans.analysis.corpus_diff):
    added/removed/changed/unchanged per doc across two simulated crawl
    rounds (old = id%7!=0; new = id%5!=0 with id%3==0 texts edited). One
    co-partitioned full outer join on the id."""
    from smartcrawler_spark.plans import analysis as AN

    docs = _t(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 7 != 0)
    new = docs.filter(F.col("doc_id") % 5 != 0).withColumn(
        "text",
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.col("text"), F.lit(" v2")))
        .otherwise(F.col("text")))
    return AN.corpus_diff(old, new)


def q_log2_histogram(spark, sf_dir):
    """Integer-exact power-of-two histogram of doc length per source
    (operators.sketches.log2_histogram): bucket = bit_length-1 via
    length(bin(v)) — no float log. keys x 64 rows max, SUM-mergeable;
    factor-of-2 quantiles consumer-side (pytest)."""
    docs = _t(spark, sf_dir, "documents")
    return SK.log2_histogram(docs, ["source"], "n_chars")


def q_dedup_minhash(spark, sf_dir):
    """MinHash-LSH near-dup dedup survivors (blake2b production kernel).
    Gated against golden parquet from tools/gen_golden.py (independent
    pure-Python oracle, bit-exact; tests/test_golden.py enforces)."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    return DD.minhash_dedup(docs, num_perm=64, bands=16).select("doc_id")


def q_minhash_lsh_portable(spark, sf_dir):
    """MinHash+LSH candidate pairs with the engine-portable md5 kernel —
    the ORACLE-CHECKED specification of the MinHash path (8 perms, 2-row
    bands; the blake2b Arrow kernel is the throughput twin)."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 600)
    return DD.minhash_lsh_pairs_portable(docs, num_perm=8, band_rows=2)


def q_dedup_simhash(spark, sf_dir):
    """SimHash near-dup candidate pairs (blake2b production kernel). Gated
    against golden parquet from tools/gen_golden.py (independent
    pure-Python oracle, bit-exact; tests/test_golden.py enforces)."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    return DD.simhash_candidate_pairs(docs, max_hamming=6)


def q_simhash_portable(spark, sf_dir):
    """SimHash near-dup pairs with the engine-portable md5 kernel — the
    ORACLE-CHECKED specification of the SimHash path (the blake2b Arrow
    kernel behind `dedup_simhash` is the throughput twin)."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return DD.simhash_pairs_portable(docs, bits=16, n_chunks=4, max_hamming=3)


def q_dedup_clusters(spark, sf_dir):
    """Near-dup CLUSTERS: connected components (iterative min-label
    propagation) over exact 3-gram-Jaccard candidate pairs; every doc gets
    its component's min doc_id as cluster (itself if isolated). The step
    that turns pair lists into a per-component survivor choice."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    edges = DD.ngram_jaccard_pairs(docs, n=3, threshold=0.05, df_cap=100)
    return DD.dedup_clusters(docs, edges)


def q_decontamination(spark, sf_dir):
    """Benchmark decontamination: docs (doc_id % 50 != 0) sharing any word
    5-gram with the synthetic eval split (doc_id % 50 == 0) are flagged;
    broadcast n-gram join, corpus never shuffled."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    train = docs.filter(F.col("doc_id") % 50 != 0)
    evals = docs.filter(F.col("doc_id") % 50 == 0)
    return DD.mark_contaminated(train, evals, n=5)


def q_repetition_profile(spark, sf_dir):
    """Gopher-style repetition quality signals per doc (duplicate-2gram
    fraction + top-word share)."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return T.repetition_profile(docs)


def q_pii_redaction(spark, sf_dir):
    """PII scrub over synthesized contact strings (emails / IPv4s / phone
    numbers derived deterministically from customer keys)."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 500)
    k = F.col("c_custkey")
    text = F.concat(
        F.lit("Reach "), F.col("c_name"),
        F.lit(" at user"), k.cast("string"), F.lit("@mail.example.com, ip 10.0."),
        (k % 256).cast("string"), F.lit("."), ((k * 7) % 256).cast("string"),
        F.lit(", tel 555-"), F.lpad((k % 1000).cast("string"), 3, "0"),
        F.lit("-"), F.lpad(((k * 3) % 10000).cast("string"), 4, "0"),
    )
    return cust.select("c_custkey", T.redact_pii(text).alias("redacted"))


def q_top_terms(spark, sf_dir):
    """Top-3 distinctive terms per doc: tf DESC, doc-frequency ASC, term ASC
    (integer-exact tf-idf ordering)."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return T.top_terms(docs, k=3)


def q_inverted_index(spark, sf_dir):
    """Positional inverted index (operators/invindex.inverted_index),
    flattened for the gate: explode each term's posting list back to
    (term, doc_freq, total_tf, doc_id, tf, first_pos). Executes the full
    production plan — posexplode -> (term,doc) partial agg -> min_df
    band -> term agg with sorted postings — then unnests the result."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    idx = IX.inverted_index(docs, min_df=2)
    return idx.select(
        "term", "doc_freq", "total_tf", F.explode("postings").alias("p")
    ).select(
        "term",
        "doc_freq",
        "total_tf",
        F.col("p.doc_id").alias("doc_id"),
        F.col("p.tf").alias("tf"),
        F.element_at("p.positions", 1).alias("first_pos"),
    )


def q_conjunctive_hits(spark, sf_dir):
    """AND retrieval over the inverted index: doc_ids containing all of
    three query terms, via posting-list intersection (invindex.
    conjunctive_docs) — the index is built and queried in one plan."""
    docs = _t(spark, sf_dir, "documents")
    idx = IX.inverted_index(docs)
    return IX.conjunctive_docs(idx, ["spark", "merge", "window"])


def q_phrase_hits(spark, sf_dir):
    """Adjacent-bigram phrase query 'spark merge' answered from posting
    positions alone (shift-by-one arrays_overlap), never re-reading the
    text. The oracle re-derives the same set from the token stream."""
    docs = _t(spark, sf_dir, "documents")
    idx = IX.inverted_index(docs)
    return IX.phrase_docs(idx, "spark", "merge")


def q_cooccurrence(spark, sf_dir):
    """Document-level term co-occurrence counts (invindex.
    cooccurrence_pairs): unordered distinct-term pairs per doc with the
    max_df stoplist/skew cap applied before pairing."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return IX.cooccurrence_pairs(docs, max_df=78, min_pair_count=2)


def q_bm25_components(spark, sf_dir):
    """Every input the BM25 formula consumes, for a 3-term query, as
    integer columns: (term, doc_id, tf, dl, doc_freq, n_docs, sum_dl).
    Executes the production plan — invindex.inverted_index +
    invindex.doc_lengths + postings_of — so a green cell certifies the
    index, the length dim, and the corpus stats BM25 ranks with; the
    float score itself is pytest-gated against a numpy oracle
    (tests/test_invindex.py) per the repo's no-float-gates policy."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    idx = IX.inverted_index(docs)
    lens = IX.doc_lengths(docs)
    terms = ["spark", "merge", "window"]
    m = IX.postings_of(idx, terms).select("term", "doc_id", "tf")
    dfreq = idx.filter(F.col("term").isin(terms)).select("term", "doc_freq")
    stats = lens.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
    )
    return (
        m.join(lens, "doc_id")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            "doc_id",
            "tf",
            F.col("dl").cast("long").alias("dl"),
            "doc_freq",
            "n_docs",
            "sum_dl",
        )
    )


def q_mirror_hosts(spark, sf_dir):
    """Mirror-host detection (sketches.mirror_hosts): KMV content
    sketches per host -> bottom-m LSH candidates with the hot-hash cap
    -> k-min-union Jaccard verify; all-integer (k_used, n_common,
    jaccard_ppm, is_mirror)."""
    from smartcrawler_spark.operators import sketches as SK

    base = _t(spark, sf_dir, "documents")
    real = base.select(F.col("source").alias("host"), "text")
    # planted partial mirrors: every even doc also served from
    # '<source>-m' — those synthetic hosts MUST surface as candidates
    # and score ~0.5 Jaccard vs their originals
    mirrored = base.filter(F.col("doc_id") % 2 == 0).select(
        F.concat(F.col("source"), F.lit("-m")).alias("host"), "text"
    )
    return SK.mirror_hosts(real.unionByName(mirrored), k=32, m=8,
                           max_bucket=64)


def q_bpe_pairs(spark, sf_dir):
    """BPE training iteration-0 pair statistics (operators/bpe.
    initial_pair_counts): corpus -> (word, n) counts -> weighted adjacent
    character-pair counts over char+</w> symbol arrays — the exact
    aggregation each merge step of train_bpe argmaxes over (the loop
    itself is pytest-gated against a sequential reference trainer)."""
    from smartcrawler_spark.operators import bpe

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return bpe.initial_pair_counts(bpe.word_counts(docs))


def q_content_blocks(spark, sf_dir):
    """Main-content block classification (operators/content.block_profile)
    on the synthesized span/node trees: innermost-block selection, subtree
    word counts, anchor-path link density (integer ppt), chrome-path
    boilerplate flag and the jusText-style is_content verdict — the full
    production HOF plan, gated with tag sets drawn from the synth
    vocabulary ('spark'... as block tags, 'the'/'of' as chrome)."""
    from smartcrawler_spark.operators import content as C

    synth = _synth_tree_docs(spark, sf_dir)
    return C.block_profile(
        synth,
        block_tags=("spark", "merge", "window", "data", "query"),
        boiler_tags=("the", "of"),
        min_words=2,
        max_link_ppt=500,
    )


def q_lm_score(spark, sf_dir):
    """CCNet-style bigram LM scoring (operators/lm.py): train unigram +
    bigram counts on documents doc_id < 300, score doc_id < 100 with
    add-one-smoothed floor-log2 surprisal — (doc_id, n_bigrams, bits,
    mbits), every column integral (the no-float-gates policy: log2 is
    computed as bit-length, never a transcendental)."""
    from smartcrawler_spark.operators import lm

    docs = _t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") < 300)
    score = docs.filter(F.col("doc_id") < 100)
    uni = lm.unigram_counts(train)
    big = lm.bigram_counts(train)
    return lm.lm_score_bits(score, uni, big, uni.count())


def q_lm_buckets(spark, sf_dir):
    """CCNet head/middle/tail split (operators/lm.lm_buckets) over the
    lm_score output with pinned integer thresholds — adds the bucket
    label column to the already-gated integer scores."""
    from smartcrawler_spark.operators import lm

    docs = _t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") < 300)
    score = docs.filter(F.col("doc_id") < 100)
    uni = lm.unigram_counts(train)
    scored = lm.lm_score_bits(score, uni, lm.bigram_counts(train),
                              uni.count())
    return lm.lm_buckets(scored, 2000, 4000).select(
        "doc_id", "mbits", "lm_bucket"
    )


def q_nb_model(spark, sf_dir):
    """Hashed Naive-Bayes training (operators/nbclassifier.nb_train,
    portable md5-bucket tier): label = source, seed corpus = even
    doc_ids. Output (label, bucket, c) — the bounded labels x buckets
    model artifact a 1000-executor scoring job broadcasts; training is
    one map-side-combined groupBy. All-integer."""
    from smartcrawler_spark.operators import nbclassifier as NB

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
    feats, _ = NB.nb_train(docs, label_col="source", portable=True)
    return feats.select("label", "bucket", F.col("c").cast("long").alias("c"))


def q_nb_classify(spark, sf_dir):
    """FineWeb/DCLM-style model-based filtering end-to-end: train the
    hashed NB on even doc_ids (label = source), score odd doc_ids with
    integer floor-log2 surprisal, and emit the argmin-bits prediction
    per doc (ties to the lexicographically first label). Every decision
    replayed by the DuckDB oracle from the same integer spec."""
    from smartcrawler_spark.operators import nbclassifier as NB

    docs = _t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 2 == 0)
    test = docs.filter(F.col("doc_id") % 2 == 1)
    feats, priors = NB.nb_train(train, label_col="source", portable=True)
    scored = NB.nb_score_bits(test, feats, priors, portable=True)
    return NB.nb_predict(scored).select(
        "doc_id", "pred_label", F.col("bits").cast("long").alias("bits"))


def q_change_rate(spark, sf_dir):
    """Per-host change-rate estimation + adaptive recrawl intervals
    (plans.analysis.change_rate_ppm / recrawl_intervals): a synthesized
    5-round revisit history over documents (changed = integer hash of
    (doc_id, round)) rolls up to Laplace-smoothed ppm rates and clamped
    revisit intervals — every column integral by construction."""
    from smartcrawler_spark.plans.analysis import (change_rate_ppm,
                                                   recrawl_intervals)

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    hist = (
        docs.select(
            F.col("source").alias("host"),
            F.col("doc_id"),
            F.explode(F.sequence(F.lit(0), F.lit(4))).alias("r"),
        )
        .select(
            "host",
            ((F.col("doc_id") * 37 + F.col("r") * 17) % 5 < 2)
            .cast("int")
            .alias("changed"),
        )
    )
    rates = change_rate_ppm(hist)
    ivs = recrawl_intervals(rates, base_interval=4, max_interval=20)
    return rates.join(ivs.select("key", "interval"), "key").select(
        "key", "n_obs", "n_changed", "rate_ppm", "interval"
    )


def q_host_triangles(spark, sf_dir):
    """Undirected triangle enumeration over the synthesized host link
    graph (linkgraph.host_triangles on the same edges as the host_graph
    gate) — the link-farm/SEO-ring clique signal."""
    from smartcrawler_spark.operators.linkgraph import host_triangles

    edges = q_host_graph(spark, sf_dir)
    return host_triangles(edges)


def q_budget_apportion(spark, sf_dir):
    """Largest-remainder integer apportionment of a global fetch budget
    (frontier.apportion_budget): per-source doc counts as weights, prime
    total so the leftover-distribution path always executes; quotas sum
    to the budget exactly."""
    docs = _t(spark, sf_dir, "documents")
    w = docs.groupBy("source").agg(F.count("*").alias("weight"))
    return FR.apportion_budget(w, 9973, key_col="source")


def q_ngram_jaccard(spark, sf_dir):
    """Exact 3-gram Jaccard pairs (threshold 0.05) on a doc subset —
    parameters chosen to yield non-trivial pairs at both sf0.01 and sf0.1."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    return DD.ngram_jaccard_pairs(docs, n=3, threshold=0.05, df_cap=100)


def q_ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-10 vs the vec_id=0 embedding (double math)."""
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return SIM.cosine_topk_bruteforce(emb, list(qv), k=10)


def q_ann_lsh(spark, sf_dir):
    """LSH-bucketed ANN top-10 (seeded-hyperplane production kernel;
    deterministic). Gated against golden parquet from tools/gen_golden.py
    (independent numpy oracle replicating the engine's float32/double
    coercions, bit-exact; tests/test_golden.py enforces)."""
    emb = _t(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return SIM.cosine_topk_lsh(emb, [float(x) for x in qv], k=10, bits=4, tables=16)


def q_ann_ivf(spark, sf_dir):
    """IVF-bucketed ANN top-10 (partition-pruning scale path;
    deterministic seeded centroids). Gated against golden parquet from
    tools/gen_golden.py (independent numpy oracle, bit-exact;
    tests/test_golden.py enforces)."""
    emb = _t(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return SIM.cosine_topk_ivf(emb, [float(x) for x in qv], k=10,
                               n_centroids=32, nprobe=16)


def q_ann_lsh_portable(spark, sf_dir):
    """Sign-LSH ANN top-10 over quantized embeddings — the ORACLE-CHECKED
    specification of the hyperplane-LSH path (q_ann_lsh is the float
    throughput twin). Integer math end-to-end."""
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.topk_lsh_portable(emb, k=10, planes=8, dim=64, query_id=0)


def q_ann_ivf_portable(spark, sf_dir):
    """IVF ANN top-10 with first-K quantized centroids — the ORACLE-CHECKED
    specification of the IVF path (q_ann_ivf is the float/trained-centroid
    throughput twin). Integer math end-to-end."""
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.topk_ivf_portable(emb, k=10, n_centroids=8, nprobe=2, query_id=0)


def q_semdedup(spark, sf_dir):
    """SemDeDup semantic dedup (cluster-then-prune, arXiv:2303.09540) —
    the ORACLE-CHECKED spec twin: first-K integer centroids, exact
    integer-L2 cells, within-cell cosine>=0.40 prune decided with pure
    integer arithmetic (dot^2*10^4 vs t^2*|a|^2*|b|^2). Production path is
    SIM.semdedup (trained centroids + Arrow assignment)."""
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.semdedup_portable(emb, n_centroids=8, threshold_pct=40)


def q_embedding_near_dup(spark, sf_dir):
    """Exact all-pairs cosine >= 0.5 on a subset (near-dup oracle shape)."""
    emb = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 200)
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    )
    a = emb.select(F.col("vec_id").alias("a"), F.col("embedding").alias("_va"))
    b = emb.select(F.col("vec_id").alias("b"), F.col("embedding").alias("_vb"))
    sim = F.round(SIM.cosine(F.col("_va"), F.col("_vb")), 6)
    return (
        a.crossJoin(b).filter(F.col("a") < F.col("b"))
        .withColumn("sim", sim)
        .filter(F.col("sim") >= 0.3)
        .select("a", "b", "sim")
    )


def q_embedding_near_dup_lsh(spark, sf_dir):
    """PRODUCTION embedding near-dup path (operators.similarity.
    embedding_near_dup_pairs): LSH bucket self-join candidates + exact
    cosine verify — gates the bucketed plan itself (the brute-force
    `embedding_near_dup` above is the oracle-shape stand-in on a subset).
    Gated against golden parquet from tools/gen_golden.py (independent
    numpy oracle replicating the engine's float32 coercions, bit-exact;
    tests/test_golden.py enforces)."""
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.embedding_near_dup_pairs(
        emb, threshold=0.3, dim=64, bits=4, tables=8
    )


def q_lang_id(spark, sf_dir):
    """Language ID (marker heuristic) distribution per source."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("source", T.detect_language(F.col("text")).alias("lang_guess"))
        .groupBy("source", "lang_guess")
        .agg(F.count("*").alias("n"))
    )


def q_quality_features(spark, sf_dir):
    """Quality features per doc (length/punct/stopword ratios)."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    f = T.quality_features(F.col("text"))
    return docs.select(
        "doc_id", f["n_chars"].alias("n_chars"), f["n_words"].alias("n_words"),
        f["mean_word_len"].alias("mean_word_len"),
        f["punct_ratio"].alias("punct_ratio"),
        f["stopword_ratio"].alias("stopword_ratio"),
    )


def q_token_count(spark, sf_dir):
    """BPE-ish token counting, aggregated per source (integer sums)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("source", T.token_count(F.col("text")).alias("toks"))
        .groupBy("source")
        .agg(F.sum("toks").alias("total_tokens"), F.count("*").alias("n_docs"))
    )


def q_hash_split(spark, sf_dir):
    """Deterministic md5-bucket train/val/test assignment (80/10/10) —
    membership is a pure function of doc_id, stable across runs/engines."""
    from smartcrawler_spark.operators import sampling as SA

    docs = _t(spark, sf_dir, "documents")
    return SA.hash_split(docs).select("doc_id", "bucket", "split")


def q_token_budget_pack(spark, sf_dir):
    """Per-language greedy token-budget packing (corpus-mixing step):
    biggest docs first, keep while the running token total <= 5000."""
    from smartcrawler_spark.operators import sampling as SA

    docs = _t(spark, sf_dir, "documents")
    return SA.token_budget_pack(docs, budget=5000, group_col="lang")


def q_fingerprint_groups(spark, sf_dir):
    """Document fingerprinting: distinct fingerprints per source (md5 over
    the normalized text — portable across engines)."""
    docs = _t(spark, sf_dir, "documents")
    fp = F.md5(F.lower(T.clean_text(F.col("text"))))
    return (
        docs.select("source", fp.alias("fp"))
        .groupBy("source")
        .agg(F.countDistinct("fp").alias("n_unique"), F.count("*").alias("n_docs"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "frontier_admission": q_frontier_admission,
        "seen_anti_join": q_seen_anti_join,
        "dup_signature_count": q_dup_signature_count,
        "dup_occurrence_guard": q_dup_occurrence_guard,
        "politeness_topk": q_politeness_topk,
        "broadcast_semi_mark": q_broadcast_semi_mark,
        "robots_prefix_gate": q_robots_prefix_gate,
        "robots_rfc_gate": q_robots_rfc_gate,
        "crawl_order_emission": q_crawl_order_emission,
        "crawl_two_rounds": q_crawl_two_rounds,
        "url_canonicalize": q_url_canonicalize,
        "url_traps": q_url_traps,
        "redirect_resolve": q_redirect_resolve,
        "pagerank": q_pagerank,
        "hits": q_hits,
        "opic": q_opic,
        "shingle_containment": q_shingle_containment,
        "page_directives": q_page_directives,
        "charset_decode": q_charset_decode,
        "x_robots_flags": q_x_robots_flags,
        "datacard": q_datacard,
        "incremental_dedup": q_incremental_dedup,
        "uniform_sample": q_uniform_sample,
        "stratified_sample": q_stratified_sample,
        "chunk_documents": q_chunk_documents,
        "url_templates": q_url_templates,
        "host_graph": q_host_graph,
        "image_stream_info": q_image_stream_info,
        "image_dhash": q_image_dhash,
        "image_dhash_pairs": q_image_dhash_pairs,
        "video_shots": q_video_shots,
        "video_frame_overlap": q_video_frame_overlap,
        "audio_fingerprints": q_audio_fingerprints,
        "audio_overlap": q_audio_overlap,
        "archive_members": q_archive_members,
        "cdc_chunks": q_cdc_chunks,
        "cdc_stats": q_cdc_stats,
        "robots_sitemap_discovery": q_robots_sitemap_discovery,
        "cluster_survivors": q_cluster_survivors,
        "warc_ingest": q_warc_ingest,
        "anchor_relevance": q_anchor_relevance,
        "audio_stream_info": q_audio_stream_info,
        "mp3_decode": q_mp3_decode,
        "template_rewrite_sql": q_template_rewrite_sql,
        "template_detect": q_template_detect,
        "subtree_hashes": q_subtree_hashes,
        "find_by_path": q_find_by_path,
        "mark_duplicates": q_mark_duplicates,
        "sitemap_roundtrip": q_sitemap_roundtrip,
        "sitemap_entries": q_sitemap_entries,
        "refresh_due": q_refresh_due,
        "c4_filters": q_c4_filters,
        "host_stats": q_host_stats,
        "crawl_progress": q_crawl_progress,
        "gopher_rules": q_gopher_rules,
        "explode_distinct": q_explode_distinct,
        "text_clean": q_text_clean,
        "dedup_exact": q_dedup_exact,
        "line_dedup": q_line_dedup,
        "winnow_fingerprints": q_winnow_fingerprints,
        "duplicate_passages": q_duplicate_passages,
        "exact_substring_spans": q_exact_substring_spans,
        "exact_substring_removal": q_exact_substring_removal,
        "hll_registers": q_hll_registers,
        "cms_registers": q_cms_registers,
        "kmv_registers": q_kmv_registers,
        "kmv_overlap": q_kmv_overlap,
        "corpus_diff": q_corpus_diff,
        "log2_histogram": q_log2_histogram,
        "feed_entries": q_feed_entries,
        "temperature_mix": q_temperature_mix,
        "dedup_minhash": q_dedup_minhash,
        "minhash_lsh_portable": q_minhash_lsh_portable,
        "dedup_simhash": q_dedup_simhash,
        "simhash_portable": q_simhash_portable,
        "dedup_clusters": q_dedup_clusters,
        "decontamination": q_decontamination,
        "repetition_profile": q_repetition_profile,
        "pii_redaction": q_pii_redaction,
        "top_terms": q_top_terms,
        "inverted_index": q_inverted_index,
        "conjunctive_hits": q_conjunctive_hits,
        "phrase_hits": q_phrase_hits,
        "cooccurrence": q_cooccurrence,
        "bm25_components": q_bm25_components,
        "change_rate": q_change_rate,
        "lm_score": q_lm_score,
        "nb_model": q_nb_model,
        "nb_classify": q_nb_classify,
        "lm_buckets": q_lm_buckets,
        "content_blocks": q_content_blocks,
        "bpe_pairs": q_bpe_pairs,
        "mirror_hosts": q_mirror_hosts,
        "retry_backoff": q_retry_backoff,
        "update_intervals": q_update_intervals,
        "export_manifest": q_export_manifest,
        "embedding_quantize": q_embedding_quantize,
        "revalidate_robots": q_revalidate_robots,
        "shard_assign": q_shard_assign,
        "dup_content_hosts": q_dup_content_hosts,
        "priority_aging": q_priority_aging,
        "host_triangles": q_host_triangles,
        "budget_apportion": q_budget_apportion,
        "ngram_jaccard": q_ngram_jaccard,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_lsh": q_ann_lsh,
        "ann_lsh_portable": q_ann_lsh_portable,
        "ann_ivf": q_ann_ivf,
        "ann_ivf_portable": q_ann_ivf_portable,
        "semdedup": q_semdedup,
        "embedding_near_dup": q_embedding_near_dup,
        "embedding_near_dup_lsh": q_embedding_near_dup_lsh,
        "lang_id": q_lang_id,
        "quality_features": q_quality_features,
        "token_count": q_token_count,
        "fingerprint_groups": q_fingerprint_groups,
        "hash_split": q_hash_split,
        "token_budget_pack": q_token_budget_pack,
        "adaptive_budget": q_adaptive_budget,
        "weighted_sample": q_weighted_sample,
    }


_CLEAN = r"trim(regexp_replace({col}, '\s+', ' ', 'g'))"
_WORDS = (
    r"list_filter(string_split(trim(regexp_replace(lower({col}),'\s+',' ','g')),' '),"
    r" x -> x <> '')"
)

# synthesized span/node trees (must mirror _synth_tree_docs exactly):
# node i = word i, subtree slice = w[i : i + (1 + len(w[i]) % 3) - 1]
# truncated at the doc end; serial uses chr(1) for the NULL id (see
# operators/spans.py subtree_hashes_portable).
_SYNTH_TREE_CTE = r"""
        toks AS (
          SELECT doc_id, source AS host,
                 (list_filter(string_split(lower(trim(regexp_replace(text,'\s+',' ','g'))),' '),
                              x -> x <> ''))[1:20] AS w
          FROM documents WHERE doc_id < 500
        ),
        nodes AS (
          SELECT doc_id, host, i AS pos, w[i] AS word, w,
                 w[i : i + least(1 + length(w[i]) % 3, len(w) - i + 1) - 1] AS sub
          FROM toks, UNNEST(range(1, len(w)+1)) AS t(i)
        ),
        sigs AS (
          SELECT doc_id, host, pos, word,
                 md5(array_to_string(list_transform(sub,
                     x -> x || chr(31) || chr(31) || chr(1) || chr(31) || x || chr(29)),
                     '')) AS sig
          FROM nodes
        )
"""

_EN_STOP = "['the','and','of','to','in','is','that','with','a','an','it','on','for','as','at','by']"
_LANG_MARKERS_SQL = {
    "en": "['the','and','of','to','in','is','that','with']",
    "de": "['der','die','und','das','ist','nicht','mit','ein']",
    "fr": "['le','la','les','et','est','une','pour','dans']",
    "es": "['el','los','las','es','una','por','para','con']",
    "zh": "['de5','shi4','zai4','le5','he2','you3','wo3','ta1']",
}


_WORDS_TEXT = _WORDS.format(col="text")

# Hashed-NB oracle pieces: the portable md5 3-hex-digit bucket (Spark
# instr == DuckDB strpos, both 1-based) and the shared training CTEs.
_NB_BUCKET = (
    "((strpos('0123456789abcdef', substr(md5({t}), 1, 1)) - 1) * 256"
    " + (strpos('0123456789abcdef', substr(md5({t}), 2, 1)) - 1) * 16"
    " + (strpos('0123456789abcdef', substr(md5({t}), 3, 1)) - 1)) % 4096"
)

_NB_TRAIN_SQL = rf"""
              tr AS (
                SELECT source AS label, {{words}} AS w
                FROM documents WHERE doc_id % 2 = 0
              ), tok AS (
                SELECT label, unnest(w) AS tok FROM tr
              ), feats AS (
                SELECT label,
                       CAST({_NB_BUCKET.format(t='tok')} AS BIGINT) AS bucket,
                       CAST(count(*) AS BIGINT) AS c
                FROM tok GROUP BY 1, 2
              )"""

_LM_SCORE_SQL = rf"""
            WITH d AS (
              SELECT doc_id, {_WORDS_TEXT} AS w FROM documents
            ), tr AS (
              SELECT w FROM d WHERE doc_id < 300
            ), uni AS (
              SELECT u AS w1, CAST(count(*) AS BIGINT) AS c1
              FROM (SELECT unnest(w) AS u FROM tr) GROUP BY u
            ), big AS (
              SELECT p[1] AS w1, p[2] AS w2, CAST(count(*) AS BIGINT) AS c12
              FROM (SELECT unnest(list_zip(w[1:len(w) - 1], w[2:len(w)])) AS p
                    FROM tr)
              GROUP BY 1, 2
            ), sc AS (
              SELECT doc_id, w FROM d WHERE doc_id < 100
            ), pairs AS (
              SELECT doc_id, p[1] AS w1, p[2] AS w2
              FROM (SELECT doc_id,
                           unnest(list_zip(w[1:len(w) - 1], w[2:len(w)])) AS p
                    FROM sc)
            ), bits AS (
              SELECT doc_id,
                     (length(bin(COALESCE(uni.c1, 0)
                                 + (SELECT count(*) FROM uni))) - 1)
                     - (length(bin(COALESCE(big.c12, 0) + 1)) - 1) AS b
              FROM pairs
              LEFT JOIN big USING (w1, w2)
              LEFT JOIN uni USING (w1)
            ), agg AS (
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                     CAST(sum(b) AS BIGINT) AS bits
              FROM bits GROUP BY doc_id
            )
            SELECT sc.doc_id,
                   COALESCE(agg.n_bigrams, 0) AS n_bigrams,
                   COALESCE(agg.bits, 0) AS bits,
                   CASE WHEN agg.n_bigrams > 0
                        THEN CAST(agg.bits * 1000 // agg.n_bigrams AS BIGINT)
                        ELSE NULL END AS mbits
            FROM (SELECT DISTINCT doc_id FROM sc) sc
            LEFT JOIN agg USING (doc_id)
        """


def oracle_sql() -> dict[str, str]:
    import hashlib as _hl

    arch_rows = []
    for _ref, _members in sorted(_ARCHIVE_MEMBERS.items()):
        _kind = "zip" if _ref.endswith(".zip") else "tar"
        for _name, _body in _members:
            arch_rows.append(
                f"('{_ref}', '{_name}', '{_kind}', "
                f"CAST({len(_body)} AS BIGINT), "
                f"'{_hl.md5(_body).hexdigest()}')")
    archive_values = ", ".join(arch_rows)

    words = _WORDS.format(col="text")
    lang_case = "CASE "
    # mirror detect_language: sorted langs, strictly-greater switches
    score_exprs = {
        lang: f"len(list_intersect({words}, {arr}))"
        for lang, arr in _LANG_MARKERS_SQL.items()
    }
    # build nested greatest-with-tiebreak: first lang (sorted) with max score>0
    # equivalent: pick max score; among maxes pick lexicographically first lang
    pairs = ", ".join(
        f"struct_pack(neg_score := -({expr}), lang := '{lang}')"
        for lang, expr in sorted(score_exprs.items())
    )
    lang_expr = (
        f"CASE WHEN list_min(list_transform([{pairs}], s -> s.neg_score)) = 0 "
        f"THEN 'und' ELSE list_sort([{pairs}])[1].lang END"
    )

    return {
        # scoring note: URL tokens are [a-z0-9]+ runs of path+query, so
        # '/en/doc123?view=full' tokenizes to [en, doc123, view, full] —
        # the 'doc' keyword never fires (doc123 is one token), 'en' and
        # 'view' do. The oracle computes that closed form directly.
        "frontier_admission": """
            WITH c AS (
              SELECT DISTINCT
                'http://' || source || '.example.com/' || lang || '/doc' || doc_id
                  || CASE WHEN doc_id % 3 = 0 THEN '?view=full' ELSE '' END AS url_canon,
                source || '.example.com' AS host,
                (CASE WHEN lang = 'en' THEN 2.0 ELSE 0.0 END
                 + CASE WHEN doc_id % 3 = 0 THEN 0.5 ELSE 0.0 END)::DOUBLE AS score
              FROM documents
            )
            SELECT host, url_canon, round(score, 4) AS score FROM (
              SELECT *, row_number() OVER (
                PARTITION BY host ORDER BY score DESC, url_canon ASC) AS rn
              FROM c
            ) WHERE rn <= 5
        """,
        "seen_anti_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        """,
        "dup_signature_count": """
            SELECT user_id, event_type, count(*) AS n
            FROM events GROUP BY user_id, event_type HAVING count(*) >= 2
        """,
        "dup_occurrence_guard": r"""
            WITH d AS (
              SELECT source, doc_id, text FROM documents WHERE doc_id < 30
            ), eligible AS (
              SELECT source FROM d GROUP BY source HAVING count(*) >= 2
            ), nodes AS (
              SELECT source, unnest(string_split(text, ' ')) AS s
              FROM d
            )
            SELECT source, md5(s) AS sig, count(*) AS n
            FROM nodes
            WHERE trim(s) <> '' AND source IN (SELECT source FROM eligible)
            GROUP BY source, md5(s) HAVING count(*) >= 8
        """,
        "politeness_topk": """
            SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price
            FROM (
              SELECT *, row_number() OVER (
                PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC
              ) AS rn FROM orders
            ) WHERE rn <= 3
        """,
        "broadcast_semi_mark": """
            SELECT l_orderkey, l_linenumber,
                   CASE WHEN p.p_partkey IS NOT NULL THEN '[FILTERED DUPLICATE]'
                        ELSE l_returnflag END AS flag
            FROM lineitem l
            LEFT JOIN (SELECT p_partkey FROM part WHERE p_retailprice > 1500) p
              ON l.l_partkey = p.p_partkey
        """,
        "robots_prefix_gate": """
            SELECT doc_id, source FROM documents
            WHERE NOT (starts_with(source, 'src1') OR starts_with(source, 'src0'))
        """,
        "sitemap_entries": """
            SELECT source AS host,
                   'https://' || source || '.example.com/doc'
                     || CAST(doc_id AS VARCHAR) AS url,
                   CASE WHEN doc_id % 4 != 0
                        THEN '2024-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
                   END AS lastmod,
                   CASE WHEN doc_id % 3 != 0
                        THEN CAST('0.' || CAST(doc_id % 9 + 1 AS VARCHAR) AS DOUBLE)
                        ELSE 0.5 END AS priority
            FROM documents WHERE doc_id < 500
        """,
        "c4_filters": r"""
            WITH d AS (
              SELECT doc_id,
                     regexp_replace(text, '\. ', '.' || chr(10), 'g') AS t
              FROM documents WHERE doc_id < 400
            ), s AS (
              SELECT doc_id,
                     list_filter(string_split(t, chr(10)),
                                 x -> trim(x) <> '') AS lines,
                     t
              FROM d
            ), k AS (
              SELECT doc_id, lines,
                     list_filter(lines, x ->
                        regexp_matches(trim(x), '[.!?"]$')
                        AND len(list_filter(regexp_split_to_array(trim(x), '\s+'),
                                            w -> w <> '')) >= 5
                        AND NOT contains(lower(trim(x)), 'lorem ipsum')
                        AND NOT regexp_matches(lower(trim(x)), '\bjavascript\b')
                     ) AS kept,
                     contains(t, '{') AS curly
              FROM s
            )
            SELECT doc_id,
                   len(lines) AS n_lines,
                   len(kept) AS n_lines_kept,
                   md5(coalesce(array_to_string(kept, chr(10)), '')) AS cleaned_md5,
                   (len(kept) >= 3 AND NOT curly) AS page_keep
            FROM k
        """,
        "refresh_due": f"""
            WITH f AS ({_SYNTH_FRONTIER_SQL})
            SELECT url_canon, host, CAST(40 - round_fetched AS INT) AS rounds_stale
            FROM f
            WHERE status = 'SUCCESS' AND round_fetched IS NOT NULL
              AND 40 - round_fetched >= 15
        """,
        "host_stats": f"""
            WITH f AS ({_SYNTH_FRONTIER_SQL})
            SELECT host,
                   count(*) AS n_urls,
                   -- CAST: DuckDB sum() yields HUGEINT, which the driver's
                   -- value hasher canonicalizes differently from Spark's
                   -- BIGINT even when the values are identical (r4 red cell).
                   CAST(sum(CASE WHEN status = 'SUCCESS' THEN 1 ELSE 0 END) AS BIGINT) AS n_success,
                   CAST(sum(CASE WHEN status = 'FAILED' THEN 1 ELSE 0 END) AS BIGINT) AS n_failed,
                   CAST(sum(CASE WHEN status = 'PENDING' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending,
                   CAST(CASE WHEN sum(CASE WHEN status IN ('SUCCESS','FAILED')
                                            THEN 1 ELSE 0 END) > 0
                         THEN floor(sum(CASE WHEN status = 'SUCCESS' THEN 1 ELSE 0 END)
                                    * 10000.0
                                    / sum(CASE WHEN status IN ('SUCCESS','FAILED')
                                               THEN 1 ELSE 0 END))
                         ELSE 0 END AS INT) AS success_bp
            FROM f GROUP BY host
        """,
        "crawl_progress": f"""
            WITH f AS ({_SYNTH_FRONTIER_SQL}),
            fa AS (
              SELECT CAST(regexp_extract(url_canon, '/p(\\d+)$', 1) AS INT) % 25
                       AS round, count(*) AS n_admitted
              FROM f GROUP BY 1
            ),
            ff AS (
              SELECT round_fetched AS round, count(*) AS n_fetched,
                     sum(CASE WHEN status = 'SUCCESS' THEN 1 ELSE 0 END)
                       AS n_success
              FROM f WHERE round_fetched IS NOT NULL GROUP BY 1
            ),
            m AS (
              SELECT coalesce(fa.round, ff.round) AS round,
                     coalesce(n_admitted, 0) AS n_admitted,
                     coalesce(n_fetched, 0) AS n_fetched,
                     coalesce(n_success, 0) AS n_success
              FROM fa FULL OUTER JOIN ff ON fa.round = ff.round
            )
            SELECT round, n_admitted, n_fetched,
                   -- CAST: DuckDB sum() is HUGEINT; hasher needs BIGINT (r4).
                   CAST(n_success AS BIGINT) AS n_success,
                   CAST(sum(n_admitted) OVER (ORDER BY round
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cum_frontier
            FROM m
        """,
        "gopher_rules": rf"""
            WITH d AS (
              SELECT doc_id, text, {words} AS w
              FROM documents WHERE doc_id < 400
            ), s AS (
              SELECT doc_id,
                     len(w) AS n_words,
                     greatest(len(w), 1) AS sw,
                     len(array_to_string(w, '')) AS n_chars,
                     len(regexp_extract_all(text, '#')) AS n_hash,
                     len(regexp_extract_all(text, '\.\.\.|…')) AS n_ellip,
                     len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
                     len(list_intersect(w, ['the','be','to','of','and','that',
                                            'have','with'])) AS n_stop,
                     list_filter(string_split(text, chr(10)),
                                 x -> trim(x) <> '') AS lines
              FROM d
            ), t AS (
              SELECT *, greatest(len(lines), 1) AS nl,
                     len(list_filter(lines,
                         x -> regexp_matches(trim(x), '^([•‣▪*-])'))) AS n_bullet,
                     len(list_filter(lines,
                         x -> regexp_matches(trim(x), '(\.\.\.|…)$'))) AS n_eline
              FROM s
            )
            SELECT doc_id, n_words,
                   round(n_chars::DOUBLE / sw, 4) AS mean_word_len,
                   round((n_hash + n_ellip)::DOUBLE / sw, 4) AS symbol_ratio,
                   round(n_alpha::DOUBLE / sw, 4) AS alpha_word_frac,
                   n_stop AS n_gopher_stopwords,
                   (n_words BETWEEN 50 AND 100000
                    AND n_chars::DOUBLE / sw BETWEEN 3 AND 10
                    AND (n_hash + n_ellip)::DOUBLE / sw <= 0.1
                    AND n_bullet::DOUBLE / nl < 0.9
                    AND n_eline::DOUBLE / nl < 0.3
                    AND n_alpha::DOUBLE / sw >= 0.8
                    AND n_stop >= 2) AS gopher_pass
            FROM t
        """,
        "robots_rfc_gate": """
            WITH c AS (
              SELECT c_custkey AS k,
                     'h' || CAST(c_custkey % 20 AS VARCHAR) || '.example.com' AS host,
                     CASE CAST(c_custkey % 5 AS INT)
                       WHEN 0 THEN '/private/doc' || CAST(c_custkey AS VARCHAR) || '.html'
                       WHEN 1 THEN '/private/pub.html'
                       WHEN 2 THEN '/files/f' || CAST(c_custkey AS VARCHAR) || '.pdf'
                       WHEN 3 THEN '/page1'
                       ELSE '/other' || CAST(c_custkey AS VARCHAR) END AS path
              FROM customer WHERE c_custkey < 400
            ), r AS (
              SELECT 'h' || CAST(i AS VARCHAR) || '.example.com' AS host,
                     v.regex, v.is_allow, v.priority
              FROM range(10) t(i), (VALUES
                ('^/private/', false, 9),
                ('^/private/pub\\.html', true, 17),
                ('^.*\\.pdf$', false, 6),
                ('^/page1', false, 6),
                ('^/page1', true, 6)) v(regex, is_allow, priority)
            ), m AS (
              SELECT c.k, c.host, c.path, r.is_allow, r.priority
              FROM c LEFT JOIN r
                ON c.host = r.host AND regexp_matches(c.path, r.regex)
            ), g AS (
              -- most specific match: max (priority, is_allow) — the
              -- composite 2*priority + is_allow makes ties resolve to allow
              SELECT k, host, path, count(priority) AS nm,
                     arg_max(is_allow,
                             priority * 2 + CAST(is_allow AS INT)) AS best_allow
              FROM m GROUP BY k, host, path
            )
            SELECT host, 'https://' || host || path AS url_canon,
                   (nm > 0 AND NOT best_allow) AS robots_blocked
            FROM g
        """,
        "crawl_order_emission": """
            SELECT row_number() OVER (ORDER BY value DESC, event_id ASC) AS seq,
                   event_id, round(value, 2) AS value
            FROM events WHERE event_type = 'click'
        """,
        "crawl_two_rounds": """
            WITH seeds AS (
              SELECT 'https://c' || c_custkey AS url FROM customer
              WHERE c_custkey % 20 = 0
            ), cand1 AS (
              SELECT 'https://o' || o_orderkey AS url,
                     'h' || (o_custkey % 10) AS host,
                     o_totalprice AS score, o_orderkey AS okey
              FROM orders WHERE o_custkey % 20 = 0
            ), adm1 AS (
              SELECT * FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY host ORDER BY score DESC, url ASC) AS rn
                FROM cand1 WHERE url NOT IN (SELECT url FROM seeds)
              ) WHERE rn <= 5
            ), log1 AS (
              SELECT 1 AS rnd,
                     row_number() OVER (ORDER BY score DESC, url ASC) AS seq,
                     url AS url_canon
              FROM adm1
            ), seen1 AS (
              SELECT url FROM seeds UNION ALL SELECT url FROM adm1
            ), cand2 AS (
              SELECT CASE WHEN l_linenumber = 1 THEN 'https://o' || l_orderkey
                          ELSE 'https://l' || l_orderkey || '-' || l_linenumber
                     END AS url,
                     'h' || (l_suppkey % 10) AS host,
                     l_extendedprice AS score
              FROM lineitem JOIN adm1 ON l_orderkey = adm1.okey
            ), adm2 AS (
              SELECT * FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY host ORDER BY score DESC, url ASC) AS rn
                FROM cand2 WHERE url NOT IN (SELECT url FROM seen1)
              ) WHERE rn <= 5
            ), log2 AS (
              SELECT 2 AS rnd,
                     row_number() OVER (ORDER BY score DESC, url ASC) AS seq,
                     url AS url_canon
              FROM adm2
            )
            SELECT * FROM log1 UNION ALL SELECT * FROM log2
        """,
        "url_traps": r"""
            WITH raw AS (
              SELECT doc_id,
                     CASE
                       WHEN doc_id % 5 = 0 THEN
                         'https://' || source || '.example.com/d/' || doc_id
                       WHEN doc_id % 5 = 1 THEN
                         'https://' || source || '.example.com/a/b/c/d/e/f/g/h/i/j/k/l/m/n/' || doc_id
                       WHEN doc_id % 5 = 2 THEN
                         'https://' || source || '.example.com/en/about/en/about/en/' || doc_id
                       WHEN doc_id % 5 = 3 THEN
                         'https://' || source || '.example.com/2026/08/17/2026/08/' || doc_id
                       ELSE
                         'https://' || source || '.example.com/p?a=1&utm_source=feed&b=2&gclid='
                           || doc_id || '&utm_medium=x&c=3&d=4&e=5&f=6&g=7&h=8'
                     END AS url
              FROM documents
            ), parts AS (
              SELECT doc_id, url,
                     list_filter(
                       string_split(
                         regexp_extract(url,
                           '^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([^?#]*)', 1),
                         '/'),
                       s -> s <> '') AS segs,
                     regexp_extract(url, '\?([^#]*)', 1) AS q
              FROM raw
            ), feats AS (
              SELECT doc_id, url,
                     CAST(len(segs) AS BIGINT) AS depth,
                     CAST(len(segs) - len(list_distinct(segs)) AS BIGINT)
                       AS dup_segs,
                     CAST(len(list_filter(segs,
                       s -> regexp_matches(s, '^[0-9]+$'))) AS BIGINT)
                       AS num_segs,
                     CAST(CASE WHEN q = '' THEN 0
                          ELSE len(string_split(q, '&')) END AS BIGINT)
                       AS n_params,
                     regexp_extract(url, '^([^?#]*)', 1) AS base,
                     regexp_replace(
                       regexp_replace('&' || q,
                         '(?i)&(?:utm_[a-zA-Z0-9_]*|fbclid|gclid|dclid|msclkid|yclid|mc_eid|igshid|phpsessid|jsessionid|sessionid|session_id|sid)=[^&]*',
                         '', 'g'),
                       '^&', '') AS q2,
                     regexp_extract(url, '(#.*)$', 1) AS frag
              FROM parts
            )
            SELECT doc_id, url, depth, dup_segs, num_segs, n_params,
                   (length(url) > 512 OR depth > 12 OR dup_segs > 2
                    OR num_segs > 4 OR n_params > 8) AS is_trap,
                   base || CASE WHEN q2 = '' THEN '' ELSE '?' || q2 END
                        || frag AS stripped
            FROM feats
        """,
        "warc_ingest": """
            SELECT * FROM read_parquet(
                '/root/repo/fixtures/golden/warc_ingest.parquet')
        """,
        "redirect_resolve": """
            WITH RECURSIVE m AS (
              SELECT doc_id AS src, doc_id + 1 AS dst
              FROM documents WHERE doc_id % 10 < 6
              UNION ALL SELECT -1, -2
              UNION ALL SELECT -2, -1
            ), walk AS (
              SELECT src AS start, dst AS cur, 1 AS hops FROM m
              UNION ALL
              SELECT w.start, m.dst, w.hops + 1
              FROM walk w JOIN m ON w.cur = m.src
              WHERE w.hops < 16
            ), last AS (
              SELECT start, arg_max(cur, hops) AS final, max(hops) AS hops
              FROM walk GROUP BY start
            )
            SELECT start AS src, final, CAST(hops AS BIGINT) AS hops,
                   final IN (SELECT src FROM m) AS is_loop
            FROM last
        """,
        "pagerank": """
            WITH e AS (
              SELECT DISTINCT doc_id % 97 AS src,
                     (doc_id * doc_id * 3 + 1) % 97 AS dst
              FROM documents
            ), nodes AS (
              SELECT src AS node FROM e UNION SELECT dst FROM e
            ), p AS (SELECT count(*) AS n FROM nodes),
            deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
            r0 AS (SELECT node, 1000000000 // n AS pr FROM nodes, p),
            a1 AS (SELECT e.dst, sum(r0.pr // deg.d) AS agg
                   FROM e JOIN r0 ON e.src = r0.node
                        JOIN deg ON e.src = deg.src GROUP BY e.dst),
            r1 AS (SELECT node,
                          ((1000000000 // n) * 15 + 85 * coalesce(a1.agg, 0))
                            // 100 AS pr
                   FROM nodes CROSS JOIN p
                   LEFT JOIN a1 ON nodes.node = a1.dst),
            a2 AS (SELECT e.dst, sum(r1.pr // deg.d) AS agg
                   FROM e JOIN r1 ON e.src = r1.node
                        JOIN deg ON e.src = deg.src GROUP BY e.dst),
            r2 AS (SELECT node,
                          ((1000000000 // n) * 15 + 85 * coalesce(a2.agg, 0))
                            // 100 AS pr
                   FROM nodes CROSS JOIN p
                   LEFT JOIN a2 ON nodes.node = a2.dst),
            a3 AS (SELECT e.dst, sum(r2.pr // deg.d) AS agg
                   FROM e JOIN r2 ON e.src = r2.node
                        JOIN deg ON e.src = deg.src GROUP BY e.dst),
            r3 AS (SELECT node,
                          ((1000000000 // n) * 15 + 85 * coalesce(a3.agg, 0))
                            // 100 AS pr
                   FROM nodes CROSS JOIN p
                   LEFT JOIN a3 ON nodes.node = a3.dst)
            SELECT node, CAST(pr AS BIGINT) AS pr FROM r3
        """,
        "opic": """
            WITH e AS (
              SELECT DISTINCT doc_id % 89 AS src, (doc_id * 13 + 7) % 89 AS dst
              FROM documents WHERE (doc_id % 89) % 7 <> 0
            ), nodes AS (
              SELECT src AS node FROM e UNION SELECT dst FROM e
            ), p AS (SELECT count(*) AS n FROM nodes),
            deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
            s0 AS (SELECT node, 1000000000 // n AS cash, 0 AS hist
                   FROM nodes, p),
            pool1 AS (SELECT coalesce(sum(cash), 0) AS pool FROM s0
                      WHERE node NOT IN (SELECT src FROM e)),
            in1 AS (SELECT e.dst, sum(s.cash // deg.d) AS agg
                    FROM e JOIN s0 s ON e.src = s.node
                         JOIN deg ON e.src = deg.src GROUP BY e.dst),
            s1 AS (SELECT s.node,
                          coalesce(i.agg, 0) + pool1.pool // p.n AS cash,
                          s.hist + s.cash AS hist
                   FROM s0 s CROSS JOIN pool1 CROSS JOIN p
                   LEFT JOIN in1 i ON s.node = i.dst),
            pool2 AS (SELECT coalesce(sum(cash), 0) AS pool FROM s1
                      WHERE node NOT IN (SELECT src FROM e)),
            in2 AS (SELECT e.dst, sum(s.cash // deg.d) AS agg
                    FROM e JOIN s1 s ON e.src = s.node
                         JOIN deg ON e.src = deg.src GROUP BY e.dst),
            s2 AS (SELECT s.node,
                          coalesce(i.agg, 0) + pool2.pool // p.n AS cash,
                          s.hist + s.cash AS hist
                   FROM s1 s CROSS JOIN pool2 CROSS JOIN p
                   LEFT JOIN in2 i ON s.node = i.dst),
            pool3 AS (SELECT coalesce(sum(cash), 0) AS pool FROM s2
                      WHERE node NOT IN (SELECT src FROM e)),
            in3 AS (SELECT e.dst, sum(s.cash // deg.d) AS agg
                    FROM e JOIN s2 s ON e.src = s.node
                         JOIN deg ON e.src = deg.src GROUP BY e.dst),
            s3 AS (SELECT s.node,
                          coalesce(i.agg, 0) + pool3.pool // p.n AS cash,
                          s.hist + s.cash AS hist
                   FROM s2 s CROSS JOIN pool3 CROSS JOIN p
                   LEFT JOIN in3 i ON s.node = i.dst)
            SELECT node, CAST(cash AS BIGINT) AS cash,
                   CAST(hist AS BIGINT) AS hist,
                   CAST(cash + hist AS BIGINT) AS opic
            FROM s3
        """,
        "page_directives": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   doc_id % 4 IN (0, 2) AS noindex,
                   doc_id % 4 IN (1, 2) AS nofollow,
                   CASE WHEN doc_id % 5 = 0
                        THEN 'https://c.example.com/p' || CAST(doc_id AS VARCHAR)
                        ELSE '' END AS canonical,
                   CASE WHEN doc_id % 11 = 0
                        THEN 'https://b.example.com/dir/' ELSE '' END AS base_href,
                   CAST(CASE WHEN doc_id % 7 = 0 THEN 2
                             WHEN doc_id % 7 = 1 THEN 1
                             ELSE 0 END AS INT) AS n_nofollow_links
            FROM documents WHERE doc_id < 500
        """,
        "charset_decode": """
            SELECT case_id, text, encoding
            FROM read_parquet('/root/repo/fixtures/golden/charset_decode.parquet')
        """,
        "x_robots_flags": """
            WITH h AS (
              SELECT doc_id,
                     CASE doc_id % 8
                       WHEN 0 THEN 'noindex, nofollow'
                       WHEN 1 THEN ' NOINDEX '
                       WHEN 2 THEN 'none'
                       WHEN 3 THEN 'googlebot: noindex, nofollow'
                       WHEN 4 THEN 'nofollow, noarchive'
                       WHEN 5 THEN 'noindex' || chr(10) || 'googlebot: nofollow'
                       WHEN 6 THEN 'unavailable_after: 25 Jun 2026, noindex'
                       ELSE '' END AS hdr
              FROM documents WHERE doc_id < 600
            ), toks AS (
              -- per header line: drop agent-scoped values (first comma
              -- segment bears ':' and is not unavailable_after), then
              -- flatten the surviving lines' comma tokens
              SELECT doc_id,
                     flatten(list_transform(
                       list_filter(string_split(hdr, chr(10)),
                         ln -> NOT contains(trim(lower(string_split(ln, ',')[1])), ':')
                               OR starts_with(trim(lower(string_split(ln, ',')[1])),
                                              'unavailable_after')),
                       ln -> list_transform(string_split(ln, ','),
                                            t -> trim(lower(t))))) AS g
              FROM h
            )
            SELECT doc_id,
                   len(list_filter(g, t -> t IN ('noindex','none'))) > 0
                     AS noindex,
                   len(list_filter(g, t -> t IN ('nofollow','none'))) > 0
                     AS nofollow
            FROM toks
        """,
        "shingle_containment": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split(lower(trim(regexp_replace(text,'\s+',' ','g'))),' '),
                                 x -> x <> '') AS w
              FROM documents WHERE doc_id < 400
            ), sh AS (
              SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS g
              FROM toks, UNNEST(range(1, greatest(len(w)-2, 1)+1)) AS t(i)
            ), sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
            ), capped AS (  -- mirror of the engine's df_cap=100 shingle drop
              SELECT * FROM sh
              WHERE g IN (SELECT g FROM sh GROUP BY g HAVING count(*) <= 100)
            )
            SELECT a.doc_id AS inner_id, b.doc_id AS outer_id,
                   CAST(count(*) AS BIGINT) AS n_common,
                   CAST(sa.n AS BIGINT) AS inner_size,
                   CAST((100 * count(*)) // sa.n AS BIGINT) AS containment_pct
            FROM capped a JOIN capped b
              ON a.g = b.g AND a.doc_id <> b.doc_id
            JOIN sizes sa ON sa.doc_id = a.doc_id
            GROUP BY a.doc_id, b.doc_id, sa.n
            HAVING (100 * count(*)) // sa.n >= 20
        """,
        "datacard": """
            WITH h AS (
              SELECT doc_id, lang, text,
                     substr(md5(doc_id::VARCHAR), 1, 1) AS c1,
                     substr(md5(doc_id::VARCHAR), 2, 1) AS c2
              FROM documents WHERE doc_id < 2000
            ), b AS (
              SELECT doc_id, lang, text,
                     ((CASE WHEN ascii(c1) <= 57 THEN ascii(c1) - 48
                            ELSE ascii(c1) - 87 END) * 16
                      + (CASE WHEN ascii(c2) <= 57 THEN ascii(c2) - 48
                              ELSE ascii(c2) - 87 END)) % 100 AS bucket
              FROM h
            ), s AS (
              SELECT lang,
                     CASE WHEN bucket < 80 THEN 'train'
                          WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
                     len(regexp_extract_all(text,
                         '[A-Za-z]+|\\d+|[^\\sA-Za-z\\d]')) AS n_tokens,
                     len(text) AS n_chars
              FROM b
            )
            SELECT split, lang, count(*) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                   CAST(min(n_tokens) AS BIGINT) AS min_tokens,
                   CAST(max(n_tokens) AS BIGINT) AS max_tokens,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars,
                   CAST(sum(n_tokens) // count(*) AS BIGINT) AS mean_tokens
            FROM s GROUP BY split, lang
        """,
        "incremental_dedup": f"""
            WITH c AS (
              SELECT lower({_CLEAN.format(col='text')}) AS norm
              FROM documents WHERE doc_id < 400
            )
            SELECT doc_id, md5(text) AS text_md5
            FROM documents
            WHERE doc_id >= 200 AND doc_id < 700
              AND lower({_CLEAN.format(col='text')}) NOT IN (SELECT norm FROM c)
        """,
        "uniform_sample": """
            WITH d AS (
              SELECT doc_id, lang,
                     md5(CAST(doc_id AS VARCHAR) || '|gate') AS draw
              FROM documents WHERE doc_id < 2000
            ), r AS (
              SELECT doc_id, lang,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY draw ASC, doc_id ASC) AS rn
              FROM d
            )
            SELECT doc_id, lang FROM r WHERE rn <= 25
        """,
        "stratified_sample": """
            WITH cnt AS (
              SELECT lang, CAST(count(*) AS BIGINT) AS w
              FROM documents GROUP BY lang
            ), tot AS (
              SELECT CAST(sum(w) AS BIGINT) AS tw FROM cnt
            ), based AS (
              SELECT lang, (100 * w) // tw AS base, (100 * w) % tw AS rem
              FROM cnt, tot
            ), lv AS (
              SELECT CAST(100 - sum(base) AS BIGINT) AS l FROM based
            ), q AS (
              SELECT lang,
                     base + CASE WHEN row_number()
                                      OVER (ORDER BY rem DESC, lang ASC) <= l
                                 THEN 1 ELSE 0 END AS quota
              FROM based, lv
            ), d AS (
              SELECT doc_id, lang,
                     md5(CAST(doc_id AS VARCHAR) || '|') AS draw
              FROM documents
            ), r AS (
              SELECT doc_id, lang,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY draw ASC, doc_id ASC) AS rn
              FROM d
            )
            SELECT r.doc_id, r.lang FROM r JOIN q USING (lang)
            WHERE rn <= quota
        """,
        "chunk_documents": f"""
            WITH t AS (
              SELECT doc_id, {_WORDS_TEXT} AS w, len({_WORDS_TEXT}) AS n
              FROM documents WHERE doc_id < 300
            ), nn AS (
              SELECT doc_id, w, n,
                     CASE WHEN n <= 32 THEN 1
                          ELSE 1 + (n - 32 + 24 - 1) // 24 END AS nc
              FROM t WHERE n > 0
            ), ch AS (
              SELECT doc_id, w, c AS chunk_idx,
                     w[c * 24 + 1 : c * 24 + 32] AS chunk
              FROM nn, UNNEST(range(nc)) AS g(c)
            )
            SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
                   md5(array_to_string(chunk, ' ')) AS chunk_md5,
                   CAST(len(chunk) AS BIGINT) AS n_tokens
            FROM ch
        """,
        "url_templates": """
            WITH u AS (
              SELECT 'https://' || source || '.example.com/sec'
                     || (doc_id % 5) || '/doc' || doc_id
                     || CASE WHEN doc_id % 4 = 0
                             THEN '/' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)
                             ELSE '' END AS url,
                     source || '.example.com' AS host
              FROM documents WHERE doc_id < 800
            ), t AS (
              SELECT regexp_replace(
                       regexp_replace(url, '[0-9a-f]{8,}', '{hex}', 'g'),
                       '[0-9]+', '{n}', 'g') AS template,
                     host
              FROM u
            )
            SELECT template, count(*) AS n_urls,
                   count(DISTINCT host) AS n_hosts
            FROM t GROUP BY template
        """,
        "host_graph": """
            WITH d AS (SELECT * FROM documents WHERE doc_id < 600),
            a AS (
              SELECT 'https://' || source || '.example.com/p' || doc_id AS doc_id,
                     source || '.example.com' AS src_host,
                     'src' || ((doc_id * 3) % 20) || '.example.com' AS dst_host
              FROM d
              UNION ALL
              SELECT 'https://' || source || '.example.com/p' || doc_id,
                     source || '.example.com',
                     'src' || ((doc_id * 7 + 1) % 20) || '.example.com'
              FROM d
            )
            SELECT src_host, dst_host, count(*) AS n_links,
                   count(DISTINCT doc_id) AS n_pages
            FROM a WHERE dst_host <> src_host
            GROUP BY src_host, dst_host
        """,
        "image_stream_info": """
            SELECT media_ref, format, width, height, bit_depth, n_frames,
                   progressive, orientation
            FROM read_parquet(
                '/root/repo/fixtures/golden/image_stream_info.parquet')
        """,
        "image_dhash": """
            SELECT media_ref, dhash, width, height
            FROM read_parquet('/root/repo/fixtures/golden/image_dhash.parquet')
        """,
        "image_dhash_pairs": """
            SELECT ref_a, ref_b, hamming
            FROM read_parquet(
                '/root/repo/fixtures/golden/image_dhash_pairs.parquet')
        """,
        "archive_members": f"""
            SELECT * FROM (VALUES {archive_values})
            AS t(archive_ref, member, kind, n_bytes, member_md5)
        """,
        "audio_fingerprints": f"""
            WITH pk AS (SELECT * FROM {_audio_peak_values()})
            SELECT p1.media_ref, CAST(p1.t AS INT) AS frame_idx,
                   CAST(p1.b * 1048576 + p2.b * 1024 + 1 AS BIGINT) AS fp
            FROM pk p1 JOIN pk p2
              ON p1.media_ref = p2.media_ref AND p2.t = p1.t + 1
        """,
        "audio_overlap": f"""
            WITH pk AS (SELECT * FROM {_audio_peak_values()}),
            fps AS (
              SELECT DISTINCT p1.media_ref AS ref,
                     p1.b * 1048576 + p2.b * 1024 + 1 AS fp
              FROM pk p1 JOIN pk p2
                ON p1.media_ref = p2.media_ref AND p2.t = p1.t + 1
            ), sizes AS (
              SELECT ref, CAST(count(*) AS BIGINT) AS total
              FROM fps GROUP BY ref
            ), sh AS (
              SELECT a.ref AS ra, b.ref AS rb,
                     CAST(count(*) AS BIGINT) AS shared
              FROM fps a JOIN fps b ON a.fp = b.fp AND a.ref < b.ref
              GROUP BY 1, 2
            )
            SELECT ra AS ref_a, rb AS ref_b, shared,
                   sa.total AS a_total, sb.total AS b_total,
                   CAST(10000 * shared // sa.total AS BIGINT)
                     AS containment_a_bp,
                   CAST(10000 * shared // sb.total AS BIGINT)
                     AS containment_b_bp
            FROM sh
            JOIN sizes sa ON sa.ref = ra
            JOIN sizes sb ON sb.ref = rb
        """,
        "video_shots": """
            SELECT * FROM (VALUES
              ('vidA.avi', CAST(0 AS BIGINT), CAST(0 AS INT),
               CAST(3 AS INT), CAST(4 AS BIGINT)),
              ('vidA.avi', 1, 4, 6, 3),
              ('vidA.avi', 2, 7, 11, 5),
              ('vidB.avi', 0, 0, 1, 2),
              ('vidB.avi', 1, 2, 7, 6),
              ('vidC.avi', 0, 0, 2, 3),
              ('vidC_apng.png', 0, 0, 2, 3)
            ) AS t(media_ref, shot_idx, start_frame, end_frame, n_frames)
        """,
        "video_frame_overlap": """
            SELECT * FROM (VALUES
              ('vidA.avi', 'vidB.avi', CAST(2 AS BIGINT), CAST(3 AS BIGINT),
               CAST(2 AS BIGINT), CAST(6666 AS BIGINT), CAST(10000 AS BIGINT)),
              ('vidA.avi', 'vidC.avi', 1, 3, 1, 3333, 10000),
              ('vidA.avi', 'vidC_apng.png', 1, 3, 1, 3333, 10000),
              ('vidC.avi', 'vidC_apng.png', 1, 1, 1, 10000, 10000)
            ) AS t(ref_a, ref_b, shared, a_total, b_total,
                   containment_a_bp, containment_b_bp)
        """,
        "mp3_decode": """
            SELECT media_ref, sample_rate, channels, n_samples, line0, line1
            FROM read_parquet('/root/repo/fixtures/golden/mp3_decode.parquet')
        """,
        "cdc_chunks": """
            SELECT media_ref, chunk_idx, "offset", length, fp
            FROM read_parquet('/root/repo/fixtures/golden/cdc_chunks.parquet')
        """,
        "cdc_stats": """
            WITH per AS (
              SELECT fp, max(length) AS l, sum(length) AS t
              FROM read_parquet(
                  '/root/repo/fixtures/golden/cdc_chunks.parquet')
              GROUP BY fp
            )
            SELECT CAST(sum(t) AS BIGINT) AS total_bytes,
                   CAST(sum(l) AS BIGINT) AS distinct_bytes,
                   CAST((10000 * (sum(t) - sum(l))) // sum(t) AS BIGINT)
                     AS dup_bp
            FROM per
        """,
        "robots_sitemap_discovery": """
            WITH d AS (
              SELECT DISTINCT source,
                     'https://' || source || '.example.com/sm'
                       || (doc_id % 7) || '.xml' AS sitemap_url
              FROM documents WHERE doc_id < 300
            )
            SELECT source AS host, sitemap_url FROM d
            UNION ALL
            SELECT DISTINCT source AS host,
                   'https://' || source || '.example.com/extra.xml'
            FROM documents WHERE doc_id < 300
        """,
        "cluster_survivors": """
            WITH c AS (
              SELECT doc_id, doc_id % 97 AS component, n_chars AS score
              FROM documents WHERE doc_id < 2000
            ), best AS (
              SELECT component, doc_id AS survivor_id,
                     row_number() OVER (PARTITION BY component
                                        ORDER BY score DESC, doc_id ASC) AS rn
              FROM c
            )
            SELECT c.doc_id, c.component, b.survivor_id,
                   c.doc_id = b.survivor_id AS is_survivor
            FROM c JOIN (SELECT component, survivor_id
                         FROM best WHERE rn = 1) b USING (component)
        """,
        "hits": """
            WITH e AS (
              SELECT DISTINCT doc_id % 97 AS src,
                     (doc_id * doc_id * 3 + 1) % 97 AS dst
              FROM documents
            ), nodes AS (
              SELECT src AS node FROM e UNION SELECT dst FROM e
            ),
            a1r AS (SELECT e.dst, sum(1000000000) AS v
                    FROM e GROUP BY e.dst),
            a1 AS (SELECT dst, v // greatest((SELECT max(v) FROM a1r)
                                             // 1000000000, 1) AS v
                   FROM a1r),
            h1r AS (SELECT e.src, sum(a1.v) AS v
                    FROM e JOIN a1 ON e.dst = a1.dst GROUP BY e.src),
            h1 AS (SELECT src, v // greatest((SELECT max(v) FROM h1r)
                                             // 1000000000, 1) AS v
                   FROM h1r),
            a2r AS (SELECT e.dst, sum(h1.v) AS v
                    FROM e JOIN h1 ON e.src = h1.src GROUP BY e.dst),
            a2 AS (SELECT dst, v // greatest((SELECT max(v) FROM a2r)
                                             // 1000000000, 1) AS v
                   FROM a2r),
            h2r AS (SELECT e.src, sum(a2.v) AS v
                    FROM e JOIN a2 ON e.dst = a2.dst GROUP BY e.src),
            h2 AS (SELECT src, v // greatest((SELECT max(v) FROM h2r)
                                             // 1000000000, 1) AS v
                   FROM h2r)
            SELECT n.node,
                   CAST(coalesce(h2.v, 0) AS BIGINT) AS hub,
                   CAST(coalesce(a2.v, 0) AS BIGINT) AS auth
            FROM nodes n
            LEFT JOIN h2 ON n.node = h2.src
            LEFT JOIN a2 ON n.node = a2.dst
        """,
        "url_canonicalize": """
            SELECT doc_id,
                   'http://' || source || '.example.com/d/' || doc_id
                     || CASE WHEN doc_id % 3 = 0 THEN '?q=1' ELSE '' END AS url_canon,
                   source || '.example.com' AS host,
                   FALSE AS is_root
            FROM documents
        """,
        "template_rewrite_sql": r"""
            SELECT doc_id,
                   regexp_replace(text, '(\d+) (comments|likes|views|points)',
                                  '{count} \2', 'g') AS templated
            FROM documents
        """,
        # reference decision table for the synthesized template contents —
        # independently derived from template_detection.rs and validated
        # 0/6000 against the Python kernel (see q_template_detect)
        "template_detect": """
            WITH p AS (
              SELECT doc_id,
                ['days','hours','minutes','points','comments','items','rows','blobs']
                  [CAST(doc_id % 8 AS INT) + 1] AS u1,
                ['days','hours','minutes','points','comments','items','rows','blobs']
                  [CAST((doc_id // 8) % 8 AS INT) + 1] AS u2,
                CAST(doc_id % 90 + 1 AS VARCHAR) AS n1,
                CAST((doc_id * 7) % 90 + 1 AS VARCHAR) AS n2,
                ['bravo','ago','page'][CAST(doc_id % 3 AS INT) + 1] AS w1,
                doc_id % 4 AS v
              FROM documents WHERE doc_id < 2000
            ), f AS (
              SELECT *,
                u1 IN ('days','hours','minutes') AS t1,
                u2 IN ('days','hours','minutes') AS t2,
                u1 IN ('points','comments','items') AS c1,
                u2 IN ('points','comments','items') AS c2,
                (u1 NOT IN ('rows','blobs') OR u2 NOT IN ('rows','blobs')
                 OR w1 = 'ago') AS base
              FROM p
            ), g AS (
              SELECT *,
                CASE WHEN t1 THEN 'time' WHEN c1 THEN 'count'
                     WHEN w1 = 'ago' THEN 'time' ELSE 'value' END AS var_a,
                CASE WHEN t2 THEN 'time' WHEN c2 THEN 'count'
                     WHEN w1 = 'page' THEN 'count' ELSE 'value' END AS var_b
              FROM f
            )
            SELECT doc_id,
              CASE WHEN NOT base THEN NULL
                   WHEN v = 0 THEN 'alpha {' || var_a || '} ' || u1 || ' ' || w1
                                   || ' ' || n2 || ' ' || u2
                   WHEN v = 1 THEN 'alpha ' || n1 || u1 || ' ' || w1 || ' {'
                                   || var_b || '} ' || u2
                   WHEN v = 2 THEN 'alpha {' || var_a || '} ' || u1 || ' ' || w1
                                   || ' ' || n2 || u2
                   ELSE 'alpha {value} ' || u1 || ' ' || w1 || ' ' || n2
                        || ' ' || u2 END AS pattern,
              CASE WHEN NOT base THEN NULL
                   WHEN v IN (0, 2) THEN var_a
                   WHEN v = 1 THEN var_b
                   ELSE 'value' END AS var_name,
              CASE WHEN NOT base THEN NULL
                   WHEN v = 3 THEN 'Float' ELSE 'Number' END AS var_type
            FROM g
        """,
        "subtree_hashes": f"""
            WITH {_SYNTH_TREE_CTE}
            SELECT doc_id, pos, sig FROM sigs
        """,
        "find_by_path": f"""
            WITH {_SYNTH_TREE_CTE},
            anc AS (
              SELECT doc_id, host, pos, j, w[j] AS comp
              FROM nodes, UNNEST(range(1, pos)) AS t2(j)
            ),
            m AS (
              SELECT a1.doc_id, a1.pos, count(*) AS multiplicity
              FROM anc a1 JOIN anc a2
                ON a1.doc_id = a2.doc_id AND a1.pos = a2.pos AND a1.j < a2.j
              WHERE a1.comp = 'table' AND a2.comp = 'value'
              GROUP BY a1.doc_id, a1.pos
            )
            SELECT n.doc_id, n.host, n.pos, n.word AS content, m.multiplicity
            FROM nodes n JOIN m ON n.doc_id = m.doc_id AND n.pos = m.pos
            WHERE n.word = 'a'
        """,
        "mark_duplicates": f"""
            WITH {_SYNTH_TREE_CTE},
            elig AS (SELECT host FROM toks GROUP BY host HAVING count(*) >= 2),
            dups AS (
              SELECT host, sig FROM sigs
              WHERE host IN (SELECT host FROM elig)
                AND word NOT IN ('html','head','body','main','article','section')
              GROUP BY host, sig HAVING count(*) >= 2
            )
            SELECT s.doc_id, s.pos,
                   CASE WHEN d.sig IS NOT NULL THEN '[FILTERED DUPLICATE]'
                        ELSE s.word END AS text
            FROM sigs s LEFT JOIN dups d ON s.host = d.host AND s.sig = d.sig
        """,
        "sitemap_roundtrip": r"""
            WITH x AS (
              SELECT source,
                     '<urlset>' || string_agg(
                       '<url><loc>https://' || source || '.example.com/doc'
                         || doc_id || '</loc></url>', '' ORDER BY doc_id)
                       || '</urlset>' AS xml
              FROM documents WHERE doc_id < 500 GROUP BY source
            )
            SELECT source AS host,
                   'urlset' AS kind,
                   unnest(regexp_extract_all(xml,
                          '<loc>\s*([^<\s][^<]*?)\s*</loc>', 1)) AS url
            FROM x
        """,
        "explode_distinct": """
            SELECT lang, count(DISTINCT w) AS n_words FROM (
              SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents
            ) WHERE w <> '' GROUP BY lang
        """,
        "text_clean": rf"""
            SELECT doc_id, {_CLEAN.format(col='text')} AS cleaned
            FROM documents WHERE doc_id < 300
        """,
        "dedup_exact": rf"""
            SELECT min(doc_id) AS doc_id, count(*) AS n_copies
            FROM documents
            GROUP BY md5(lower({_CLEAN.format(col='text')}))
        """,
        "temperature_mix": """
            WITH c AS (
              SELECT source, count(*) AS n_group,
                     CAST(floor(sqrt(count(*))) AS BIGINT) AS w
              FROM documents WHERE doc_id < 600 GROUP BY source
            ), t AS (
              SELECT CAST(sum(w) AS BIGINT) AS wsum FROM c
            ), p AS (
              SELECT source, n_group,
                     least(16777216, (w * 200 * 16777216) // (wsum * n_group))
                       AS p24
              FROM c, t
            ), u AS (
              SELECT d.source, d.doc_id, p.n_group, p.p24,
                     md5(d.doc_id::VARCHAR || '|tmix') AS m
              FROM documents d JOIN p USING (source)
              WHERE d.doc_id < 600
            )
            SELECT source, doc_id, n_group, p24,
                   CAST((((((CASE WHEN ascii(substr(m,1,1)) <= 57 THEN ascii(substr(m,1,1)) - 48 ELSE ascii(substr(m,1,1)) - 87 END) * 16
                       + CASE WHEN ascii(substr(m,2,1)) <= 57 THEN ascii(substr(m,2,1)) - 48 ELSE ascii(substr(m,2,1)) - 87 END) * 16
                       + CASE WHEN ascii(substr(m,3,1)) <= 57 THEN ascii(substr(m,3,1)) - 48 ELSE ascii(substr(m,3,1)) - 87 END) * 16
                       + CASE WHEN ascii(substr(m,4,1)) <= 57 THEN ascii(substr(m,4,1)) - 48 ELSE ascii(substr(m,4,1)) - 87 END) * 16
                       + CASE WHEN ascii(substr(m,5,1)) <= 57 THEN ascii(substr(m,5,1)) - 48 ELSE ascii(substr(m,5,1)) - 87 END) * 16
                       + CASE WHEN ascii(substr(m,6,1)) <= 57 THEN ascii(substr(m,6,1)) - 48 ELSE ascii(substr(m,6,1)) - 87 END AS BIGINT) AS u24
            FROM u
            WHERE CAST((((((CASE WHEN ascii(substr(m,1,1)) <= 57 THEN ascii(substr(m,1,1)) - 48 ELSE ascii(substr(m,1,1)) - 87 END) * 16
                       + CASE WHEN ascii(substr(m,2,1)) <= 57 THEN ascii(substr(m,2,1)) - 48 ELSE ascii(substr(m,2,1)) - 87 END) * 16
                       + CASE WHEN ascii(substr(m,3,1)) <= 57 THEN ascii(substr(m,3,1)) - 48 ELSE ascii(substr(m,3,1)) - 87 END) * 16
                       + CASE WHEN ascii(substr(m,4,1)) <= 57 THEN ascii(substr(m,4,1)) - 48 ELSE ascii(substr(m,4,1)) - 87 END) * 16
                       + CASE WHEN ascii(substr(m,5,1)) <= 57 THEN ascii(substr(m,5,1)) - 48 ELSE ascii(substr(m,5,1)) - 87 END) * 16
                       + CASE WHEN ascii(substr(m,6,1)) <= 57 THEN ascii(substr(m,6,1)) - 48 ELSE ascii(substr(m,6,1)) - 87 END AS BIGINT) < p24
        """,
        "feed_entries": r"""
            WITH d AS (
              SELECT doc_id, source,
                     'https://' || source || '.example.com/doc' || doc_id
                       AS url,
                     lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0') AS sec,
                     lpad(CAST((doc_id % 27) + 1 AS VARCHAR), 2, '0') AS day
              FROM documents WHERE doc_id < 400
            )
            SELECT source || '-rss' AS host, 'rss' AS kind, url,
                   'Mon, 10 Aug 2026 12:00:' || sec || ' GMT' AS published,
                   'Doc ' || doc_id AS title,
                   CAST(epoch(TIMESTAMP '2026-08-10 12:00:00') + doc_id % 60
                        AS BIGINT) AS published_epoch
            FROM d WHERE doc_id % 2 = 0
            UNION ALL
            SELECT source || '-atom', 'atom', url,
                   '2026-08-' || day || 'T08:00:00Z',
                   'Doc ' || doc_id,
                   CAST(epoch(CAST('2026-08-' || day || ' 08:00:00'
                                   AS TIMESTAMP)) AS BIGINT)
            FROM d WHERE doc_id % 2 = 1
        """,
        "line_dedup": r"""
            WITH d AS (
              SELECT doc_id,
                     regexp_replace(text, '\. ', '.' || chr(10), 'g') AS t
              FROM documents WHERE doc_id < 500
            ), sp AS (
              SELECT doc_id, string_split(t, chr(10)) AS l FROM d
            ), ln AS (
              SELECT doc_id,
                     unnest(l) AS line,
                     unnest(range(len(l))) AS pos
              FROM sp
            ), f AS (
              SELECT doc_id, pos, line,
                     len(trim(line)) >= 10 AS elig,
                     row_number() OVER (
                       PARTITION BY CASE WHEN len(trim(line)) >= 10
                                         THEN line END
                       ORDER BY doc_id, pos) AS rn
              FROM ln
            ), k AS (
              SELECT doc_id, pos, line,
                     (NOT elig) OR rn = 1 AS keep
              FROM f
            )
            SELECT doc_id,
                   md5(coalesce(string_agg(CASE WHEN keep THEN line END,
                                           chr(10) ORDER BY pos), ''))
                     AS deduped_md5,
                   count(*) AS n_lines,
                   count(*) FILTER (WHERE keep) AS n_lines_kept
            FROM k GROUP BY doc_id
        """,
        # ---- golden-parquet gates for the 4 production (numpy/blake2b)
        # kernels: the expected outputs are computed by an INDEPENDENT
        # pure-Python/numpy oracle (tools/gen_golden.py — bit-exactness vs
        # the kernels enforced by tests/test_golden.py) over the fixed
        # sf0.01 driver tables, then materialized as parquet the DuckDB
        # gate reads back. Same rows+schema+hash strength as the in-SQL
        # oracles; regenerate with `python tools/gen_golden.py` if the
        # driver testdata ever changes.
        "dedup_minhash": """
            SELECT doc_id
            FROM read_parquet('/root/repo/fixtures/golden/dedup_minhash.parquet')
        """,
        "dedup_simhash": """
            SELECT a, b, hamming
            FROM read_parquet('/root/repo/fixtures/golden/dedup_simhash.parquet')
        """,
        "ann_lsh": """
            SELECT vec_id, sim
            FROM read_parquet('/root/repo/fixtures/golden/ann_lsh.parquet')
        """,
        "ann_ivf": """
            SELECT vec_id, sim
            FROM read_parquet('/root/repo/fixtures/golden/ann_ivf.parquet')
        """,
        "anchor_relevance": """
            WITH d AS (SELECT * FROM documents WHERE doc_id < 600),
            a1 AS (
              SELECT 'https://' || source || '.example.com/p' || doc_id AS doc_id,
                     'https://' || source || '.example.com/doc' || ((doc_id*7) % 311) AS url_canon,
                     1 + CASE lang WHEN 'en' THEN 2 WHEN 'fr' THEN 3 ELSE 0 END AS hits
              FROM d
            ),
            a2 AS (
              SELECT 'https://' || source || '.example.com/p' || doc_id AS doc_id,
                     'https://' || source || '.example.com/hub' AS url_canon,
                     5 AS hits
              FROM d WHERE doc_id % 3 = 0
            ),
            u AS (SELECT * FROM a1 UNION ALL SELECT * FROM a2)
            SELECT url_canon,
                   count(*) AS n_anchors,
                   count(DISTINCT doc_id) AS n_referrers,
                   -- CAST: DuckDB sum() is HUGEINT; hasher needs BIGINT (r4).
                   CAST(sum(hits) AS BIGINT) AS anchor_score
            FROM u GROUP BY url_canon
        """,
        "audio_stream_info": """
            SELECT media_ref, codec, sample_rate, channels, duration_ms,
                   bitrate_kbps, n_frames
            FROM read_parquet(
                '/root/repo/fixtures/golden/audio_stream_info.parquet')
        """,
        "embedding_near_dup_lsh": """
            SELECT a, b, sim
            FROM read_parquet(
                '/root/repo/fixtures/golden/embedding_near_dup_lsh.parquet')
        """,
        "hll_registers": r"""
            WITH u AS (
              SELECT source,
                     CAST(('0x' || substr(md5(doc_id::VARCHAR || '|hll'),1,12)) AS BIGINT) AS h
              FROM documents
            ), r AS (
              SELECT source, h // 1099511627776 AS bucket, h % 1099511627776 AS tail
              FROM u
            )
            SELECT source, bucket,
                   max(CASE WHEN tail = 0 THEN 41
                            ELSE 41 - length(bin(tail)) END) AS max_rho
            FROM r GROUP BY source, bucket
        """,
        "cms_registers": r"""
            WITH e AS (
              SELECT lang, d,
                     CAST(('0x' || substr(md5(source || '|cms' || d::VARCHAR),1,6)) AS BIGINT) % 64 AS col
              FROM documents, UNNEST(range(4)) AS t(d)
              WHERE source IS NOT NULL
            )
            SELECT lang, d, col, CAST(count(*) AS BIGINT) AS count
            FROM e GROUP BY lang, d, col
        """,
        "kmv_registers": r"""
            WITH h AS (
              SELECT DISTINCT source,
                     CAST(('0x' || substr(md5(md5(text) || '|kmv'),1,12)) AS BIGINT) AS hash
              FROM documents WHERE text IS NOT NULL
            ), r AS (
              SELECT source, hash,
                     row_number() OVER (PARTITION BY source ORDER BY hash) AS pos
              FROM h
            )
            SELECT source, pos, hash FROM r WHERE pos <= 32
        """,
        "kmv_overlap": r"""
            WITH h AS (
              SELECT DISTINCT source,
                     CAST(('0x' || substr(md5(md5(text) || '|kmv'),1,12)) AS BIGINT) AS hash
              FROM documents WHERE text IS NOT NULL
            ), r AS (
              SELECT source, hash,
                     row_number() OVER (PARTITION BY source ORDER BY hash) AS pos
              FROM h
            ), regs AS (
              SELECT source, hash FROM r WHERE pos <= 32
            ), keys AS (SELECT DISTINCT source FROM regs
            ), memb AS (
              SELECT x.source AS a, k.source AS b, x.hash, 1 AS in_a, 0 AS in_b
              FROM regs x JOIN keys k ON x.source < k.source
              UNION ALL
              SELECT k.source AS a, y.source AS b, y.hash, 0 AS in_a, 1 AS in_b
              FROM regs y JOIN keys k ON k.source < y.source
            ), uni AS (
              SELECT a, b, hash, max(in_a) AS in_a, max(in_b) AS in_b
              FROM memb GROUP BY a, b, hash
            ), ranked AS (
              SELECT *, row_number() OVER (PARTITION BY a, b ORDER BY hash) AS rn
              FROM uni
            )
            SELECT a, b, CAST(count(*) AS BIGINT) AS k_used,
                   CAST(sum(in_a * in_b) AS BIGINT) AS n_common
            FROM ranked WHERE rn <= 32 GROUP BY a, b
        """,
        "corpus_diff": r"""
            WITH old AS (
              SELECT doc_id, md5(text) AS old_fp
              FROM documents WHERE doc_id % 7 <> 0
            ), new AS (
              SELECT doc_id,
                     md5(CASE WHEN doc_id % 3 = 0 THEN text || ' v2'
                              ELSE text END) AS new_fp
              FROM documents WHERE doc_id % 5 <> 0
            )
            SELECT COALESCE(old.doc_id, new.doc_id) AS doc_id,
                   CASE WHEN old_fp IS NULL THEN 'added'
                        WHEN new_fp IS NULL THEN 'removed'
                        WHEN old_fp <> new_fp THEN 'changed'
                        ELSE 'unchanged' END AS change,
                   old_fp, new_fp
            FROM old FULL JOIN new ON old.doc_id = new.doc_id
        """,
        "log2_histogram": r"""
            SELECT source,
                   CASE WHEN n_chars <= 0 THEN -1
                        ELSE length(bin(n_chars::BIGINT)) - 1 END AS bucket,
                   CAST(count(*) AS BIGINT) AS n
            FROM documents WHERE n_chars IS NOT NULL
            GROUP BY source, bucket
        """,
        "winnow_fingerprints": rf"""
            WITH toks AS (
              SELECT doc_id, {words} AS w FROM documents WHERE doc_id < 400
            ), g AS (
              SELECT doc_id, len(w) - 8 + 1 AS m, w FROM toks WHERE len(w) > 0
            ), h AS (
              SELECT doc_id, m, greatest(m, 1) AS mc,
                     list_transform(range(1, greatest(m, 1)+1),
                       i -> CAST(('0x' || substr(md5(array_to_string(w[i:i+7],' ') || '|wf'),1,6)) AS BIGINT)) AS hs
              FROM g
            )
            SELECT DISTINCT doc_id,
                   j + least(4, mc) - list_position(list_reverse(hs[j:j+3]), list_min(hs[j:j+3])) AS pos,
                   list_min(hs[j:j+3]) AS fp
            FROM h, UNNEST(range(1, greatest(m - 4 + 1, 1)+1)) AS t(j)
        """,
        "duplicate_passages": rf"""
            WITH toks AS (
              SELECT doc_id, {words} AS w FROM documents WHERE doc_id < 400
            ), g AS (
              SELECT doc_id, len(w) - 8 + 1 AS m, w FROM toks WHERE len(w) > 0
            ), h AS (
              SELECT doc_id, m, greatest(m, 1) AS mc,
                     list_transform(range(1, greatest(m, 1)+1),
                       i -> CAST(('0x' || substr(md5(array_to_string(w[i:i+7],' ') || '|wf'),1,6)) AS BIGINT)) AS hs
              FROM g
            ), sels AS (
              SELECT DISTINCT doc_id,
                     j + least(4, mc) - list_position(list_reverse(hs[j:j+3]), list_min(hs[j:j+3])) AS pos,
                     list_min(hs[j:j+3]) AS fp
              FROM h, UNNEST(range(1, greatest(m - 4 + 1, 1)+1)) AS t(j)
            ), fps AS (SELECT DISTINCT doc_id, fp FROM sels
            ), shared AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) >= 2)
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp,
                   CAST(count(*) FILTER (fp IN (SELECT fp FROM shared)) AS BIGINT) AS n_shared,
                   CAST((10000 * count(*) FILTER (fp IN (SELECT fp FROM shared))) // count(*) AS BIGINT) AS share_bp
            FROM fps GROUP BY doc_id
        """,
        "exact_substring_spans": rf"""
            WITH toks AS (
              SELECT doc_id, {words} AS w FROM documents WHERE doc_id < 500
            ), pos AS (
              SELECT doc_id, i AS pos, array_to_string(w[i:i+9], ' ') AS g
              FROM toks, UNNEST(range(1, greatest(len(w) - 10 + 1, 0) + 1)) AS t(i)
            ), hot AS (
              SELECT g FROM pos GROUP BY g HAVING count(*) >= 2
            ), dup AS (
              SELECT doc_id, pos FROM pos WHERE g IN (SELECT g FROM hot)
            ), brk AS (
              SELECT doc_id, pos,
                     CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 10
                          THEN 1 ELSE 0 END AS b
              FROM dup
            ), grp AS (
              SELECT doc_id, pos,
                     sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS gid
              FROM brk
            )
            SELECT doc_id,
                   CAST(min(pos) AS BIGINT) AS start_tok,
                   CAST(max(pos) + 9 AS BIGINT) AS end_tok,
                   CAST(max(pos) + 9 - min(pos) + 1 AS BIGINT) AS span_tokens,
                   CAST(count(*) AS BIGINT) AS n_grams
            FROM grp GROUP BY doc_id, gid
        """,
        "exact_substring_removal": rf"""
            WITH toks AS (
              SELECT doc_id, {words} AS w FROM documents WHERE doc_id < 500
            ), pos AS (
              SELECT doc_id, i AS pos, array_to_string(w[i:i+9], ' ') AS g
              FROM toks, UNNEST(range(1, greatest(len(w) - 10 + 1, 0) + 1)) AS t(i)
            ), rn AS (
              SELECT doc_id, pos,
                     row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn
              FROM pos
            ), dup AS (
              SELECT doc_id, pos FROM rn WHERE rn >= 2
            ), brk AS (
              SELECT doc_id, pos,
                     CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 10
                          THEN 1 ELSE 0 END AS b
              FROM dup
            ), grp AS (
              SELECT doc_id, pos,
                     sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS gid
              FROM brk
            ), spans AS (
              SELECT doc_id, min(pos) AS s, max(pos) + 9 AS e
              FROM grp GROUP BY doc_id, gid
            ), cov AS (
              SELECT DISTINCT doc_id, unnest(range(s, e + 1)) AS tpos FROM spans
            ), tk AS (
              SELECT doc_id, unnest(w) AS tok,
                     unnest(range(1, len(w) + 1)) AS tpos
              FROM toks
            ), kept AS (
              SELECT tk.doc_id, tk.tpos, tk.tok,
                     cov.tpos IS NOT NULL AS covd
              FROM tk LEFT JOIN cov
                ON tk.doc_id = cov.doc_id AND tk.tpos = cov.tpos
            ), agg AS (
              SELECT doc_id,
                     md5(coalesce(string_agg(CASE WHEN NOT covd THEN tok END,
                                             ' ' ORDER BY tpos), '')) AS deduped_md5,
                     count(*) AS n_tokens,
                     count(*) FILTER (WHERE NOT covd) AS n_tokens_kept
              FROM kept GROUP BY doc_id
            )
            SELECT t.doc_id,
                   coalesce(agg.deduped_md5, md5('')) AS deduped_md5,
                   CAST(coalesce(agg.n_tokens, 0) AS BIGINT) AS n_tokens,
                   CAST(coalesce(agg.n_tokens_kept, 0) AS BIGINT) AS n_tokens_kept
            FROM (SELECT DISTINCT doc_id FROM toks) t
            LEFT JOIN agg USING (doc_id)
        """,
        "minhash_lsh_portable": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split(trim(regexp_replace(lower(text),'\s+',' ','g')),' '),
                                 x -> x <> '') AS w
              FROM documents WHERE doc_id < 600
            ), sh AS (
              SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS g
              FROM toks, UNNEST(range(1, greatest(len(w)-2, 1)+1)) AS t(i)
            ), sigs AS (
              SELECT doc_id, p.perm, min(md5(p.perm::VARCHAR || '|' || g)) AS mh
              FROM sh CROSS JOIN (SELECT unnest(range(8)) AS perm) p
              GROUP BY doc_id, p.perm
            ), bands AS (
              SELECT doc_id, perm // 2 AS band,
                     string_agg(mh, '' ORDER BY perm) AS key
              FROM sigs GROUP BY doc_id, perm // 2
            )
            SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
            FROM bands x JOIN bands y
              ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
        """,
        "simhash_portable": rf"""
            WITH d AS (
              SELECT doc_id, {words} AS w FROM documents WHERE doc_id < 300
            ), tok AS (
              SELECT doc_id, unnest(w) AS t FROM d
            ), votes AS (
              SELECT doc_id, bit,
                     sum(CASE WHEN ascii(substr(md5(bit::VARCHAR || '|' || t), 1, 1)) % 2 = 1
                              THEN 1 ELSE -1 END) AS v
              FROM tok, UNNEST(range(16)) AS r(bit)
              GROUP BY doc_id, bit
            ), sigged AS (
              SELECT doc_id,
                     CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << bit::INT) ELSE 0 END) AS BIGINT) AS simhash
              FROM votes GROUP BY doc_id
            ), sh AS (
              SELECT d.doc_id, coalesce(s.simhash, 0) AS simhash
              FROM d LEFT JOIN sigged s USING (doc_id)
            ), ch AS (
              SELECT doc_id, simhash, c, (simhash >> (4 * c)::INT) & 15 AS val
              FROM sh, UNNEST(range(4)) AS r2(c)
            )
            SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
                   CAST(len(list_filter(range(16),
                        i -> ((xor(l.simhash, r.simhash) >> i::INT) & 1) = 1)) AS BIGINT) AS hamming
            FROM ch l JOIN ch r ON l.c = r.c AND l.val = r.val AND l.doc_id < r.doc_id
            WHERE len(list_filter(range(16),
                  i -> ((xor(l.simhash, r.simhash) >> i::INT) & 1) = 1)) <= 3
        """,
        "dedup_clusters": rf"""
            WITH RECURSIVE toks AS (
              SELECT doc_id, {words} AS w FROM documents WHERE doc_id < 400
            ), sh AS (
              SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS g
              FROM toks, UNNEST(range(1, greatest(len(w)-2, 1)+1)) AS t(i)
            ), sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
            ), capped AS (
              SELECT * FROM sh
              WHERE g IN (SELECT g FROM sh GROUP BY g HAVING count(*) <= 100)
            ), pairs AS (
              SELECT a.doc_id AS a, b.doc_id AS b
              FROM capped a JOIN capped b ON a.g = b.g AND a.doc_id < b.doc_id
              JOIN sizes sa ON sa.doc_id = a.doc_id
              JOIN sizes sb ON sb.doc_id = b.doc_id
              GROUP BY a.doc_id, b.doc_id, sa.n, sb.n
              HAVING round(count(*)::DOUBLE / (sa.n + sb.n - count(*)), 4) >= 0.05
            ), edges AS (
              SELECT a AS src, b AS dst FROM pairs
              UNION SELECT b AS src, a AS dst FROM pairs
            ), reach AS (
              SELECT src AS node, src AS r FROM edges
              UNION
              SELECT e.dst AS node, reach.r FROM reach JOIN edges e ON e.src = reach.node
            )
            SELECT d.doc_id, CAST(coalesce(m.r, d.doc_id) AS BIGINT) AS cluster
            FROM (SELECT doc_id FROM documents WHERE doc_id < 400) d
            LEFT JOIN (SELECT node, min(r) AS r FROM reach GROUP BY node) m
              ON m.node = d.doc_id
        """,
        "decontamination": rf"""
            WITH d AS (
              SELECT doc_id, {words} AS w FROM documents WHERE doc_id < 500
            ), g AS (
              -- range(1, len(w)-4+1) is EMPTY for docs under 5 words:
              -- short docs emit no (partial) gram, mirroring the engine's
              -- size(toks) >= n guard in mark_contaminated
              SELECT DISTINCT doc_id, md5(array_to_string(w[i:i+4], ' ')) AS g
              FROM d, UNNEST(range(1, len(w)-4+1)) AS t(i)
            ), ev AS (
              SELECT DISTINCT g FROM g WHERE doc_id % 50 = 0
            ), hits AS (
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_overlap
              FROM g JOIN ev USING (g)
              WHERE doc_id % 50 != 0
              GROUP BY doc_id
            )
            SELECT d.doc_id, coalesce(h.n_overlap, 0) AS n_overlap,
                   coalesce(h.n_overlap, 0) > 0 AS contaminated
            FROM d LEFT JOIN hits h USING (doc_id)
            WHERE d.doc_id % 50 != 0
        """,
        "repetition_profile": rf"""
            WITH d AS (
              SELECT doc_id, {words} AS w FROM documents WHERE doc_id < 300
            ), grams AS (
              SELECT doc_id,
                     list_transform(range(1, greatest(len(w)-1, 1)+1),
                                    i -> array_to_string(w[i:i+1], ' ')) AS g2
              FROM d
            ), tw AS (
              SELECT doc_id, round(max(c)::DOUBLE / sum(c), 4) AS top_word_frac
              FROM (
                SELECT doc_id, t, count(*) AS c
                FROM (SELECT doc_id, unnest(w) AS t FROM d)
                GROUP BY doc_id, t
              ) GROUP BY doc_id
            )
            SELECT d.doc_id, len(d.w) AS n_words,
                   CASE WHEN len(d.w) >= 2
                        THEN round(1.0 - len(list_distinct(g.g2))::DOUBLE / len(g.g2), 4)
                        ELSE 0.0 END AS dup_2gram_frac,
                   coalesce(tw.top_word_frac, 0.0) AS top_word_frac
            FROM d JOIN grams g USING (doc_id) LEFT JOIN tw USING (doc_id)
        """,
        "pii_redaction": r"""
            WITH t AS (
              SELECT c_custkey,
                     'Reach ' || c_name || ' at user' || c_custkey::VARCHAR
                       || '@mail.example.com, ip 10.0.'
                       || (c_custkey % 256)::VARCHAR || '.'
                       || ((c_custkey * 7) % 256)::VARCHAR
                       || ', tel 555-' || lpad((c_custkey % 1000)::VARCHAR, 3, '0')
                       || '-' || lpad(((c_custkey * 3) % 10000)::VARCHAR, 4, '0') AS text
              FROM customer WHERE c_custkey < 500
            )
            SELECT c_custkey,
                   regexp_replace(regexp_replace(regexp_replace(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                     '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                     '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g') AS redacted
            FROM t
        """,
        "top_terms": rf"""
            WITH d AS (
              SELECT doc_id, {words} AS w FROM documents WHERE doc_id < 100
            ), tf AS (
              SELECT doc_id, t AS term, CAST(count(*) AS BIGINT) AS tf
              FROM (SELECT doc_id, unnest(w) AS t FROM d)
              GROUP BY doc_id, t
            ), dfreq AS (
              SELECT term, CAST(count(*) AS BIGINT) AS doc_freq FROM tf GROUP BY term
            )
            SELECT doc_id, term, tf, doc_freq, rank FROM (
              SELECT tf.doc_id, tf.term, tf.tf, dfreq.doc_freq,
                     row_number() OVER (PARTITION BY tf.doc_id
                       ORDER BY tf.tf DESC, dfreq.doc_freq ASC, tf.term ASC) AS rank
              FROM tf JOIN dfreq USING (term)
            ) WHERE rank <= 3
        """,
        "inverted_index": rf"""
            WITH d AS (
              SELECT doc_id, {words} AS w FROM documents WHERE doc_id < 200
            ), tf AS (
              SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
              FROM (SELECT doc_id, unnest(w) AS term FROM d)
              GROUP BY term, doc_id
            ), agg AS (
              SELECT term, CAST(count(*) AS BIGINT) AS doc_freq,
                     CAST(sum(tf) AS BIGINT) AS total_tf
              FROM tf GROUP BY term HAVING count(*) >= 2
            )
            SELECT tf.term, agg.doc_freq, agg.total_tf, tf.doc_id, tf.tf,
                   CAST(list_position(d.w, tf.term) - 1 AS INT) AS first_pos
            FROM tf
            JOIN agg USING (term)
            JOIN d USING (doc_id)
        """,
        "conjunctive_hits": rf"""
            SELECT doc_id
            FROM (SELECT doc_id, {words} AS w FROM documents)
            WHERE list_contains(w, 'spark') AND list_contains(w, 'merge')
              AND list_contains(w, 'window')
        """,
        "phrase_hits": rf"""
            SELECT doc_id
            FROM (SELECT doc_id, {words} AS w FROM documents)
            WHERE ' ' || array_to_string(w, ' ') || ' ' LIKE '% spark merge %'
        """,
        "cooccurrence": rf"""
            WITH tok AS (
              SELECT DISTINCT doc_id, term FROM (
                SELECT doc_id, unnest({words}) AS term
                FROM documents WHERE doc_id < 100
              )
            ), keep AS (
              SELECT term FROM tok GROUP BY term HAVING count(*) <= 78
            ), t AS (
              SELECT tok.doc_id, tok.term FROM tok JOIN keep USING (term)
            )
            SELECT a.term AS term_a, b.term AS term_b,
                   CAST(count(*) AS BIGINT) AS n_docs
            FROM t a JOIN t b ON a.doc_id = b.doc_id AND a.term < b.term
            GROUP BY a.term, b.term HAVING count(*) >= 2
        """,
        "bm25_components": rf"""
            WITH d AS (
              SELECT doc_id, {words} AS w FROM documents WHERE doc_id < 200
            ), lens AS (
              SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM d
            ), tf AS (
              SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
              FROM (SELECT doc_id, unnest(w) AS term FROM d)
              GROUP BY term, doc_id
            ), q AS (
              SELECT * FROM tf WHERE term IN ('spark', 'merge', 'window')
            ), dfreq AS (
              SELECT term, CAST(count(*) AS BIGINT) AS doc_freq
              FROM q GROUP BY term
            ), s AS (
              SELECT CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(dl) AS BIGINT) AS sum_dl
              FROM lens
            )
            SELECT q.term, q.doc_id, q.tf, lens.dl, dfreq.doc_freq,
                   s.n_docs, s.sum_dl
            FROM q JOIN lens USING (doc_id) JOIN dfreq USING (term)
            CROSS JOIN s
        """,
        "embedding_quantize": """
            WITH v AS (
              SELECT vec_id,
                     list_transform(embedding,
                                    x -> CAST(x AS DOUBLE)) AS e
              FROM embeddings
            ), s AS (
              SELECT vec_id, e, list_min(e) AS mn, list_max(e) AS mx FROM v
            ), z AS (
              SELECT vec_id, mn, mx,
                     unnest(list_zip(e, range(len(e)))) AS p
              FROM s
            )
            SELECT vec_id, CAST(p[2] AS INT) AS pos,
                   CAST(CASE WHEN mx > mn
                        THEN least(greatest(
                               floor(((p[1] - mn) * 255) / (mx - mn)), 0),
                             255)
                        ELSE 0 END AS INT) AS code
            FROM z
        """,
        "export_manifest": r"""
            WITH p AS (
              SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                             || '|export'), 1, 12)) AS BIGINT) % 8 AS shard,
                     CAST(('0x' || substr(md5('{"doc_id":'
                             || CAST(doc_id AS VARCHAR) || ',"text":'
                             || to_json(text) || '}' || '|cksum'),
                           1, 15)) AS BIGINT) AS ck
              FROM documents
            )
            SELECT CAST(shard AS INT) AS shard,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CAST(ck AS HUGEINT)) % 9223372036854775808
                        AS BIGINT) AS checksum
            FROM p GROUP BY shard
        """,
        "update_intervals": """
            WITH u AS (
              SELECT 'h' || CAST(user_id % 20 AS VARCHAR) AS key,
                     CAST(floor(epoch(ts)) AS BIGINT) AS s
              FROM events WHERE ts IS NOT NULL
            ), a AS (
              SELECT key, CAST(count(*) AS BIGINT) AS n_updates,
                     min(s) AS mn, max(s) AS mx
              FROM u GROUP BY key
            )
            SELECT key, n_updates,
                   CAST((mx - mn) // (n_updates - 1) AS BIGINT) AS spacing_s,
                   CAST(least(greatest(
                          (mx - mn) // (n_updates - 1) // 3600, 1), 48)
                        AS INT) AS interval
            FROM a WHERE n_updates >= 2
        """,
        "revalidate_robots": f"""
            WITH f AS ({_SYNTH_FRONTIER_SQL})
            SELECT url_canon, host FROM f
            WHERE status = 'PENDING'
              AND host IN ('h0.example.com', 'h1.example.com',
                           'h2.example.com', 'h3.example.com',
                           'h4.example.com', 'h5.example.com',
                           'h6.example.com', 'h7.example.com',
                           'h8.example.com', 'h9.example.com')
              AND regexp_extract(url_canon, 'example\\.com(/.*)$', 1)
                    LIKE '/p1%'
        """,
        "retry_backoff": f"""
            WITH f AS ({_SYNTH_FRONTIER_SQL}),
            a AS (
              SELECT url_canon,
                     1 + CAST(regexp_extract(url_canon, '/p(\\d+)$', 1)
                              AS INT) % 4 AS n_attempts
              FROM f
            )
            SELECT f.url_canon, f.host,
                   CAST(a.n_attempts AS INT) AS n_attempts,
                   CAST(40 - f.round_fetched AS INT) AS rounds_waited
            FROM f JOIN a USING (url_canon)
            WHERE f.status = 'FAILED' AND f.round_fetched IS NOT NULL
              AND a.n_attempts <= 3
              AND 40 - f.round_fetched >= (2 << (a.n_attempts - 1))
        """,
        "shard_assign": f"""
            WITH f AS ({_SYNTH_FRONTIER_SQL}),
            hosts AS (SELECT DISTINCT host AS key FROM f),
            w AS (
              SELECT key, i,
                     CAST(('0x' || substr(md5(key || '|'
                            || CAST(i AS VARCHAR) || '|shard'), 1, 12))
                          AS BIGINT) AS wt
              FROM hosts, (SELECT unnest(range(8)) AS i)
            ),
            r AS (
              SELECT key, i, row_number() OVER (
                       PARTITION BY key ORDER BY wt DESC, i DESC) AS rn
              FROM w
            )
            SELECT key, CAST(i AS INT) AS shard FROM r WHERE rn = 1
        """,
        "mirror_hosts": r"""
            WITH u AS (
              SELECT source, text FROM documents
              UNION ALL
              SELECT source || '-m' AS source, text
              FROM documents WHERE doc_id % 2 = 0
            ), h AS (
              SELECT DISTINCT source,
                     CAST(('0x' || substr(md5(md5(text) || '|kmv'), 1, 12))
                          AS BIGINT) AS hash
              FROM u WHERE text IS NOT NULL
            ), r AS (
              SELECT source, hash,
                     row_number() OVER (PARTITION BY source ORDER BY hash)
                       AS pos
              FROM h
            ), regs AS (
              SELECT source, hash, pos FROM r WHERE pos <= 32
            ), small AS (
              SELECT source, hash FROM regs WHERE pos <= 8
            ), ok AS (
              SELECT hash FROM small GROUP BY hash HAVING count(*) <= 64
            ), cand AS (
              SELECT DISTINCT x.source AS a, y.source AS b
              FROM small x
              JOIN ok USING (hash)
              JOIN small y USING (hash)
              WHERE x.source < y.source
            ), memb AS (
              SELECT c.a, c.b, g.hash, 1 AS in_a, 0 AS in_b
              FROM cand c JOIN regs g ON g.source = c.a
              UNION ALL
              SELECT c.a, c.b, g.hash, 0 AS in_a, 1 AS in_b
              FROM cand c JOIN regs g ON g.source = c.b
            ), uni AS (
              SELECT a, b, hash, max(in_a) AS in_a, max(in_b) AS in_b
              FROM memb GROUP BY a, b, hash
            ), ranked AS (
              SELECT *, row_number() OVER (PARTITION BY a, b ORDER BY hash)
                          AS rn
              FROM uni
            ), agg AS (
              SELECT a, b, CAST(count(*) AS BIGINT) AS k_used,
                     CAST(sum(in_a * in_b) AS BIGINT) AS n_common
              FROM ranked WHERE rn <= 32 GROUP BY a, b
            )
            SELECT a, b, k_used, n_common,
                   CAST(n_common * 1000000 // k_used AS BIGINT)
                     AS jaccard_ppm,
                   (n_common * 1000000 // k_used >= 500000) AS is_mirror
            FROM agg
        """,
        "bpe_pairs": rf"""
            WITH wc AS (
              SELECT u AS word, CAST(count(*) AS BIGINT) AS n
              FROM (SELECT unnest({words}) AS u
                    FROM documents WHERE doc_id < 100)
              GROUP BY u
            ), syms AS (
              SELECT n,
                     list_append(
                       list_transform(range(1, length(word) + 1),
                                      i -> word[i]),
                       '</w>') AS s
              FROM wc
            ), pr AS (
              SELECT n, unnest(list_zip(s[1:len(s) - 1], s[2:len(s)])) AS p
              FROM syms
            )
            SELECT p[1] AS a, p[2] AS b, CAST(sum(n) AS BIGINT) AS cnt
            FROM pr GROUP BY 1, 2
        """,
        "content_blocks": rf"""
            WITH toks AS (
              SELECT doc_id, ({words})[1:20] AS w
              FROM documents WHERE doc_id < 500
            ), d AS (
              SELECT doc_id, w, len(w) AS n FROM toks WHERE len(w) >= 1
            ), nodes AS (
              SELECT doc_id, n, i, w[i] AS tag,
                     least(1 + length(w[i]) % 3, n - i + 1) AS sz
              FROM (SELECT doc_id, n, w, unnest(range(1, n + 1)) AS i FROM d)
            ), marks AS (
              SELECT doc_id,
                     min(CASE WHEN split_part(tag, '.', 1) = 'a'
                              THEN i END) AS apos,
                     min(CASE WHEN split_part(tag, '.', 1) IN ('the', 'of')
                              THEN i END) AS bpos
              FROM nodes GROUP BY doc_id
            ), blocks AS (
              SELECT b.doc_id, b.i, b.tag, b.sz
              FROM nodes b
              WHERE b.tag IN ('spark', 'merge', 'window', 'data', 'query')
                AND NOT EXISTS (
                  SELECT 1 FROM nodes k
                  WHERE k.doc_id = b.doc_id AND k.i > b.i
                    AND k.i < b.i + b.sz
                    AND k.tag IN ('spark', 'merge', 'window', 'data', 'query')
                )
            ), stat AS (
              SELECT b.doc_id, b.i, b.tag, b.sz,
                     CASE WHEN m.apos IS NULL THEN 0
                          ELSE greatest(0, b.i + b.sz
                                           - greatest(b.i, m.apos)) END
                       AS lw,
                     (m.bpos IS NOT NULL AND m.bpos <= b.i) AS boiler
              FROM blocks b JOIN marks m USING (doc_id)
            )
            SELECT doc_id, CAST(i AS INT) AS offset, tag,
                   CAST(sz AS INT) AS n_words,
                   CAST(lw AS INT) AS n_link_words,
                   CAST(lw * 1000 // sz AS INT) AS link_ppt,
                   boiler,
                   (NOT boiler AND sz >= 2 AND lw * 1000 // sz <= 500)
                     AS is_content
            FROM stat
        """,
        "lm_score": _LM_SCORE_SQL,
        "lm_buckets": f"""
            WITH s AS ({_LM_SCORE_SQL})
            SELECT doc_id, mbits,
                   CASE WHEN mbits IS NULL THEN 'unscored'
                        WHEN mbits <= 2000 THEN 'head'
                        WHEN mbits <= 4000 THEN 'middle'
                        ELSE 'tail' END AS lm_bucket
            FROM s
        """,
        
        "nb_model": f"""
            WITH {_NB_TRAIN_SQL.format(words=_WORDS_TEXT)}
            SELECT label, bucket, c FROM feats
        """,
        "nb_classify": f"""
            WITH {_NB_TRAIN_SQL.format(words=_WORDS_TEXT)},
            priors AS (
              SELECT label, CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(len(w)) AS BIGINT) AS n_tokens
              FROM tr GROUP BY label
            ), tot AS (
              SELECT CAST(sum(n_docs) AS BIGINT) AS d FROM priors
            ), pri AS (
              SELECT label,
                     (length(bin(n_tokens + 4096)) - 1) AS norm_per_tok,
                     (length(bin(d)) - 1) - (length(bin(n_docs)) - 1)
                       AS prior_bits
              FROM priors, tot
            ), te AS (
              SELECT doc_id, {_WORDS_TEXT} AS w
              FROM documents WHERE doc_id % 2 = 1
            ), tb AS (
              SELECT doc_id,
                     {_NB_BUCKET.format(t='tok')} AS bucket
              FROM (SELECT doc_id, unnest(w) AS tok FROM te)
            ), evid AS (
              SELECT doc_id, label,
                     sum(length(bin(c + 1)) - 1) AS evidence
              FROM tb JOIN feats USING (bucket) GROUP BY doc_id, label
            ), base AS (
              SELECT doc_id, len(w) AS n_toks FROM te
            ), scored AS (
              SELECT base.doc_id, pri.label,
                     base.n_toks * pri.norm_per_tok
                       - COALESCE(evid.evidence, 0) + pri.prior_bits AS bits
              FROM base CROSS JOIN pri
              LEFT JOIN evid ON evid.doc_id = base.doc_id
                            AND evid.label = pri.label
            )
            SELECT doc_id, label AS pred_label, CAST(bits AS BIGINT) AS bits
            FROM scored
            QUALIFY row_number() OVER (PARTITION BY doc_id
                                       ORDER BY bits, label) = 1
        """,
        "dup_content_hosts": """
            WITH pages AS (
              SELECT source AS host,
                     source || '/' || doc_id || '/' || v AS url_canon,
                     md5(text) AS fingerprint
              FROM documents,
                   UNNEST(range(CASE WHEN ascii(substr(md5(source), 1, 1)) % 2 = 0
                                     THEN 4 ELSE 1 END)) AS t(v)
            ), agg AS (
              SELECT host,
                     CAST(count(DISTINCT url_canon) AS BIGINT) AS n_urls,
                     CAST(count(DISTINCT fingerprint) AS BIGINT) AS n_content
              FROM pages GROUP BY host
            )
            SELECT host, n_urls, n_content,
                   CAST((n_urls - n_content) * 10000 // n_urls AS BIGINT)
                     AS dup_ratio_bp,
                   (n_urls >= 50
                    AND (n_urls - n_content) * 10000 // n_urls >= 5000)
                     AS is_trap
            FROM agg
        """,
        "priority_aging": """
            WITH fr AS ({synth}),
            pend AS (
              SELECT host, url_canon, is_root,
                     score + (10 - CAST(regexp_extract(url_canon, '/p(\\d+)$', 1)
                                        AS BIGINT) % 7) * 0.25 AS aged,
                     CAST(10 - CAST(regexp_extract(url_canon, '/p(\\d+)$', 1)
                                    AS BIGINT) % 7 AS BIGINT) AS rounds_waited
              FROM fr WHERE status = 'PENDING'
            ), ranked AS (
              SELECT host, url_canon, rounds_waited,
                     row_number() OVER (
                       PARTITION BY host
                       ORDER BY is_root DESC, aged DESC, url_canon ASC
                     ) AS rn
              FROM pend
            )
            SELECT host, url_canon, rounds_waited FROM ranked WHERE rn <= 3
        """.format(synth=_SYNTH_FRONTIER_SQL),
        "change_rate": """
            WITH h AS (
              SELECT source AS host,
                     CASE WHEN (doc_id * 37 + r * 17) % 5 < 2
                          THEN 1 ELSE 0 END AS changed
              FROM documents, (SELECT unnest(range(5)) AS r)
              WHERE doc_id < 200
            ), agg AS (
              SELECT host AS key, CAST(count(*) AS BIGINT) AS n_obs,
                     CAST(sum(changed) AS BIGINT) AS n_changed
              FROM h GROUP BY host
            ), rated AS (
              SELECT key, n_obs, n_changed,
                     CAST((n_changed + 1) * 1000000 // (n_obs + 2) AS BIGINT)
                       AS rate_ppm
              FROM agg
            )
            SELECT key, n_obs, n_changed, rate_ppm,
                   CAST(least(greatest(4 * 1000000 // rate_ppm, 1), 20)
                        AS INT) AS interval
            FROM rated
        """,
        "budget_apportion": """
            WITH w AS (
              SELECT source AS key, CAST(count(*) AS BIGINT) AS wt
              FROM documents GROUP BY source
            ), tot AS (SELECT CAST(sum(wt) AS BIGINT) AS W FROM w),
            b AS (
              SELECT key, (9973 * wt) // W AS base, (9973 * wt) % W AS rem
              FROM w, tot
            ),
            l AS (SELECT 9973 - CAST(sum(base) AS BIGINT) AS L FROM b),
            r AS (
              SELECT key, base,
                     row_number() OVER (ORDER BY rem DESC, key ASC) AS rk
              FROM b
            )
            SELECT key,
                   CAST(base + CASE WHEN rk <= (SELECT L FROM l)
                                    THEN 1 ELSE 0 END AS BIGINT) AS quota
            FROM r
        """,
        "host_triangles": """
            WITH d AS (SELECT * FROM documents WHERE doc_id < 600),
            raw AS (
              SELECT source || '.example.com' AS s,
                     'src' || ((doc_id * 3) % 20) || '.example.com' AS t
              FROM d
              UNION ALL
              SELECT source || '.example.com',
                     'src' || ((doc_id * 7 + 1) % 20) || '.example.com'
              FROM d
            ), und AS (
              SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b
              FROM raw WHERE s <> t
            )
            SELECT e1.a AS a, e1.b AS b, e2.b AS c
            FROM und e1
            JOIN und e2 ON e2.a = e1.b
            JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
        """,
        "ann_lsh_portable": """
            WITH e AS (
              SELECT vec_id,
                     list_transform(embedding::DOUBLE[],
                                    x -> CAST(round(x * 1000) AS BIGINT)) AS q
              FROM embeddings
            ), ed AS (
              SELECT vec_id, d, q[d + 1] AS x FROM e, UNNEST(range(64)) AS t(d)
            ), pd AS (
              SELECT vec_id, p,
                     sum(CASE WHEN ascii(substr(md5(p::VARCHAR || ',' || d::VARCHAR), 1, 1)) % 2 = 0
                              THEN x ELSE -x END) AS dp
              FROM ed, UNNEST(range(8)) AS tp(p)
              GROUP BY vec_id, p
            ), b AS (
              SELECT vec_id,
                     CAST(sum(CASE WHEN dp > 0 THEN (1::BIGINT << p::INT) ELSE 0 END) AS BIGINT) AS bucket
              FROM pd GROUP BY vec_id
            ), qb AS (SELECT bucket FROM b WHERE vec_id = 0),
            qv AS (SELECT q FROM e WHERE vec_id = 0),
            cand AS (
              SELECT e.vec_id, e.q FROM e JOIN b USING (vec_id), qb
              WHERE b.bucket = qb.bucket
            )
            SELECT c.vec_id, CAST(sum(c.q[d + 1] * qv.q[d + 1]) AS BIGINT) AS score
            FROM cand c, qv, UNNEST(range(64)) AS t(d)
            GROUP BY c.vec_id
            ORDER BY score DESC, vec_id ASC
            LIMIT 10
        """,
        "ann_ivf_portable": """
            WITH e AS (
              SELECT vec_id,
                     list_transform(embedding::DOUBLE[],
                                    x -> CAST(round(x * 1000) AS BIGINT)) AS q
              FROM embeddings
            ), c AS (
              SELECT vec_id AS cid, q AS cq FROM e WHERE vec_id < 8
            ), dists AS (
              SELECT e.vec_id, c.cid,
                     CAST(sum((e.q[d+1] - c.cq[d+1]) * (e.q[d+1] - c.cq[d+1])) AS BIGINT) AS dist
              FROM e, c, UNNEST(range(64)) AS t(d)
              GROUP BY e.vec_id, c.cid
            ), cell AS (
              SELECT vec_id, cid AS cell FROM (
                SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn
                FROM dists
              ) WHERE rn = 1
            ), probes AS (
              SELECT cid FROM (
                SELECT cid, row_number() OVER (ORDER BY dist ASC, cid ASC) AS rn
                FROM dists WHERE vec_id = 0
              ) WHERE rn <= 2
            )
            SELECT d.vec_id, d.dist
            FROM dists d JOIN cell ON d.vec_id = cell.vec_id
            WHERE d.cid = 0 AND cell.cell IN (SELECT cid FROM probes)
            ORDER BY d.dist ASC, d.vec_id ASC
            LIMIT 10
        """,
        "semdedup": """
            WITH e AS (
              SELECT vec_id,
                     list_transform(embedding::DOUBLE[],
                                    x -> CAST(round(x * 100) AS BIGINT)) AS q
              FROM embeddings
            ), c AS (
              SELECT vec_id AS cid, q AS cq FROM e WHERE vec_id < 8
            ), dists AS (
              SELECT e.vec_id, c.cid,
                     CAST(sum((e.q[d+1] - c.cq[d+1]) * (e.q[d+1] - c.cq[d+1])) AS BIGINT) AS dist
              FROM e, c, UNNEST(range(64)) AS t(d)
              GROUP BY e.vec_id, c.cid
            ), cell AS (
              SELECT vec_id, cid AS cell FROM (
                SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn
                FROM dists
              ) WHERE rn = 1
            ), n2 AS (
              SELECT vec_id, CAST(sum(x * x) AS BIGINT) AS nn
              FROM (SELECT vec_id, UNNEST(q) AS x FROM e) GROUP BY vec_id
            ), dup AS (
              SELECT DISTINCT b.vec_id
              FROM cell a JOIN cell b ON a.cell = b.cell AND a.vec_id < b.vec_id
              JOIN e ea ON ea.vec_id = a.vec_id
              JOIN e eb ON eb.vec_id = b.vec_id
              JOIN n2 na ON na.vec_id = a.vec_id
              JOIN n2 nb ON nb.vec_id = b.vec_id,
              UNNEST(range(64)) AS t(d)
              GROUP BY a.vec_id, b.vec_id, na.nn, nb.nn
              HAVING sum(ea.q[d+1] * eb.q[d+1]) > 0
                 AND sum(ea.q[d+1] * eb.q[d+1]) * sum(ea.q[d+1] * eb.q[d+1]) * 10000
                     >= 1600 * na.nn * nb.nn
            )
            SELECT cell.vec_id, cell.cell,
                   (dup.vec_id IS NOT NULL) AS is_dup
            FROM cell LEFT JOIN dup ON cell.vec_id = dup.vec_id
            ORDER BY cell.vec_id ASC
        """,
        "ngram_jaccard": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split(lower(trim(regexp_replace(text,'\s+',' ','g'))),' '),
                                 x -> x <> '') AS w
              FROM documents WHERE doc_id < 400
            ), sh AS (
              SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS g
              FROM toks, UNNEST(range(1, greatest(len(w)-2, 1)+1)) AS t(i)
            ), sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
            ), capped AS (  -- mirror of the engine's df_cap=100 shingle drop
              SELECT * FROM sh
              WHERE g IN (SELECT g FROM sh GROUP BY g HAVING count(*) <= 100)
            )
            SELECT a.doc_id AS a, b.doc_id AS b,
                   round(count(*)::DOUBLE / (sa.n + sb.n - count(*)), 4) AS jaccard
            FROM capped a JOIN capped b ON a.g = b.g AND a.doc_id < b.doc_id
            JOIN sizes sa ON sa.doc_id = a.doc_id
            JOIN sizes sb ON sb.doc_id = b.doc_id
            GROUP BY a.doc_id, b.doc_id, sa.n, sb.n
            HAVING round(count(*)::DOUBLE / (sa.n + sb.n - count(*)), 4) >= 0.05
        """,
        "ann_cosine_topk": """
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[],
                         (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 6) AS sim
            FROM embeddings
            ORDER BY sim DESC, vec_id ASC LIMIT 10
        """,
        "embedding_near_dup": """
            SELECT a.vec_id AS a, b.vec_id AS b,
                   round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS sim
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE a.vec_id < 200 AND b.vec_id < 200
              AND round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.3
        """,
        "lang_id": f"""
            SELECT source, {lang_expr} AS lang_guess, count(*) AS n
            FROM documents GROUP BY source, lang_guess
        """,
        "quality_features": rf"""
            WITH f AS (
              SELECT doc_id,
                     {_CLEAN.format(col='text')} AS cleaned,
                     {words} AS toks
              FROM documents WHERE doc_id < 300
            )
            SELECT doc_id,
                   length(cleaned) AS n_chars,
                   len(toks) AS n_words,
                   round(length(cleaned)::DOUBLE / greatest(len(toks), 1), 4) AS mean_word_len,
                   round(len(regexp_extract_all(cleaned, '[^\w\s]'))::DOUBLE
                         / greatest(length(cleaned), 1), 4) AS punct_ratio,
                   round(len(list_intersect(toks, {_EN_STOP}))::DOUBLE
                         / greatest(len(toks), 1), 4) AS stopword_ratio
            FROM f
        """,
        "token_count": r"""
            SELECT source,
                   CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|\d+|[^\sA-Za-z\d]'))) AS BIGINT) AS total_tokens,
                   count(*) AS n_docs
            FROM documents GROUP BY source
        """,
        "hash_split": r"""
            WITH h AS (
              SELECT doc_id,
                     substr(md5(doc_id::VARCHAR), 1, 1) AS c1,
                     substr(md5(doc_id::VARCHAR), 2, 1) AS c2
              FROM documents
            ), b AS (
              SELECT doc_id,
                     ((CASE WHEN ascii(c1) <= 57 THEN ascii(c1) - 48
                            ELSE ascii(c1) - 87 END) * 16
                      + (CASE WHEN ascii(c2) <= 57 THEN ascii(c2) - 48
                              ELSE ascii(c2) - 87 END)) % 100 AS bucket
              FROM h
            )
            SELECT doc_id, bucket,
                   CASE WHEN bucket < 80 THEN 'train'
                        WHEN bucket < 90 THEN 'val'
                        ELSE 'test' END AS split
            FROM b
        """,
        "token_budget_pack": r"""
            WITH t AS (
              SELECT lang AS grp, doc_id,
                     len(regexp_extract_all(text, '[A-Za-z]+|\d+|[^\sA-Za-z\d]')) AS n_tokens
              FROM documents
            )
            SELECT grp, doc_id, n_tokens, cum_tokens FROM (
              SELECT grp, doc_id, n_tokens,
                     CAST(sum(n_tokens) OVER (
                       PARTITION BY grp ORDER BY n_tokens DESC, doc_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                       AS cum_tokens
              FROM t
            ) WHERE cum_tokens <= 5000
        """,
        "adaptive_budget": f"""
            WITH f AS ({_SYNTH_FRONTIER_SQL}),
            s AS (
              SELECT host,
                     sum(CASE WHEN status = 'FAILED' THEN 1 ELSE 0 END) AS nf,
                     count(*) AS att
              FROM f WHERE status IN ('SUCCESS', 'FAILED') GROUP BY host
            ), b AS (
              SELECT 'h' || CAST(i AS VARCHAR) || '.example.com' AS host,
                     CAST(i % 5 + 2 AS INT) AS budget
              FROM range(25) t(i)
            ), j AS (
              SELECT coalesce(s.host, b.host) AS host, s.att, s.nf, b.budget
              FROM s FULL OUTER JOIN b ON s.host = b.host
            )
            SELECT host,
                   CAST(CASE WHEN att IS NOT NULL AND nf * 2 >= att
                        THEN greatest(CAST(floor(coalesce(budget, 4) / 2)
                                           AS INT), 1)
                        ELSE coalesce(budget, 4) END AS INT) AS budget
            FROM j
        """,
        "weighted_sample": """
            WITH h AS (
              SELECT doc_id, n_chars,
                     md5(doc_id::VARCHAR || '|ws') AS m
              FROM documents
            ), u AS (
              SELECT doc_id, n_chars,
                     CAST((((((
                       (CASE WHEN ascii(substr(m,1,1)) <= 57
                             THEN ascii(substr(m,1,1)) - 48
                             ELSE ascii(substr(m,1,1)) - 87 END) * 16
                       + CASE WHEN ascii(substr(m,2,1)) <= 57
                              THEN ascii(substr(m,2,1)) - 48
                              ELSE ascii(substr(m,2,1)) - 87 END) * 16
                       + CASE WHEN ascii(substr(m,3,1)) <= 57
                              THEN ascii(substr(m,3,1)) - 48
                              ELSE ascii(substr(m,3,1)) - 87 END) * 16
                       + CASE WHEN ascii(substr(m,4,1)) <= 57
                              THEN ascii(substr(m,4,1)) - 48
                              ELSE ascii(substr(m,4,1)) - 87 END) * 16
                       + CASE WHEN ascii(substr(m,5,1)) <= 57
                              THEN ascii(substr(m,5,1)) - 48
                              ELSE ascii(substr(m,5,1)) - 87 END) * 16
                       + CASE WHEN ascii(substr(m,6,1)) <= 57
                              THEN ascii(substr(m,6,1)) - 48
                              ELSE ascii(substr(m,6,1)) - 87 END) AS BIGINT)
                       AS u24
              FROM h
            )
            SELECT doc_id, u24 FROM u
            WHERE u24 < least(n_chars * 8192, 16777216)
        """,
        "fingerprint_groups": rf"""
            SELECT source,
                   count(DISTINCT md5(lower({_CLEAN.format(col='text')}))) AS n_unique,
                   count(*) AS n_docs
            FROM documents GROUP BY source
        """,
    }
