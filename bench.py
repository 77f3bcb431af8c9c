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

`--scaling` mode: re-runs the frontier round in two fresh subprocesses at
local[N] and local[4N] (sandbox stand-in for N vs 4N executors, per
BASELINE.md) and prints a second JSON line with both throughputs and the
scaling efficiency = T(4N) / (4 * T(N)).
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


def build_frontier_workload(spark, sf_dir):
    """Synthesize a skewed URL frontier from the sf tables (deterministic)."""
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("k"), (F.col("o_custkey") % 500).alias("h")
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        (F.col("l_orderkey") * 100 + F.col("l_linenumber") + 10_000_000).alias("k"),
        (F.col("l_partkey") % 500).alias("h"),
    )
    base = orders.unionByName(li)
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


def bench_frontier_round(spark, sf_dir) -> dict:
    """One full admission round over the synthetic frontier; returns
    {urls, seconds, urls_per_sec, admitted...}."""
    from pyspark.sql import functions as F

    from smartcrawler_spark.operators import frontier as FR

    raw = build_frontier_workload(spark, sf_dir)
    cands = FR.with_url_columns(raw, "url", {"news": 2.0, "item1": 0.5}).cache()
    n = cands.count()  # materialize BEFORE the clock: we time the round, not the gen

    seen = cands.filter(F.col("url_hash") % 2 == 0).select(
        "url_canon", "url_hash", "host"
    )
    robots = spark.createDataFrame(
        [(f"site{i}.example.com", "/private") for i in range(500)]
        + [("hot.example.com", "/private")],
        "host string, disallow_prefix string",
    )
    budgets = spark.createDataFrame(
        [("hot.example.com", 200)], "host string, budget int"
    )

    t0 = time.perf_counter()
    gated = FR.robots_gate(cands, robots)
    blooms = FR.build_bucket_blooms(seen, n_buckets=32)
    pre = FR.bloom_maybe_seen(spark, gated, blooms, n_buckets=32)
    tagged = FR.tag_seen(pre, seen)
    admitted = FR.admit_with_cap(tagged, seen, cap=2000).filter("admitted")
    scheduled = FR.politeness_topk(
        admitted.select("url_canon", "url_hash", "host", "is_root", "score"),
        budgets, default_budget=100, n_salts=8,
    )
    n_sched = scheduled.count()
    dt = time.perf_counter() - t0
    cands.unpersist()
    return {
        "urls": n,
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


def run_scaling(sf_dir: str, n_low: int = 8, n_high: int = 32) -> dict:
    """Same frontier job at local[n_low] vs local[n_high] in FRESH
    subprocesses (fresh JVMs — no shared executor state), reporting
    throughput at both and efficiency = T_high / ((n_high/n_low) * T_low)."""
    results = {}
    for n in (n_low, n_high):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(n), SPARK_GRAFT_SF_DIR=sf_dir)
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
        "metric": "frontier throughput scaling efficiency (local[%d] -> local[%d])"
                  % (n_low, n_high),
        "urls_per_sec_low": t_low,
        "urls_per_sec_high": t_high,
        "cores_low": n_low,
        "cores_high": n_high,
        "efficiency": round(eff, 3),
        "sf": sf_dir,
    }


def main():
    if "--frontier-only" in sys.argv:
        from smartcrawler_spark.session import get_spark

        spark = get_spark(app_name="bench-frontier", master=f"local[{CPUS}]",
                          shuffle_partitions=max(int(CPUS) * 2, 8))
        spark.sparkContext.setLogLevel("ERROR")
        # warm-up pass (JVM/codegen warmup), then the measured pass
        bench_frontier_round(spark, SF_DIR)
        print(json.dumps(bench_frontier_round(spark, SF_DIR)))
        spark.stop()
        return
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(SF_DIR)))
        return
    print(json.dumps(run_suite(SF_DIR, CPUS)))


if __name__ == "__main__":
    main()
