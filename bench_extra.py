#!/usr/bin/env python
"""Per-query isolation bench (guide §1.4): times individual declared
queries with the noop sink and captures .explain('formatted') to
plans/<tag>/<query>_<suffix>.txt.  Separate from the FROZEN bench.py —
numbers cited in OPTIMIZATION_r06.md.

Usage:
  python bench_extra.py --sf /root/testdata/sf1.0 \
      --queries embedding_near_dup_lsh,nb_classify \
      --repeats 2 --plans-dir plans/r06 --suffix before
  python bench_extra.py --sf /root/testdata/sf1.0 --frontier  # frontier round only
"""
from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--queries", default="")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--plans-dir", default="")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--frontier", action="store_true",
                    help="run the frontier admission round instead of queries")
    ap.add_argument("--mult", type=int, default=0,
                    help="frontier workload multiplier (0 = bench.py default)")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from smartcrawler_spark.session import get_spark
    spark = get_spark(app_name="bench_extra", master=f"local[{args.cpus}]",
                      shuffle_partitions=max(int(args.cpus) * 2, 8))
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, object] = {"sf": args.sf, "cpus": args.cpus}

    if args.frontier:
        import bench as B
        mult = args.mult or int(os.environ.get("SPARK_GRAFT_FRONTIER_MULT", "4"))
        B.bench_frontier_round(spark, args.sf, mult)  # warm-up
        runs = [B.bench_frontier_round(spark, args.sf, mult)
                for _ in range(args.repeats)]
        results["frontier_runs"] = runs
        print(json.dumps(results))
        spark.stop()
        return

    import __spark_entry__ as E
    qs = E.queries()
    names = [n for n in args.queries.split(",") if n]
    timings: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(f"{args.plans_dir}/{name}_{args.suffix}.txt", "w") as f:
                f.write(plan)
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        runs = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        timings[name] = runs
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: {runs}", flush=True)
    results["queries"] = timings
    out = json.dumps(results)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
