#!/usr/bin/env python
"""Capture .explain('formatted') for declared bench queries into
plans/<dir>/<query>_<suffix>.txt (judge-checkable plan evidence).

Usage: python tools/capture_plans.py --sf /root/testdata/sf1.0 \
          --queries a,b,c --suffix before --dir plans/r06
"""
from __future__ import annotations

import argparse
import os
import sys


def explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf1.0")
    ap.add_argument("--queries", default="")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--dir", default="plans/r06")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from smartcrawler_spark.session import get_spark
    import __spark_entry__ as E

    spark = get_spark(app_name="capture_plans",
                      master=f"local[{args.cpus}]",
                      shuffle_partitions=max(int(args.cpus) * 2, 8))
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.dir, exist_ok=True)
    qs = E.queries()
    names = [n for n in args.queries.split(",") if n] or sorted(qs)
    for name in names:
        try:
            df = qs[name](spark, args.sf)
            txt = explain_str(df)
        except Exception as exc:  # noqa: BLE001 — record the failure
            txt = f"EXPLAIN FAILED: {exc!r}\n"
        with open(f"{args.dir}/{name}_{args.suffix}.txt", "w") as f:
            f.write(txt)
        print(name, "ok", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
