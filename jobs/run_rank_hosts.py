"""spark-submit entrypoint: rank hosts of a crawled span-doc corpus.

Builds the host-level link graph from anchor spans (self-loops dropped),
runs the integer fixed-point centralities — PageRank and HITS — and
writes one parquet of (host, pagerank, hub, auth, out_links, in_links).
Crawl fleets use exactly this table to allocate seed and politeness
budgets; all scores are bit-deterministic bigints (see
operators/linkgraph.py).

    spark-submit --py-files dist/smartcrawler_spark.zip \\
        jobs/run_rank_hosts.py --corpus /data/corpus --output /data/hostrank

Local: python jobs/run_rank_hosts.py --corpus /tmp/corpus --output /tmp/hr
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description="host centrality ranking")
    ap.add_argument("--corpus", required=True,
                    help="corpus dir containing documents.parquet (span docs)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--iters-pagerank", type=int, default=3)
    ap.add_argument("--iters-hits", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from smartcrawler_spark.operators import linkgraph as LG

    spark = SparkSession.getActiveSession()
    if spark is None:
        from smartcrawler_spark.session import get_spark

        spark = get_spark(app_name="smartcrawler-rank-hosts")

    docs = spark.read.parquet(f"{args.corpus}/documents.parquet")
    edges = LG.host_link_graph(docs).persist()

    pr = LG.pagerank_fixed_point(edges, iters=args.iters_pagerank,
                                 src_col="src_host", dst_col="dst_host")
    hits = LG.hits_fixed_point(edges, iters=args.iters_hits,
                               src_col="src_host", dst_col="dst_host")
    degrees = (
        edges.groupBy(F.col("src_host").alias("node"))
        .agg(F.sum("n_links").alias("out_links"))
        .join(
            edges.groupBy(F.col("dst_host").alias("node"))
            .agg(F.sum("n_links").alias("in_links")),
            "node", "full_outer")
    )
    out = (
        pr.withColumnRenamed("rank", "pagerank")
        .join(hits, "node", "full_outer")
        .join(degrees, "node", "full_outer")
        .select(
            F.col("node").alias("host"),
            F.coalesce("pagerank", F.lit(0)).alias("pagerank"),
            F.coalesce("hub", F.lit(0)).alias("hub"),
            F.coalesce("auth", F.lit(0)).alias("auth"),
            F.coalesce("out_links", F.lit(0)).alias("out_links"),
            F.coalesce("in_links", F.lit(0)).alias("in_links"),
        )
    )
    out.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    top = [r["host"] for r in
           out.orderBy(F.col("auth").desc(), F.col("host")).limit(5).collect()]
    print(json.dumps({"hosts_ranked": n, "top_auth": top,
                      "output": args.output}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
