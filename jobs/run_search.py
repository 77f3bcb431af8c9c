"""spark-submit entrypoint: build a positional inverted index over a text
corpus and answer queries from it.

Two subcommand-ish modes in one flag set:

* ``--build``: tokenize documents.parquet (doc_id, text) with the shared
  tokenizer, build the index (operators/invindex.py) + the (doc_id, dl)
  lengths dim BM25 needs, write both as parquet. The index parquet is
  repartitioned by term so a downstream query's posting reads are
  partition-prunable.
* ``--query "spark merge"``: load a built index and answer the query in
  the requested ``--mode``: ``and`` (conjunctive posting intersection),
  ``phrase`` (adjacent-bigram positions), ``bm25`` (ranked top-k).
  Prints one JSON line with the hits.

    spark-submit --py-files dist/smartcrawler_spark.zip jobs/run_search.py \\
        --corpus /data/corpus --index /data/index --build
    spark-submit ... jobs/run_search.py \\
        --index /data/index --query "spark merge" --mode bm25 --k 10
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description="inverted-index build/search")
    ap.add_argument("--corpus", default=None,
                    help="corpus dir containing documents.parquet "
                         "(doc_id, text) — required with --build")
    ap.add_argument("--index", required=True,
                    help="index dir (written by --build, read by --query)")
    ap.add_argument("--build", action="store_true")
    ap.add_argument("--min-df", type=int, default=1)
    ap.add_argument("--max-df", type=int, default=None,
                    help="stoplist/skew cap: drop terms in more docs")
    ap.add_argument("--query", default=None,
                    help="whitespace-separated query terms")
    ap.add_argument("--mode", choices=["and", "phrase", "bm25"],
                    default="and")
    ap.add_argument("--k", type=int, default=10, help="bm25 top-k")
    args = ap.parse_args()
    if not args.build and not args.query:
        ap.error("need --build and/or --query")
    if args.build and not args.corpus:
        ap.error("--build requires --corpus")

    from pyspark.sql import SparkSession

    from smartcrawler_spark.operators import invindex as IX

    spark = SparkSession.getActiveSession()
    if spark is None:
        from smartcrawler_spark.session import get_spark

        spark = get_spark(app_name="smartcrawler-search")

    out: dict = {"index": args.index}
    if args.build:
        docs = spark.read.parquet(f"{args.corpus}/documents.parquet")
        idx = IX.inverted_index(docs, min_df=args.min_df, max_df=args.max_df)
        idx.repartition("term").write.mode("overwrite").parquet(
            f"{args.index}/postings")
        IX.doc_lengths(docs).write.mode("overwrite").parquet(
            f"{args.index}/lengths")
        out["terms"] = spark.read.parquet(f"{args.index}/postings").count()
        out["docs"] = spark.read.parquet(f"{args.index}/lengths").count()

    if args.query:
        terms = [t for t in args.query.lower().split() if t]
        idx = spark.read.parquet(f"{args.index}/postings")
        if args.mode == "and":
            hits = IX.conjunctive_docs(idx, terms)
            out["hits"] = sorted(r["doc_id"] for r in hits.collect())
        elif args.mode == "phrase":
            if len(terms) != 2:
                ap.error("--mode phrase takes exactly two terms")
            hits = IX.phrase_docs(idx, terms[0], terms[1])
            out["hits"] = sorted(r["doc_id"] for r in hits.collect())
        else:
            lens = spark.read.parquet(f"{args.index}/lengths")
            ranked = IX.bm25_topk(idx, lens, terms, k=args.k)
            out["hits"] = [
                {"doc_id": r["doc_id"], "score": round(r["score"], 6)}
                for r in ranked.collect()
            ]
        out["mode"] = args.mode
        out["query"] = terms
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
