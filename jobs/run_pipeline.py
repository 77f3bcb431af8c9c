"""spark-submit entrypoint for the training-data corpus refinement pipeline.

The batch companion to streaming/pipeline_stream.py — one job that takes a
raw crawled document table to a training-ready corpus through the standard
gauntlet, every stage an existing gated operator:

    scrub (clean + PII redact) -> language ID -> quality gates
    (composite score floor; Gopher/C4 prose bundles opt-in) ->
    incremental dedup vs an existing corpus (--existing [, --existing-near])
    -> exact dedup -> MinHash-LSH near-dedup -> benchmark decontamination
    (vs an eval-set parquet) -> stable hash split -> optional per-language
    token-budget pack -> parquet partitioned by split (+ optional
    per-(split, lang) datacard parquet)

Cluster usage:

    spark-submit --py-files dist/smartcrawler_spark.zip jobs/run_pipeline.py \\
        --input /data/documents.parquet --output s3://bucket/refined \\
        --eval /data/eval_benchmarks.parquet --minhash --budget 2000000

Local sandbox:

    python jobs/run_pipeline.py --input /root/testdata/sf0.001/documents.parquet \\
        --output /tmp/refined

Prints ONE JSON line of per-stage survivor counts (each count is one
metadata-scale action on a cached stage boundary; drop --metrics to skip
them and run a single write-only lineage).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description="corpus refinement pipeline")
    ap.add_argument("--input", required=True, help="documents parquet (doc_id, text, ...)")
    ap.add_argument("--output", required=True, help="output dir (parquet, partitioned by split)")
    ap.add_argument("--eval", default=None,
                    help="eval-set parquet for decontamination (doc_id, text)")
    ap.add_argument("--existing", default=None,
                    help="existing-corpus parquet: drop new docs whose "
                         "content is already there (incremental ingestion)")
    ap.add_argument("--existing-near", action="store_true",
                    help="also drop MinHash-band collisions vs --existing")
    ap.add_argument("--datacard", action="store_true",
                    help="write a per-(split, lang) datacard parquet next "
                         "to the output")
    ap.add_argument("--minhash", action="store_true",
                    help="enable MinHash-LSH near-dedup after exact dedup")
    ap.add_argument("--gopher", action="store_true",
                    help="enable the Gopher rule bundle (prose corpora; "
                         "the rules legitimately reject non-prose text)")
    ap.add_argument("--c4", action="store_true",
                    help="enable the C4 line/page gate (prose corpora)")
    ap.add_argument("--min-quality", type=float, default=0.05,
                    help="composite quality_score floor (0 disables)")
    ap.add_argument("--nb-seed", default=None,
                    help="labeled seed parquet (label, text): train the "
                         "hashed Naive-Bayes classifier on it and keep only "
                         "docs predicted --nb-keep (FineWeb/DCLM-style "
                         "model-based quality filtering; the model is "
                         "bounded by labels x buckets and broadcast)")
    ap.add_argument("--nb-keep", default="clean",
                    help="predicted label to keep with --nb-seed")
    ap.add_argument("--decontam-n", type=int, default=5,
                    help="n-gram size for decontamination (13 at real scale)")
    ap.add_argument("--budget", type=int, default=None,
                    help="per-language token budget (greedy quality-first pack)")
    ap.add_argument("--sample-total", type=int, default=None,
                    help="sample EXACTLY this many docs before splitting, "
                         "stratified by language (largest-remainder quotas "
                         "+ deterministic per-stratum draws)")
    ap.add_argument("--chunk-tokens", type=int, default=None,
                    help="emit fixed-size token windows of this many tokens "
                         "instead of whole documents (sequence prep)")
    ap.add_argument("--chunk-overlap", type=int, default=0,
                    help="tokens shared between consecutive windows "
                         "with --chunk-tokens")
    ap.add_argument("--train-pct", type=int, default=80)
    ap.add_argument("--val-pct", type=int, default=10)
    ap.add_argument("--extract-content", action="store_true",
                    help="input is a span/node corpus (doc_id, spans, "
                         "nodes): extract the article body first "
                         "(operators.content.main_text — boilerplate/"
                         "chrome/link-soup removed) and refine THAT text")
    ap.add_argument("--content-min-words", type=int, default=5,
                    help="block word floor for --extract-content")
    ap.add_argument("--content-max-link-ppt", type=int, default=330,
                    help="block link-density ceiling (parts-per-thousand) "
                         "for --extract-content; 1000 keeps link-only "
                         "blocks (listing/navigation corpora)")
    ap.add_argument("--metrics", action="store_true", default=True)
    ap.add_argument("--no-metrics", dest="metrics", action="store_false")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from smartcrawler_spark.functions import textops as T
    from smartcrawler_spark.operators import dedup as DD
    from smartcrawler_spark.operators import sampling as SA

    spark = SparkSession.getActiveSession()
    if spark is None:
        from smartcrawler_spark.session import get_spark

        spark = get_spark(app_name="smartcrawler-pipeline")

    counts: dict[str, int] = {}

    def stage(df, name):
        if args.metrics:
            df = df.persist()
            counts[name] = df.count()
        return df

    raw = spark.read.parquet(args.input)
    raw = stage(raw, "input")
    if args.extract_content:
        # span/node corpus -> extracted article bodies; downstream stages
        # see the usual (doc_id, text) contract. Map-only (zero shuffles
        # — tests/test_plans.py asserts the plan shape).
        from smartcrawler_spark.operators import content as CT

        raw = (
            CT.main_text(raw, min_words=args.content_min_words,
                         max_link_ppt=args.content_max_link_ppt)
            .filter(F.length("main_text") > 0)
            .select("doc_id", F.col("main_text").alias("text"))
        )
        raw = stage(raw, "content_extracted")

    # scrub + enrich (all whole-stage-codegen Column exprs)
    scrubbed = T.redact_pii(T.clean_text(F.col("text")))
    docs = raw.select(
        "doc_id",
        scrubbed.alias("text"),
        T.detect_language(scrubbed).alias("lang"),
        T.token_count(scrubbed).alias("n_tokens"),
        T.quality_score(scrubbed).alias("quality"),
    ).filter(F.length("text") > 0)

    # quality gates operate on the RAW text (line structure matters for
    # the Gopher/C4 line rules; clean_text collapses newlines)
    gates = []
    if args.gopher:
        gates.append(T.gopher_rules(F.col("text"))["gopher_pass"])
    if args.c4:
        # crawl text often lost its line breaks to HTML stripping; re-line
        # at sentence boundaries before the line rules (same normalization
        # as the c4_filters/line_dedup gates)
        relined = F.regexp_replace(F.col("text"), r"\. ", ".\n")
        gates.append(T.c4_line_filters(relined)["page_keep"])
    gated_ids = raw.select("doc_id", "text")
    for g in gates:
        gated_ids = gated_ids.filter(g)
    docs = docs.join(gated_ids.select("doc_id"), "doc_id", "left_semi")
    if args.min_quality > 0:
        docs = docs.filter(F.col("quality") >= args.min_quality)
    docs = stage(docs, "quality_gated")

    if args.nb_seed:
        # model-based quality filter: rule gates above are recall-cheap;
        # the classifier catches what rules can't phrase (gated operator
        # pair nb_model / nb_classify)
        from smartcrawler_spark.operators import nbclassifier as NB

        seed = spark.read.parquet(args.nb_seed)
        feats, priors = NB.nb_train(seed)
        pred = NB.nb_predict(NB.nb_score_bits(docs, feats, priors))
        docs = docs.join(
            pred.filter(F.col("pred_label") == args.nb_keep)
            .select("doc_id"), "doc_id", "left_semi")
        docs = stage(docs, "nb_filtered")

    if args.existing:
        existing = spark.read.parquet(args.existing)
        docs = DD.dedup_against_corpus(docs, existing,
                                       near=args.existing_near)
        docs = stage(docs, "vs_existing")

    # exact dedup: survivors (min id per normalized-text fingerprint)
    survivors = DD.exact_dedup(docs).select("doc_id")
    docs = docs.join(survivors, "doc_id", "left_semi")
    docs = stage(docs, "exact_deduped")

    if args.minhash:
        docs = DD.minhash_dedup(docs)
        docs = stage(docs, "minhash_deduped")

    if args.eval:
        eval_docs = spark.read.parquet(args.eval)
        marks = DD.mark_contaminated(docs, eval_docs, n=args.decontam_n)
        docs = docs.join(
            marks.filter(~F.col("contaminated")).select("doc_id"),
            "doc_id", "left_semi")
        docs = stage(docs, "decontaminated")

    if args.sample_total:
        docs = SA.stratified_sample(docs, args.sample_total,
                                    group_col="lang")
        docs = stage(docs, "sampled")

    docs = SA.hash_split(docs, train_pct=args.train_pct, val_pct=args.val_pct)

    if args.budget:
        packed = SA.token_budget_pack(
            docs, args.budget, priority=F.col("quality"))
        docs = docs.join(packed.select("doc_id"), "doc_id", "left_semi")
        docs = stage(docs, "budget_packed")

    if args.chunk_tokens:
        # sequence prep LAST, so dedup/decontam/split all ran doc-level;
        # chunks inherit the doc's split/lang/quality columns
        chunks = SA.chunk_documents(docs, args.chunk_tokens,
                                    args.chunk_overlap)
        docs = (docs.drop("text", "n_tokens")
                .join(chunks, "doc_id"))
        docs = stage(docs, "chunked")

    if args.metrics:
        docs = docs.persist()
        counts["written"] = docs.count()
    docs.write.mode("overwrite").partitionBy("split").parquet(args.output)
    if args.datacard:
        from smartcrawler_spark.plans.analysis import corpus_datacard

        corpus_datacard(docs).write.mode("overwrite").parquet(
            args.output.rstrip("/") + "_datacard")
    print(json.dumps({"stages": counts, "output": args.output}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
