"""Reference-mode crawl: the EXACT two-phase flow of the reference's main()
(/root/reference/src/main.rs:57-177) as DataFrame stages, including the
integration-test ordering contract (initial URL first, then domain root,
then discovered — /root/reference/tests/real_world_tests.rs:90-105) and the
per-domain cap (3 normal / 10 prep, main.rs:60).

Ground truth: smartcrawler_spark.oracle.reference_crawl. Phase 3 is the
duplicate analysis (normal mode, storage.rs:119-150) or template-path
extraction (prep mode, template_detection.rs:306-347) over the SUCCESS
pages, exactly as main() dispatches on --prep.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import urls as U
from ..operators import frontier as FR
from ..operators import spans as SP
from ..oracle import canon, host_of


@dataclass
class ReferenceCrawlResult:
    frontier: DataFrame        # url_canon, host, status, score, is_root, title
    crawl_log: DataFrame       # round, seq, url_canon
    analysis: DataFrame        # dup_nodes (normal) | template paths (prep)
    prep: bool


def reference_crawl(
    spark: SparkSession,
    corpus_dir: str,
    initial_url: str,
    prep: bool = False,
    keywords: dict[str, float] | None = None,
) -> ReferenceCrawlResult:
    keywords = keywords or {}
    max_urls = 10 if prep else 3

    initial = canon(initial_url)
    domain = host_of(initial)
    root = canon(f"https://{domain}/")

    docs = (
        spark.read.parquet(f"{corpus_dir}/documents.parquet")
        .withColumn("doc_canon", U.canonicalize_url(F.col("doc_id")))
    )

    seeds = spark.createDataFrame(
        [(root,), (initial,)], "url string"
    ).dropDuplicates(["url"])
    frontier0 = FR.with_url_columns(seeds, "url", keywords)

    # ---- phase 1: discovery — fetch the initial URL, admit its links -----
    initial_doc = docs.filter(F.col("doc_canon") == initial)
    links = (
        initial_doc.select(F.explode(F.filter("spans", lambda s: s["kind"] == "a")).alias("s"))
        .filter(F.col("s.media_ref") != "")
        .select(U.resolve_href(F.col("s.media_ref"), F.lit(domain)).alias("url"))
        .filter(U.same_domain(F.col("url"), F.lit(domain)))
    )
    cands = FR.with_url_columns(links, "url", keywords).dropDuplicates(["url_canon"])
    novel = FR.seen_anti_join(cands, frontier0)
    n_seeds = frontier0.count()
    room = max(0, max_urls - n_seeds)
    admitted = (
        novel.orderBy(F.col("score").desc(), F.col("url_canon").asc()).limit(room)
    )
    frontier1 = frontier0.unionByName(admitted)

    # ---- phase 2: fetch all, initial-first/root-next ordering -------------
    ordered = frontier1.withColumn(
        "_prio",
        F.when(F.col("url_canon") == initial, 0)
        .when(F.col("is_root"), 1)
        .otherwise(2),
    )
    w = Window.orderBy(
        F.col("_prio").asc(), F.col("score").desc(), F.col("url_canon").asc()
    )
    djoin = docs.select("doc_canon", "spans")
    fetched = (
        ordered.join(djoin, ordered.url_canon == djoin.doc_canon, "left")
        .withColumn(
            "status",
            F.when(F.col("doc_canon").isNull(), "FAILED").otherwise("SUCCESS"),
        )
        .withColumn("title", SP.find_title(None))
    )

    frontier = fetched.select(
        "url_canon", "host", "status", "score", "is_root", "title"
    )

    # crawl_log: round 1 = the discovery fetch of the initial URL; round 2 =
    # phase-2 fetches, skipping URLs already SUCCESS in phase 1 (= the
    # initial URL iff its fetch succeeded, main.rs:124-129)
    log1 = spark.createDataFrame([(1, 1, initial)], "round int, seq int, url_canon string")
    initial_success = F.col("url_canon") == initial
    phase2 = (
        fetched.withColumn("_skip", initial_success & (F.col("status") == "SUCCESS"))
        .filter(~F.col("_skip"))
        .withColumn("seq", F.row_number().over(w))
        .select(F.lit(2).alias("round"), "seq", "url_canon")
    )
    crawl_log = log1.unionByName(phase2)

    # ---- phase 3: duplicate analysis | template extraction ----------------
    # fresh scan of documents (frontier derives from `docs`; re-reading
    # breaks the lineage so the join is not an ambiguous self-join)
    docs2 = (
        spark.read.parquet(f"{corpus_dir}/documents.parquet")
        .withColumn("doc_canon", U.canonicalize_url(F.col("doc_id")))
    )
    success_docs = (
        frontier.filter(F.col("status") == "SUCCESS")
        .select("url_canon")
        .join(docs2, frontier.url_canon == docs2.doc_canon, "inner")
        .select("doc_id", docs2.host, "spans", "nodes")
    )
    analysis = (
        SP.extract_template_paths(success_docs)
        if prep
        else SP.domain_duplicates(success_docs)
    )
    return ReferenceCrawlResult(frontier=frontier, crawl_log=crawl_log,
                                analysis=analysis, prep=prep)
