"""End-to-end test of the batch corpus-refinement job (jobs/run_pipeline.py):
real CLI main() on real parquet, per-stage survivor counts, output layout."""

from __future__ import annotations

import json
import os
import sys

import pytest

JOBS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "jobs")
sys.path.insert(0, JOBS)


def _run(capsys, argv):
    import run_pipeline

    old = sys.argv
    sys.argv = ["run_pipeline.py"] + argv
    try:
        assert run_pipeline.main() == 0
    finally:
        sys.argv = old
    out = [ln for ln in capsys.readouterr().out.splitlines() if ln.startswith("{")]
    return json.loads(out[-1])


def test_pipeline_job_end_to_end(spark, sf_dir, tmp_path, capsys):
    out_dir = str(tmp_path / "refined")
    res = _run(capsys, ["--input", f"{sf_dir}/documents.parquet",
                        "--output", out_dir, "--minhash", "--budget", "50000"])
    st = res["stages"]
    # counts only ever shrink through the gauntlet
    order = ["input", "quality_gated", "exact_deduped", "minhash_deduped",
             "budget_packed", "written"]
    vals = [st[k] for k in order]
    assert vals == sorted(vals, reverse=True) and st["written"] > 0
    refined = spark.read.parquet(out_dir)
    assert set(refined.columns) >= {"doc_id", "text", "lang", "n_tokens",
                                    "quality", "split", "bucket"}
    assert refined.count() == st["written"]
    splits = {r["split"] for r in refined.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"} and "train" in splits
    # determinism: a second run reproduces every stage count
    res2 = _run(capsys, ["--input", f"{sf_dir}/documents.parquet",
                         "--output", str(tmp_path / "r2"),
                         "--minhash", "--budget", "50000"])
    assert res2["stages"] == st


def test_pipeline_job_decontamination_removes_eval_overlap(
        spark, sf_dir, tmp_path, capsys):
    # eval set == the corpus itself -> every doc shares all its n-grams
    res = _run(capsys, ["--input", f"{sf_dir}/documents.parquet",
                        "--output", str(tmp_path / "out"),
                        "--eval", f"{sf_dir}/documents.parquet"])
    st = res["stages"]
    assert st["exact_deduped"] > 0 and st["decontaminated"] == 0


def test_pipeline_job_incremental_and_datacard(spark, sf_dir, tmp_path, capsys):
    first = str(tmp_path / "first")
    r1 = _run(capsys, ["--input", f"{sf_dir}/documents.parquet",
                       "--output", first, "--minhash"])
    # second run against the first output: only content the refined corpus
    # does NOT already contain survives the vs_existing stage
    r2 = _run(capsys, ["--input", f"{sf_dir}/documents.parquet",
                       "--output", str(tmp_path / "second"),
                       "--existing", first, "--datacard"])
    st = r2["stages"]
    assert st["vs_existing"] < st["quality_gated"]
    # everything the first run kept is 'already there'; what survives is
    # exactly the set the first run's near-dedup removed
    assert st["vs_existing"] == r1["stages"]["exact_deduped"] - \
        r1["stages"]["minhash_deduped"]
    card = spark.read.parquet(str(tmp_path / "second") + "_datacard")
    assert set(card.columns) == {"split", "lang", "n_docs", "total_tokens",
                                 "min_tokens", "max_tokens", "total_chars",
                                 "mean_tokens"}
    assert card.agg({"n_docs": "sum"}).collect()[0][0] == st["written"]


def test_pipeline_job_extract_content_from_span_corpus(
        spark, tmp_path, capsys):
    """--extract-content: a span/node corpus goes through main-content
    extraction before the gauntlet — chrome/boilerplate text never
    reaches the refined output."""
    from smartcrawler_spark.sources.corpus import CorpusConfig, generate_corpus

    d = str(tmp_path / "corpus")
    generate_corpus(d, CorpusConfig(n_hosts=3, pages_per_host=8,
                                    hot_host_pages=8))
    out_dir = str(tmp_path / "refined")
    # listing-page corpus: all text sits in anchors, so keep link-only
    # blocks (max-link-ppt 1000) and drop the word floor
    res = _run(capsys, ["--input", f"{d}/documents.parquet",
                        "--output", out_dir, "--extract-content",
                        "--content-min-words", "1",
                        "--content-max-link-ppt", "1000",
                        "--min-quality", "0"])
    st = res["stages"]
    assert st["content_extracted"] <= st["input"]
    assert st["written"] > 0
    refined = spark.read.parquet(out_dir)
    rows = refined.select("doc_id", "text").collect()
    assert all(r["text"] for r in rows)
    # parity with calling the operator directly on the same corpus
    from pyspark.sql import functions as F

    from smartcrawler_spark.operators import content as CT
    from smartcrawler_spark.functions import textops as T

    src = spark.read.parquet(f"{d}/documents.parquet")
    direct = {
        r["doc_id"]: r["main_text"]
        for r in CT.main_text(src, min_words=1, max_link_ppt=1000)
        .filter(F.length("main_text") > 0).collect()
    }
    for r in rows:
        # pipeline scrubs AFTER extraction; compare through the same scrub
        want = direct[r["doc_id"]]
        assert r["text"] == spark.createDataFrame(
            [(want,)], "t string").select(
            T.redact_pii(T.clean_text(F.col("t"))).alias("x")
        ).collect()[0]["x"]


def test_pipeline_job_nb_filter(spark, sf_dir, tmp_path, capsys):
    """--nb-seed trains the hashed NB on a labeled seed and keeps only
    docs predicted --nb-keep. The corpus is uniform word-salad, so the
    test pins the WIRING property that holds regardless of how the
    classifier splits it: every quality-gated doc gets exactly one
    predicted label, so the keep-sets of the two labels PARTITION the
    stage (a passthrough bug would double-count; an empty-join bug
    would zero both)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    marker = F.lower(F.col("text")).contains(" the ")
    seed = docs.select(
        F.when(marker, "clean").otherwise("junk").alias("label"), "text")
    seed_path = str(tmp_path / "seed")
    seed.write.parquet(seed_path)
    res = _run(capsys, ["--input", f"{sf_dir}/documents.parquet",
                        "--output", str(tmp_path / "out"),
                        "--nb-seed", seed_path, "--nb-keep", "clean"])
    st = res["stages"]
    assert 0 < st["nb_filtered"] <= st["quality_gated"]
    res2 = _run(capsys, ["--input", f"{sf_dir}/documents.parquet",
                         "--output", str(tmp_path / "out2"),
                         "--nb-seed", seed_path, "--nb-keep", "junk"])
    assert st["nb_filtered"] + res2["stages"]["nb_filtered"] == \
        st["quality_gated"]
    # determinism: the clean-side keep-set reproduces exactly
    res3 = _run(capsys, ["--input", f"{sf_dir}/documents.parquet",
                         "--output", str(tmp_path / "out3"),
                         "--nb-seed", seed_path, "--nb-keep", "clean"])
    assert res3["stages"]["nb_filtered"] == st["nb_filtered"]


def test_pipeline_job_sample_and_chunk(spark, sf_dir, tmp_path, capsys):
    """--sample-total draws exactly N docs stratified by language;
    --chunk-tokens re-emits them as token windows (the one stage allowed
    to GROW counts), chunk rows inheriting the doc's split."""
    res = _run(capsys, ["--input", f"{sf_dir}/documents.parquet",
                        "--output", str(tmp_path / "out"),
                        "--sample-total", "120",
                        "--chunk-tokens", "32", "--chunk-overlap", "8"])
    st = res["stages"]
    assert st["sampled"] == 120
    assert st["chunked"] >= st["sampled"]  # windows >= docs
    assert st["written"] == st["chunked"]
    out = spark.read.parquet(str(tmp_path / "out"))
    assert {"doc_id", "chunk_idx", "text", "n_tokens",
            "split"} <= set(out.columns)
    assert out.count() == st["chunked"]
    # every chunk respects the window size
    assert out.filter("n_tokens > 32").count() == 0
    assert out.select("doc_id").distinct().count() == 120
