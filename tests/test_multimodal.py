"""Multimodal plumbing: schemas, batch shapes, determinism of the fake
decoder, and the NotImplementedError gate for the real one."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from smartcrawler_spark import multimodal as MM
from smartcrawler_spark.sources.corpus import CorpusConfig, generate_corpus


@pytest.fixture(scope="module")
def assets(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mm"))
    generate_corpus(d, CorpusConfig(n_hosts=2, pages_per_host=4, hot_host_pages=4))
    docs = spark.read.parquet(f"{d}/documents.parquet")
    a = MM.media_assets_from_spans(docs)
    a.cache()
    return a


def test_assets_schema_and_payloads(assets):
    rows = assets.collect()
    assert len(rows) > 0
    for r in rows[:5]:
        assert r["n_bytes"] == len(r["payload"])
        if r["media_type"] == "image":
            assert r["n_bytes"] == r["width"] * r["height"] * 3


def test_assets_deterministic(spark, assets, tmp_path):
    """Same corpus regenerated -> byte-identical payloads (seeded fake)."""
    d = str(tmp_path / "c2")
    generate_corpus(d, CorpusConfig(n_hosts=2, pages_per_host=4, hot_host_pages=4))
    docs = spark.read.parquet(f"{d}/documents.parquet")
    again = {r["media_ref"]: bytes(r["payload"])
             for r in MM.media_assets_from_spans(docs).collect()}
    first = {r["media_ref"]: bytes(r["payload"]) for r in assets.collect()}
    assert first == again


def test_feature_extraction(assets):
    feats = MM.extract_features(assets, dim=16).collect()
    assert len(feats) == assets.count()
    for r in feats[:5]:
        assert len(r["feature"]) == 16
        norm = sum(x * x for x in r["feature"]) ** 0.5
        assert abs(norm - 1.0) < 1e-4  # normalized


def test_resize_and_frames(assets):
    thumbs = MM.resize_images(assets, max_side=32).collect()
    for r in thumbs[:5]:
        assert r["thumb_w"] <= 32 + 16  # integer-stride subsample bound
        assert len(r["thumb"]) == r["thumb_w"] * r["thumb_h"] * 3
    frames = MM.sample_frames(assets).collect()
    vids = assets.filter(F.col("media_type") == "video").count()
    if vids:
        assert len(frames) >= vids  # >= 1 frame per video


def test_real_decoder_gated(assets):
    with pytest.raises(Exception, match="NotImplementedError|imaging|vision|PIL"):
        MM.extract_features(assets, decoder="real").collect()


def test_media_near_dup_matches_numpy_oracle(spark, tmp_path_factory):
    """media spans -> features -> LSH near-dup pairs: the LSH path must find
    EXACTLY the pairs a brute-force numpy cosine over the same features finds
    at the threshold (recall can only miss via bucketing; verify it doesn't
    here), with identical rounded sims."""
    import itertools

    import numpy as np

    d = str(tmp_path_factory.mktemp("mmdup"))
    generate_corpus(d, CorpusConfig(n_hosts=3, pages_per_host=5, hot_host_pages=5))
    docs = spark.read.parquet(f"{d}/documents.parquet")

    feats = MM.extract_features(MM.media_assets_from_spans(docs))
    fmap = {r["media_ref"]: np.array(r["feature"], dtype=np.float64)
            for r in feats.collect()}
    want = set()
    for a, b in itertools.combinations(sorted(fmap), 2):
        va, vb = fmap[a], fmap[b]
        sim = round(float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))), 6)
        if sim >= 0.98:
            want.add((a, b, sim))

    got = {
        (r["a"], r["b"], r["sim"])
        for r in MM.media_near_dup(docs, threshold=0.98, bits=4, tables=8).collect()
    }
    assert got == want and len(want) > 0
