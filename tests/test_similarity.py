"""Similarity search: brute-force cosine top-k vs numpy oracle; LSH ANN
recall; embedding near-dup pairs."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from smartcrawler_spark.operators import similarity as SIM


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = df.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    return df, vecs


def _oracle_topk(vecs, q, k):
    qn = q / np.linalg.norm(q)
    sims = {
        i: round(float(v @ qn / np.linalg.norm(v)), 6) for i, v in vecs.items()
    }
    return sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def test_bruteforce_topk_matches_numpy(spark, emb):
    df, vecs = emb
    q = vecs[0].tolist()
    got = [(r["vec_id"], r["sim"]) for r in SIM.cosine_topk_bruteforce(df, q, k=10).collect()]
    want = _oracle_topk(vecs, np.array(q), 10)
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert abs(g[1] - w[1]) < 1e-4


def test_lsh_topk_recall(spark, emb):
    df, vecs = emb
    q = vecs[0].tolist()
    exact = {v for v, _ in _oracle_topk(vecs, np.array(q), 10)}
    # this synthetic table is near-orthogonal (top-10 sims ~0.3) — the
    # hardest LSH regime; bits=4/tables=16 gives ~88% expected recall here.
    # Real embedding corpora cluster far tighter and prune far better.
    ann = {r["vec_id"] for r in SIM.cosine_topk_lsh(df, q, k=10, bits=4, tables=16).collect()}
    assert len(ann & exact) >= 6
    assert 0 in ann  # the query vector itself always collides with itself


def test_ivf_topk_recall(spark, emb):
    df, vecs = emb
    q = vecs[0].tolist()
    exact = {v for v, _ in _oracle_topk(vecs, np.array(q), 10)}
    ann = {r["vec_id"] for r in SIM.cosine_topk_ivf(
        df, q, k=10, n_centroids=32, nprobe=16).collect()}
    # probing half the cells on near-orthogonal data: expect most of top-10
    assert len(ann & exact) >= 5
    assert 0 in ann  # the query's own vector shares its cell by definition


def test_ivf_prunes_candidates(spark, emb):
    """The cell filter must actually skip most of the table."""
    from pyspark.sql import functions as F

    df, vecs = emb
    assign = SIM.make_ivf_assign_udf(64, 32)
    cells = df.withColumn("c", assign(F.col("embedding"))).groupBy("c").count()
    assert cells.count() > 16  # vectors spread over many cells


def test_near_dup_pairs_finds_planted_duplicate(spark, emb):
    df, vecs = emb
    # plant an exact duplicate of vec 0 with id 10_000
    dup = df.sparkSession.createDataFrame(
        [(10_000, [float(x) for x in vecs[0]], 0)], df.schema
    )
    aug = df.unionByName(dup)
    pairs = SIM.embedding_near_dup_pairs(aug, threshold=0.999, dim=64, bits=8, tables=8)
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    assert (0, 10_000) in got


def test_dot_and_norm_jvm_match_numpy(spark, emb):
    df, vecs = emb
    row = df.filter(F.col("vec_id") == 1).select(
        SIM.dot(F.col("embedding"), F.col("embedding")).alias("d"),
        SIM.l2_norm(F.col("embedding")).alias("n"),
    ).collect()[0]
    v = vecs[1]
    assert abs(row["d"] - float(v @ v)) < 1e-3
    assert abs(row["n"] - float(np.linalg.norm(v))) < 1e-4


def test_kmeans_centroids_improve_ivf_recall(spark, emb):
    """Trained spherical-kmeans centroids must not lose recall vs the seeded
    random quantizer at equal nprobe, and should tighten cells (mean
    intra-cell cosine strictly improves over random assignment)."""
    df, vecs = emb
    q = vecs[0].tolist()
    dim = len(q)
    exact = {v for v, _ in _oracle_topk(vecs, np.array(q), 10)}

    trained = SIM.kmeans_centroids(df, dim, n_centroids=32, n_iter=4)
    assert trained.shape == (32, dim)
    np.testing.assert_allclose(np.linalg.norm(trained, axis=1), 1.0, atol=1e-5)

    got_rand = {r["vec_id"] for r in SIM.cosine_topk_ivf(
        df, q, k=10, n_centroids=32, nprobe=8).collect()}
    got_train = {r["vec_id"] for r in SIM.cosine_topk_ivf(
        df, q, k=10, n_centroids=32, nprobe=8, centroids=trained).collect()}
    assert len(got_train & exact) >= len(got_rand & exact)
    assert 0 in got_train  # the query's own vector lands in a probed cell

    # quantization quality: mean cosine(vector, its centroid) improves
    mat = np.stack([vecs[i] for i in sorted(vecs)]).astype(np.float32)
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    rand = SIM._ivf_centroids(dim, 32, seed=13)
    q_rand = (unit @ rand.T).max(axis=1).mean()
    q_train = (unit @ trained.T).max(axis=1).mean()
    assert q_train > q_rand


def test_kmeans_iterations_are_deterministic(spark, emb):
    df, _ = emb
    dim = len(df.select("embedding").first()[0])
    a = SIM.kmeans_centroids(df, dim, n_centroids=16, n_iter=2)
    b = SIM.kmeans_centroids(df, dim, n_centroids=16, n_iter=2)
    np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------------------
# scalar quantization
# ---------------------------------------------------------------------------


def _numpy_quantize(mat, bits=8):
    levels = (1 << bits) - 1
    mn = mat.min(axis=1)
    mx = mat.max(axis=1)
    rng = mx - mn
    codes = np.zeros(mat.shape, dtype=np.int64)
    nz = rng > 0
    codes[nz] = np.clip(
        np.floor((mat[nz] - mn[nz, None]) * levels / rng[nz, None]),
        0, levels).astype(np.int64)
    return mn, mx, codes


def test_quantize_matches_numpy_oracle(spark):
    rng = np.random.default_rng(11)
    mat = rng.standard_normal((50, 16)).astype(np.float32)
    mat[7] = 0.25  # constant vector
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(50)],
        "vec_id int, embedding array<float>")
    got = {r["vec_id"]: (r["qmin"], r["qmax"], list(r["codes"]))
           for r in SIM.quantize_embeddings(df).collect()}
    mn, mx, codes = _numpy_quantize(mat.astype(np.float64))
    for i in range(50):
        g_mn, g_mx, g_codes = got[i]
        assert g_mn == pytest.approx(float(mn[i]), abs=0)
        assert g_mx == pytest.approx(float(mx[i]), abs=0)
        assert g_codes == codes[i].tolist(), i
    assert got[7][2] == [0] * 16  # constant vector -> zero codes


def test_quantized_reconstruction_error_bound(spark):
    rng = np.random.default_rng(3)
    mat = rng.standard_normal((30, 24)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(30)],
        "vec_id int, embedding array<float>")
    q = SIM.quantize_embeddings(df)
    rec = q.select(
        "vec_id",
        SIM.dequantize_expr(F.col("codes"), F.col("qmin"),
                            F.col("qmax")).alias("rec"),
    ).collect()
    for r in rec:
        i = r["vec_id"]
        err = np.abs(np.array(r["rec"]) - mat[i].astype(np.float64))
        bound = (mat[i].max() - mat[i].min()) / 255 + 1e-12
        assert err.max() <= bound, i


def test_quantized_topk_tracks_exact(spark):
    rng = np.random.default_rng(7)
    mat = rng.standard_normal((300, 32)).astype(np.float32)
    query = rng.standard_normal(32).tolist()
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(300)],
        "vec_id int, embedding array<float>")
    exact = [r["vec_id"]
             for r in SIM.cosine_topk_bruteforce(df, query, k=10).collect()]
    quant = SIM.quantize_embeddings(df)
    approx = [r["vec_id"]
              for r in SIM.cosine_topk_quantized(quant, query, k=10).collect()]
    # 8-bit SQ keeps ranking almost intact: recall@10 >= 0.8 on gaussians
    assert len(set(exact) & set(approx)) >= 8
    assert approx[0] == exact[0]  # the top hit survives quantization


def _oracle_semdedup_portable(vecs, n_centroids=8, t_pct=40, scale=100):
    """Independent integer reimplementation of semdedup_portable."""
    q = {i: [int(round(float(x) * scale)) for x in v] for i, v in vecs.items()}
    cents = {i: q[i] for i in q if i < n_centroids}
    cell = {}
    for i, qi in q.items():
        best = min(
            (sum((a - b) * (a - b) for a, b in zip(qi, cv)), cid)
            for cid, cv in cents.items()
        )
        cell[i] = best[1]
    n2 = {i: sum(x * x for x in qi) for i, qi in q.items()}
    dup = set()
    ids = sorted(q)
    for bi in ids:
        for ai in ids:
            if ai >= bi or cell[ai] != cell[bi]:
                continue
            dp = sum(x * y for x, y in zip(q[ai], q[bi]))
            if dp > 0 and dp * dp * 10_000 >= t_pct * t_pct * n2[ai] * n2[bi]:
                dup.add(bi)
                break
    return {i: (cell[i], i in dup) for i in ids}


def test_semdedup_portable_matches_integer_oracle(spark, emb):
    df, vecs = emb
    got = {
        r["vec_id"]: (r["cell"], r["is_dup"])
        for r in SIM.semdedup_portable(df, n_centroids=8, threshold_pct=40).collect()
    }
    want = _oracle_semdedup_portable(vecs)
    assert got == want
    # the split is non-trivial on the test corpus: some dups, most kept
    n_dup = sum(1 for _, d in got.values() if d)
    assert 0 < n_dup < len(got) // 2


def test_semdedup_production_keeps_min_id_of_planted_group(spark):
    # 3 near-identical vectors (ids 10,11,12) + orthogonal-ish fillers:
    # the min-id of the planted group survives, the other two are dups.
    rng = np.random.default_rng(7)
    base = rng.normal(size=16).astype(np.float32)
    rows = []
    for i in range(10):
        v = rng.normal(size=16).astype(np.float32)
        rows.append((i, [float(x) for x in v]))
    for j, eps in ((10, 0.0), (11, 1e-3), (12, 2e-3)):
        rows.append((j, [float(x) for x in base + eps]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r["is_dup"]
           for r in SIM.semdedup(df, dim=16, n_centroids=2,
                                 threshold=0.999).collect()}
    assert out[10] is False and out[11] is True and out[12] is True
    assert len(out) == 13


def test_semdedup_hot_cluster_raises(spark):
    rows = [(i, [1.0] * 8) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="max_cluster"):
        SIM.semdedup(df, dim=8, n_centroids=2, threshold=0.99, max_cluster=5)


def test_near_dup_pairs_three_branches_identical(spark, emb):
    """r6 plan split: the numpy-kernel broadcast branch (default at
    sandbox scale), the JVM map-side branch (forced via a string id
    column), and the JVM shuffle branch (broadcast_max_ids=-1) must
    produce identical (a, b, sim) rows — same pair set, same rounded
    doubles."""
    df, _ = emb
    kw = dict(threshold=0.3, dim=64, bits=4, tables=8)
    numpy_b = SIM.embedding_near_dup_pairs(df, **kw)
    shuffle_b = SIM.embedding_near_dup_pairs(df, broadcast_max_ids=-1, **kw)
    assert numpy_b.exceptAll(shuffle_b).count() == 0
    assert shuffle_b.exceptAll(numpy_b).count() == 0
    # string ids route to the JVM map-side branch; compare pair sets
    sdf = df.withColumn("sid", F.concat(F.lit("v"), F.lpad(
        F.col("vec_id").cast("string"), 6, "0")))
    jvm_b = SIM.embedding_near_dup_pairs(
        sdf, vec_col="embedding", id_col="sid", **kw)
    got = {(r["a"], r["b"], r["sim"]) for r in jvm_b.collect()}
    want = {(f"v{r['a']:06d}", f"v{r['b']:06d}", r["sim"])
            for r in numpy_b.collect()}
    assert got == want
