"""Document deduplication for large-scale training-data pipelines.

Four families, each scale-shaped for 100 TB:

* exact           — hash-groupBy on a normalized fingerprint (one shuffle on
                    an 8-byte key; survivor = min doc_id, deterministic)
* MinHash + LSH   — shingle -> k-permutation minhash -> band buckets ->
                    bucket-join; only bucket collisions are compared, never
                    all pairs. Signatures are computed in ONE Arrow pandas
                    UDF with numpy (vectorized over the batch), everything
                    after is JVM explode + groupBy.
* SimHash         — 64-bit weighted-bit fingerprint; near-dup candidates via
                    4x16-bit band buckets (Hamming <= 3 guaranteed to share
                    at least one band by pigeonhole).
* n-gram Jaccard  — exact similarity on candidate pairs via shingle-hash
                    join; a document-frequency cap drops shingles occurring
                    in > df_cap docs (stopword-shingles are what make the
                    naive self-join quadratic at scale; dropping them only
                    loses pairs whose ENTIRE overlap is ubiquitous shingles).

All functions take/return DataFrames; doc identity column configurable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from ..functions.textops import clean_text

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one survivor (min id) per exact normalized-text group.

    Plan: fingerprint (JVM xxhash64 over cleaned/lowered text) -> min(id)
    hash aggregation. One shuffle on the 8-byte fingerprint; map-side
    partial agg keeps it cheap."""
    fp = F.xxhash64(F.lower(clean_text(F.col(text_col))))
    return (
        df.withColumn("_fp", fp)
        .groupBy("_fp")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
        .drop("_fp")
    )


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(fingerprint, survivor, n_copies) for groups with > 1 copy."""
    fp = F.xxhash64(F.lower(clean_text(F.col(text_col))))
    return (
        df.withColumn("fingerprint", fp)
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("survivor"), F.count("*").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


# ---------------------------------------------------------------------------
# shingling + MinHash kernel (numpy, Arrow-batched)
# ---------------------------------------------------------------------------

_MERSENNE31 = (1 << 31) - 1  # 31-bit prime: a*x + b fits in uint64, fully vectorized


def _hash_shingles(text: str, n: int) -> np.ndarray:
    """Distinct word n-gram shingles -> 31-bit hashes (blake2b-truncated)."""
    toks = text.lower().split()
    if len(toks) < n:
        shingles = {" ".join(toks)} if toks else set()
    else:
        shingles = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    import hashlib

    return np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")
            & _MERSENNE31
            for s in shingles
        ),
        dtype=np.uint64,
        count=len(shingles),
    )


def make_minhash_udf(num_perm: int = 64, shingle_n: int = 3, seed: int = 7):
    """Arrow pandas UDF: text -> minhash signature (array<long>, len num_perm).

    Permutations are affine maps (a*x + b) mod M31 over a 31-bit Mersenne
    prime — products stay < 2^62, so the whole (num_shingles x num_perm)
    matrix is one vectorized numpy broadcast + min per document."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE31, num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE31, num_perm, dtype=np.uint64)

    @pandas_udf(ArrayType(LongType()))
    def minhash(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            sh = _hash_shingles(t or "", shingle_n)
            if sh.size == 0:
                out.append([0] * num_perm)
                continue
            sig = ((sh[:, None] * a[None, :] + b[None, :]) % np.uint64(_MERSENNE31)).min(axis=0)
            out.append(sig.astype(np.int64).tolist())
        return pd.Series(out)

    return minhash


def minhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                       num_perm: int = 64, shingle_n: int = 3) -> DataFrame:
    mh = make_minhash_udf(num_perm, shingle_n)
    return df.select(id_col, mh(F.col(text_col)).alias("sig"))


def minhash_band_buckets(sigs: DataFrame, num_perm: int = 64, bands: int = 16,
                         id_col: str = "doc_id") -> DataFrame:
    """signature -> (band, bucket_hash) rows. rows_per_band = num_perm/bands;
    bucket_hash = xxhash64 of the band slice (JVM-side slice+hash)."""
    r = num_perm // bands
    cols = []
    for bi in range(bands):
        band = F.slice(F.col("sig"), bi * r + 1, r)
        cols.append(F.struct(F.lit(bi).alias("band"),
                             F.xxhash64(F.to_json(band)).alias("bucket")))
    return sigs.select(
        id_col, F.explode(F.array(*cols)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def minhash_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  num_perm: int = 64, bands: int = 16, shingle_n: int = 3) -> DataFrame:
    """Near-dup dedup: docs sharing ANY band bucket collapse to the bucket's
    min id; a doc survives iff it is the survivor of every bucket it belongs
    to (standard one-pass LSH dedup — single-linkage within buckets only).

    Scale shape: signatures (Arrow UDF) -> explode bands (x bands rows) ->
    groupBy bucket (shuffle on 8-byte keys) -> min-id broadcast back."""
    sigs = minhash_signatures(df, text_col, id_col, num_perm, shingle_n)
    bb = minhash_band_buckets(sigs, num_perm, bands, id_col)
    w = Window.partitionBy("band", "bucket")
    keep = (
        bb.withColumn("_min", F.min(id_col).over(w))
        .groupBy(id_col)
        .agg(F.max(F.when(F.col(id_col) != F.col("_min"), 1).otherwise(0)).alias("_dominated"))
        .filter(F.col("_dominated") == 0)
        .select(id_col)
    )
    return df.join(keep, id_col, "left_semi")


def minhash_candidate_pairs(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id", num_perm: int = 64,
                            bands: int = 16, shingle_n: int = 3) -> DataFrame:
    """Candidate near-dup pairs (a < b) with estimated jaccard = fraction of
    matching minhash positions. Pairing happens ONLY within band buckets."""
    sigs = minhash_signatures(df, text_col, id_col, num_perm, shingle_n).cache()
    bb = minhash_band_buckets(sigs, num_perm, bands, id_col)
    left = bb.alias("l")
    right = bb.alias("r")
    pairs = (
        left.join(right, ["band", "bucket"])
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b"))
        .distinct()
    )
    sa = sigs.select(F.col(id_col).alias("a"), F.col("sig").alias("_sa"))
    sb = sigs.select(F.col(id_col).alias("b"), F.col("sig").alias("_sb"))
    est = F.aggregate(
        F.zip_with("_sa", "_sb", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.size("_sa")
    return (
        pairs.join(sa, "a").join(sb, "b")
        .select("a", "b", F.round(est, 4).alias("est_jaccard"))
    )


def minhash_lsh_pairs_portable(df: DataFrame, text_col: str = "text",
                               id_col: str = "doc_id", num_perm: int = 8,
                               band_rows: int = 2, shingle_n: int = 3) -> DataFrame:
    """Candidate near-dup pairs via an engine-portable MinHash kernel:
    minhash_i(doc) = lexicographic MIN over shingles of md5(i || '|' ||
    shingle). md5-on-strings exists identically in every SQL engine, so this
    variant is verifiable end-to-end against a DuckDB oracle (the blake2b
    numpy kernel above is the throughput path; this one is the
    cross-engine-checkable specification of the same algorithm).

    GATE/ORACLE USE ONLY — do NOT run at corpus scale: the broadcast range
    cross join multiplies the exploded shingle rows by `num_perm` (a
    num_perm-fold shuffle blowup); the production kernel for real corpora
    is `minhash_dedup` (Arrow pandas_udf, one row per doc).

    Scale shape — 100% JVM/codegen, no Python:
      shingle explode (x ~n_words rows) -> x num_perm via broadcast range
      cross join -> groupBy (doc, perm) min (map-side partial agg) ->
      band key concat -> self-equi-join on (band, key).
    The band self-join shuffles on the 32-byte key; giant buckets (boiler-
    plate-identical docs) are the skew risk, same as minhash_dedup — AQE
    skew-join splits them."""
    words = F.filter(
        F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " "),
        lambda w: w != "",
    )
    # i = 0 .. max(n_words - shingle_n, 0); shingle = words[i : i+shingle_n]
    # (docs shorter than shingle_n yield their full word join — same rule as
    # the DuckDB oracle's array slice)
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(words) - shingle_n, F.lit(0))),
            lambda i: F.array_join(F.slice(words, i + 1, shingle_n), " "),
        )
    )
    sh = df.select(F.col(id_col).alias("doc_id"), F.explode(shingles).alias("g"))
    perms = df.sparkSession.range(num_perm).select(F.col("id").alias("perm"))
    sigs = (
        sh.crossJoin(F.broadcast(perms))
        .groupBy("doc_id", "perm")
        .agg(F.min(F.md5(F.concat(F.col("perm").cast("string"),
                                  F.lit("|"), F.col("g")))).alias("mh"))
    )
    bands = (
        sigs.withColumn("band", F.expr(f"perm div {band_rows}"))
        .groupBy("doc_id", "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("perm", "mh"))),
                    lambda s: s["mh"],
                ),
                "",
            ).alias("key")
        )
    )
    x = bands.select("band", "key", F.col("doc_id").alias("a"))
    y = bands.select("band", "key", F.col("doc_id").alias("b"))
    return (
        x.join(y, ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def make_simhash_udf(seed: int = 11):
    """Arrow pandas UDF: text -> 64-bit simhash (long). Token hashes are
    blake2b-64; each token votes its bits +1/-1; sign of the sum per bit."""
    import hashlib

    @pandas_udf(LongType())
    def simhash(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = (t or "").lower().split()
            if not toks:
                out.append(0)
                continue
            hs = np.fromiter(
                (
                    int.from_bytes(
                        hashlib.blake2b(w.encode(), digest_size=8).digest(), "big"
                    )
                    for w in toks
                ),
                dtype=np.uint64,
                count=len(toks),
            )
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int32)
            votes = (2 * bits - 1).sum(axis=0)
            v = 0
            for i in range(64):
                if votes[i] > 0:
                    v |= 1 << i
            out.append(v - (1 << 64) if v >= (1 << 63) else v)
        return pd.Series(out)

    return simhash


def simhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    sh = make_simhash_udf()
    return df.select(id_col, sh(F.col(text_col)).alias("simhash"))


def simhash_candidate_pairs(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming. Banding: split
    the 64-bit hash into 4x16-bit chunks; by pigeonhole any pair within
    Hamming 3 shares at least one exact chunk -> only chunk-bucket joins,
    then exact Hamming verification via bit_count (JVM)."""
    sigs = simhash_signatures(df, text_col, id_col)
    chunks = sigs.select(
        id_col, "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("chunk"),
                     F.shiftrightunsigned("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF))
                     .alias("val"))
            for i in range(4)
        ])).alias("c"),
    ).select(id_col, "simhash", "c.chunk", "c.val")
    left = chunks.alias("l")
    right = chunks.alias("r")
    ham = F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash")))
    return (
        left.join(right, ["chunk", "val"])
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(
            F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_pairs_portable(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", bits: int = 16,
                           n_chunks: int = 4, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs via an engine-portable SimHash kernel — the
    ORACLE-CHECKED specification of the SimHash path (the blake2b Arrow
    kernel above is the throughput twin; same pattern as
    minhash_lsh_pairs_portable).

    GATE/ORACLE USE ONLY — do NOT run at corpus scale: the broadcast range
    cross join multiplies the exploded token rows by `bits` (a bits-fold
    shuffle blowup); the production kernel for real corpora is
    `simhash_dedup` (Arrow pandas_udf, one row per doc).

    Portable bit definition (md5-on-strings exists identically in every SQL
    engine): bit_i(token) = ascii(first hex char of md5(i || '|' || token))
    mod 2; each token occurrence votes +1/-1 per bit; signature bit i is set
    iff the vote sum is positive; empty docs hash to 0. Candidates share at
    least one of `n_chunks` equal bit-chunks (pigeonhole covers Hamming <=
    n_chunks - 1), then exact Hamming verification.

    Scale shape — 100% JVM/codegen, no Python: token explode (x n_words) ->
    x `bits` via broadcast range cross join -> two hash aggs with map-side
    partial agg (doc,bit then doc) -> chunk explode (x n_chunks) ->
    self-equi-join on (chunk, val). Skew risk is boilerplate-heavy chunk
    buckets, same as the blake2b path — AQE skew-join splits them."""
    chunk_width = bits // n_chunks
    words = F.filter(
        F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " "),
        lambda w: w != "",
    )
    tok = df.select(F.col(id_col).alias("doc_id"), F.explode(words).alias("w"))
    bit_rng = df.sparkSession.range(bits).select(F.col("id").alias("bit"))
    votes = (
        tok.crossJoin(F.broadcast(bit_rng))
        .withColumn(
            "b",
            F.ascii(
                F.substring(
                    F.md5(F.concat(F.col("bit").cast("string"), F.lit("|"), F.col("w"))),
                    1, 1,
                )
            ) % 2,
        )
        .groupBy("doc_id", "bit")
        .agg(F.sum(F.col("b") * 2 - 1).alias("v"))
    )
    sigs = votes.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("v") > 0, F.expr("shiftleft(cast(1 as bigint), cast(bit as int))"))
            .otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )
    # docs with zero tokens produce no vote rows -> signature 0
    all_ids = df.select(F.col(id_col).alias("doc_id")).distinct()
    sigs = all_ids.join(sigs, "doc_id", "left").select(
        "doc_id", F.coalesce("simhash", F.lit(0).cast("long")).alias("simhash")
    )
    mask = (1 << chunk_width) - 1
    chunks = sigs.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftrightunsigned("simhash", chunk_width * c)
                .bitwiseAND(F.lit(mask)).alias("val"),
            )
            for c in range(n_chunks)
        ])).alias("c"),
    ).select("doc_id", "simhash", "c.chunk", "c.val")
    left = chunks.alias("l")
    right = chunks.alias("r")
    ham = F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))).cast("long")
    return (
        left.join(right, ["chunk", "val"])
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"),
                ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------------------
# connected components (dedup clusters over near-dup pairs)
# ---------------------------------------------------------------------------


def _union_find_labels(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Driver-side union-find with path compression; label = component min."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN root so the representative is the component min
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {n: find(n) for n in parent}


def connected_components(edges: DataFrame, a_col: str = "a", b_col: str = "b",
                         max_iter: int = 25,
                         on_nonconverged: str = "escalate",
                         driver_threshold: int = 200_000) -> DataFrame:
    """(node, component) labels over an undirected edge list; component =
    MIN node id reachable (deterministic canonical representative).

    A training-data dedup pipeline needs CLUSTERS, not pairs: near-dup pairs
    from MinHash/SimHash/embedding LSH are single-linkage edges, and the
    survivor set is one doc per connected component. This is the step that
    turns candidate pairs into a delete list.

    Algorithm: iterative min-label propagation — label(v) starts at v; each
    round label(v) = min(label(v), min label over neighbors); stop when no
    label changed (converges in <= diameter rounds; near-dup components are
    shallow in practice, so 3-5 rounds is typical). Each round is ONE join
    (edges x labels, shuffle on node id) + ONE min agg — both map-side
    combinable, all JVM. Branch points are persisted and released per round.

    Non-convergence is NEVER silent: a component with diameter > max_iter
    would otherwise be split into several clusters and duplicate documents
    would survive dedup undetected at scale. `on_nonconverged` picks the
    policy: 'escalate' (default) re-solves with the O(log n)
    large-star/small-star variant below; 'raise' fails loudly.

    ADAPTIVE small-graph path (same spirit as the frontier's adaptive
    bloom and Spark's own broadcast-join adaptivity): an edge list at or
    below `driver_threshold` rows is collected and solved by union-find on
    the driver — identical labels, none of the per-iteration job latency
    that dominates tiny graphs (each distributed round costs a
    localCheckpoint + count round-trip regardless of data volume). Above
    the threshold the iterative join loop runs as before; pass
    driver_threshold=0 to force it."""
    if on_nonconverged not in ("escalate", "raise"):
        raise ValueError(f"on_nonconverged: {on_nonconverged!r}")
    spark = edges.sparkSession
    pairs_df = edges.select(
        F.col(a_col).cast("long").alias("a"),
        F.col(b_col).cast("long").alias("b"),
    ).filter(F.col("a").isNotNull() & F.col("b").isNotNull())
    if driver_threshold:
        # limit(threshold+1) bounds the driver transfer even when the edge
        # list is huge: we only learn "above threshold", never fetch it
        head = pairs_df.limit(driver_threshold + 1).collect()
        if len(head) <= driver_threshold:
            labels = _union_find_labels([(r["a"], r["b"]) for r in head])
            return spark.createDataFrame(
                sorted(labels.items()), "node long, comp long"
            )
    # build from pairs_df (NOT raw edges) so the distributed path applies
    # the identical long-cast + null-endpoint filter as the driver path —
    # output rows/schema must not depend on which side of driver_threshold
    # the edge count lands
    sym = pairs_df.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        pairs_df.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    nodes = sym.select(F.col("src").alias("node")).distinct()
    # localCheckpoint (not persist): iterative joins otherwise grow the
    # logical plan by one join PER ROUND — planning cost explodes and deep
    # trees overflow; checkpointing truncates lineage to the materialized
    # blocks each round (the standard Spark iterative-algorithm shape).
    labels = nodes.withColumn("comp", F.col("node")).localCheckpoint(eager=True)
    sym = sym.persist()
    changed = 0
    try:
        for _ in range(max_iter):
            nbr = (
                sym.join(labels, sym["src"] == labels["node"])
                .groupBy("dst").agg(F.min("comp").alias("nbr_comp"))
            )
            new = (
                labels.join(nbr, labels["node"] == nbr["dst"], "left")
                .select(
                    "node",
                    F.least(F.col("comp"), F.coalesce("nbr_comp", "comp")).alias("comp"),
                    (F.coalesce("nbr_comp", "comp") < F.col("comp")).alias("_chg"),
                )
                .localCheckpoint(eager=True)
            )
            changed = new.filter("_chg").count()
            labels = new.drop("_chg")
            if changed == 0:
                break
    finally:
        sym.unpersist()
    if changed != 0:
        if on_nonconverged == "raise":
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} rounds "
                f"({changed} labels still changing): a component has diameter "
                f"> max_iter — raise max_iter or use the large-star/small-star "
                f"variant (connected_components_star)"
            )
        return connected_components_star(pairs_df, "a", "b")
    return labels


def connected_components_star(edges: DataFrame, a_col: str = "a",
                              b_col: str = "b", max_iter: int = 64) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14): converges in
    O(log n) rounds regardless of component DIAMETER, where min-label
    propagation needs diameter rounds — the escalation path for
    adversarially chained near-dup graphs (e.g. doc_i ~ doc_{i+1} template
    chains thousands long).

    Per round, two alternating contractions over the edge set:
    * LARGE-STAR at u: every strictly-larger neighbor v > u re-attaches to
      m = min(N(u) ∪ {u});
    * SMALL-STAR at u (edges pre-oriented big->small, so N(u) are all
      smaller): every neighbor AND u itself re-attach to m = min(N(u) ∪ {u}).
    The fixed point is a forest of stars rooted at each component's min
    node, so labels read off directly. Each phase is one groupBy-min + one
    join on node id — all JVM, shuffle keys are 8-byte node ids.
    Convergence test: (count, xxhash64-sum) signature of the canonical
    (big, small) edge set is unchanged by a full round (the paper's
    potential argument rules out oscillation, so signature equality means
    fixed point)."""
    e = (
        edges.select(F.col(a_col).cast("long").alias("x"),
                     F.col(b_col).cast("long").alias("y"))
        .filter(F.col("x").isNotNull() & F.col("y").isNotNull()
                & (F.col("x") != F.col("y")))
        .select(F.greatest("x", "y").alias("u"), F.least("x", "y").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def signature(df: DataFrame) -> tuple:
        # decimal sum: a long sum of 64-bit hashes overflows under ANSI mode
        row = df.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], None if row["h"] is None else int(row["h"]))

    sig = signature(e)
    converged = False
    for _ in range(max_iter):
        # large-star over the symmetric view: emit (v, m) for v > u
        sym = e.select("u", "v").unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.min("v").alias("_mn"))
        m = F.least(F.col("_mn"), F.col("u"))
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), m.alias("v"))  # v > u >= m: canonical
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: input already (big, small); m = min neighbor (< u)
        mins2 = large.groupBy("u").agg(F.min("v").alias("_mn"))
        e = (
            large.join(mins2, "u")
            .select(F.col("v").alias("x"), F.col("_mn").alias("y"))
            .unionByName(mins2.select(F.col("u").alias("x"),
                                      F.col("_mn").alias("y")))
            .filter(F.col("x") != F.col("y"))
            .select(F.greatest("x", "y").alias("u"), F.least("x", "y").alias("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        new_sig = signature(e)
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not reach a fixed point in "
            f"{max_iter} rounds — O(log n) convergence means this input is "
            f"beyond any realistic component count; raise max_iter"
        )
    # fixed point = stars rooted at component minima: every edge is
    # (member, root). Roots label themselves; isolated nodes never appear
    # in `edges` and are the caller's coalesce case (dedup_clusters).
    labels = (
        e.select(F.col("u").alias("node"), F.col("v").alias("comp"))
        .unionByName(e.select(F.col("v").alias("node"), F.col("v").alias("comp")))
        .groupBy("node").agg(F.min("comp").alias("comp"))
    )
    # nodes only ever seen as the larger endpoint of an original edge still
    # need a row; the unionByName above covers both endpoints of the FINAL
    # edge set, which spans every non-isolated node of the input graph
    return labels


def dedup_clusters(df: DataFrame, edges: DataFrame, id_col: str = "doc_id",
                   a_col: str = "a", b_col: str = "b") -> DataFrame:
    """(doc_id, cluster) for EVERY doc in df: cluster = min doc id of the
    doc's near-dup connected component (itself if isolated). `edges` is any
    candidate-pair DataFrame (minhash/simhash/ngram/embedding pairs)."""
    comp = connected_components(edges, a_col, b_col)
    return (
        df.select(F.col(id_col).alias("doc_id")).distinct()
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select("doc_id", F.coalesce("comp", F.col("doc_id")).alias("cluster"))
    )


# ---------------------------------------------------------------------------
# benchmark decontamination (n-gram overlap vs an eval set)
# ---------------------------------------------------------------------------


def mark_contaminated(docs: DataFrame, eval_docs: DataFrame, n: int = 5,
                      text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_overlap, contaminated) — training docs sharing >= 1 word
    n-gram with ANY eval-set document (the standard benchmark-decontamination
    gate for LLM training data; 13-grams at real scale, n configurable).

    Plan: eval set -> DISTINCT n-gram md5 keys (small: |eval| docs x words,
    deduped) -> BROADCAST semi-side; training docs explode their distinct
    n-grams and join against the broadcast set, count matches per doc, left
    join back so clean docs keep n_overlap = 0. The training table is only
    ever touched by a map-side broadcast join — no shuffle of the corpus.
    md5 keys (not raw strings) keep the broadcast rows 32 bytes and make the
    kernel portable across engines."""
    def grams(col: F.Column) -> F.Column:
        toks = F.filter(
            F.split(F.trim(F.regexp_replace(F.lower(col), r"\s+", " ")), " "),
            lambda w: w != "",
        )
        idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
        full = F.array_distinct(
            F.transform(idx, lambda i: F.md5(F.array_join(F.slice(toks, i + 1, n), " ")))
        )
        # docs shorter than n words have NO full n-gram — emit nothing
        # (without the guard, sequence(0, 0) yields one partial < n-word
        # gram, and two short docs sharing it would be flagged as
        # contaminated despite sharing no full n-gram). Applied to both
        # the eval and training sides; the DuckDB oracle mirrors it.
        return F.when(F.size(toks) >= n, full).otherwise(
            F.array().cast("array<string>")
        )

    eval_grams = (
        eval_docs.select(F.explode(grams(F.col(text_col))).alias("g")).distinct()
    )
    doc_grams = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(grams(F.col(text_col))).alias("g")
    )
    hits = (
        doc_grams.join(F.broadcast(eval_grams), "g")
        .groupBy("doc_id").agg(F.count("*").alias("n_overlap"))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id")).distinct()
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_overlap", F.lit(0).cast("long")).alias("n_overlap"),
        )
        .withColumn("contaminated", F.col("n_overlap") > 0)
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (shingle join)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                        n: int = 3, threshold: float = 0.5,
                        df_cap: int | None = 1000) -> DataFrame:
    """Exact Jaccard over word n-gram sets for pairs sharing >= 1 shingle.

    Plan (df_cap set — the scale path): doc -> distinct shingle hashes
    (JVM transform+xxhash64) -> explode -> ONE groupBy(shingle)
    collecting the member list -> drop shingles with more than df_cap
    members (the quadratic-blowup stopword shingles; at 100 TB this cap
    is what keeps pair volume linear-ish) -> pairs exploded per shingle
    group (distinct by construction within a group; <= df_cap^2/2 per
    shingle) -> groupBy pair count(intersection) -> jaccard = inter /
    (|A| + |B| - inter). One evaluation of the shingling and one
    corpus-sized exchange, where the r5 self-join plan evaluated the
    shingling three times (df filter + both join sides) and shuffled it
    twice more. df_cap=None keeps the plain self-join (a member-list
    collect without the cap would be unbounded per group)."""
    toks = F.split(F.lower(clean_text(F.col(text_col))), " ")
    n_sh = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), n_sh - 1),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, n))),
        )
    )
    docs = df.select(F.col(id_col).alias("id"), shingles.alias("sh")).withColumn(
        "set_size", F.size("sh")
    )
    exploded = docs.select("id", "set_size", F.explode("sh").alias("shingle"))
    if df_cap is not None:
        grouped = (
            exploded.groupBy("shingle")
            .agg(F.collect_list(
                F.struct(F.col("id"), F.col("set_size").alias("ss"))
            ).alias("_ms"))
            .filter((F.size("_ms") >= 2) & (F.size("_ms") <= df_cap))
        )
        prs = grouped.select(F.explode(F.flatten(F.transform(
            F.col("_ms"),
            lambda x: F.transform(
                F.filter(F.col("_ms"), lambda y: x["id"] < y["id"]),
                lambda y: F.struct(x["id"].alias("a"), y["id"].alias("b"),
                                   x["ss"].alias("_na"),
                                   y["ss"].alias("_nb")),
            ),
        ))).alias("_p"))
        inter = (
            prs.groupBy("_p.a", "_p.b", "_p._na", "_p._nb")
            .agg(F.count(F.lit(1)).alias("_inter"))
        )
    else:
        a = exploded.select(F.col("id").alias("a"),
                            F.col("set_size").alias("_na"), "shingle")
        b = exploded.select(F.col("id").alias("b"),
                            F.col("set_size").alias("_nb"), "shingle")
        inter = (
            a.join(b, "shingle")
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b", "_na", "_nb")
            .agg(F.count("*").alias("_inter"))
        )
    jac = F.col("_inter") / (F.col("_na") + F.col("_nb") - F.col("_inter"))
    return (
        inter.withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def shingle_containment_pairs(df: DataFrame, text_col: str = "text",
                              id_col: str = "doc_id", n: int = 3,
                              min_pct: int = 80,
                              df_cap: int | None = 1000) -> DataFrame:
    """ASYMMETRIC containment over word n-gram sets: C(A⊂B) =
    |S(A)∩S(B)| / |S(A)| — the quote/subset detector symmetric Jaccard
    is blind to. A 100-word article embedded verbatim in a 10,000-word
    aggregator page has Jaccard ≈ 0.01 (never crosses any near-dup
    threshold) but containment 1.0; training-data pipelines drop or
    down-weight the contained copy, and a crawler demotes hosts that
    mostly republish (cf. the mirror detector in operators/sketches.py,
    which works at host granularity; this is the document-level tool).

    Output: one row per ORDERED pair (inner_id, outer_id) with
    containment_pct = (100 * |∩|) div |S(inner)| >= min_pct, inner !=
    outer — integer-exact so the DuckDB oracle gates it bit-for-bit.
    Both directions can appear (two near-identical docs contain each
    other).

    Plan shape (same scale story as `ngram_jaccard_pairs`): distinct
    shingle hashes per doc (JVM transform + xxhash64, no Python) →
    explode → drop shingles with doc-frequency > df_cap (the quadratic
    control: boilerplate shingles are containment noise anyway) →
    self-join on shingle → groupBy ordered pair. The pair count, not
    the corpus, bounds the reduce side."""
    toks = F.split(F.lower(clean_text(F.col(text_col))), " ")
    n_sh = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), n_sh - 1),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, n))),
        )
    )
    docs = df.select(F.col(id_col).alias("id"), shingles.alias("sh")).withColumn(
        "set_size", F.size("sh")
    )
    exploded = docs.select("id", "set_size", F.explode("sh").alias("shingle"))
    if df_cap is not None:
        # single-pass pair generation (see ngram_jaccard_pairs): one
        # groupBy(shingle) member-list collect replaces the df filter +
        # self-join's three evaluations of the shingling; ordered pairs
        # (both directions) explode per capped group
        grouped = (
            exploded.groupBy("shingle")
            .agg(F.collect_list(
                F.struct(F.col("id"), F.col("set_size").alias("ss"))
            ).alias("_ms"))
            .filter((F.size("_ms") >= 2) & (F.size("_ms") <= df_cap))
        )
        prs = grouped.select(F.explode(F.flatten(F.transform(
            F.col("_ms"),
            lambda x: F.transform(
                F.filter(F.col("_ms"), lambda y: x["id"] != y["id"]),
                lambda y: F.struct(x["id"].alias("inner_id"),
                                   y["id"].alias("outer_id"),
                                   x["ss"].alias("_ni")),
            ),
        ))).alias("_p"))
        paired = (
            prs.groupBy("_p.inner_id", "_p.outer_id", "_p._ni")
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
    else:
        a = exploded.select(F.col("id").alias("inner_id"),
                            F.col("set_size").alias("_ni"), "shingle")
        b = exploded.select(F.col("id").alias("outer_id"), "shingle")
        paired = (
            a.join(b, "shingle")
            .filter(F.col("inner_id") != F.col("outer_id"))
            .groupBy("inner_id", "outer_id", "_ni")
            .agg(F.count("*").alias("n_common"))
        )
    return (
        paired
        .select(
            "inner_id", "outer_id",
            F.col("n_common").cast("long").alias("n_common"),
            F.col("_ni").cast("long").alias("inner_size"),
            F.expr("(100 * n_common) div _ni").cast("long")
            .alias("containment_pct"),
        )
        .filter(F.col("containment_pct") >= min_pct)
    )


def line_dedup_corpus(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", min_chars: int = 10
                      ) -> DataFrame:
    """C4-style cross-document line deduplication (Raffel et al. 2020
    §2.2 applies it to three-sentence spans; line granularity is the
    common production variant): every distinct line of >= `min_chars`
    trimmed characters is kept only at its FIRST corpus occurrence
    (lowest (doc_id, line_no)); all later occurrences are dropped and
    the documents are reassembled without them. Shorter lines never
    participate (they are formatting, not boilerplate evidence).

    Returns (doc_id, text_deduped, n_lines, n_lines_kept).

    Scale shape (100 TB): three shuffles, no windows over hot keys —
      1. groupBy(line_hash) min((doc_id, pos)) over ELIGIBLE lines only;
         map-side partial agg collapses boilerplate skew (the whole
         point: hot lines are exactly the duplicated ones) before the
         exchange, so the hot-key fan-in is one partial row per map task;
      2. a shuffle join of lines against the firsts table — non-eligible
         lines get a per-row synthetic key (never a single null/constant
         hot key) and survive via the keep-flag, not the match;
      3. groupBy(doc_id) reassembly (collect_list is bounded by document
         size, which is bounded by the ingest contract).
    The window-free shape matters: PARTITION BY line puts every copy of
    a viral boilerplate line in one task; the aggregation form does not.
    """
    lines = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_line"),
    )
    elig = F.length(F.trim(F.col("_line"))) >= min_chars
    lines = lines.withColumn("_elig", elig).withColumn(
        "_h",
        F.when(elig, F.xxhash64("_line"))
        # synthetic per-row key: joins even, can only false-match a real
        # line hash on a 64-bit collision, and the keep rule ignores the
        # match for non-eligible rows anyway
        .otherwise(F.xxhash64("_id", "_pos", F.lit("short"))),
    )
    firsts = (
        lines.filter("_elig")
        .groupBy("_h")
        .agg(F.min(F.struct(F.col("_id").alias("d"),
                            F.col("_pos").alias("p"))).alias("_first"))
    )
    flagged = lines.join(firsts, "_h", "left").withColumn(
        "_keep",
        ~F.col("_elig")
        | ((F.col("_id") == F.col("_first.d"))
           & (F.col("_pos") == F.col("_first.p"))),
    )
    agg = flagged.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.count(F.when(F.col("_keep"), 1)).alias("n_lines_kept"),
        F.array_sort(
            F.collect_list(
                F.when(F.col("_keep"),
                       F.struct(F.col("_pos").alias("pos"),
                                F.col("_line").alias("line"))))
        ).alias("_a"),
    )
    return agg.select(
        F.col("_id").alias(id_col),
        F.concat_ws("\n", F.expr("transform(_a, x -> x.line)"))
        .alias("text_deduped"),
        "n_lines",
        "n_lines_kept",
    )


# ---------------------------------------------------------------------------
# winnowing passage fingerprints (Schleimer, Wilkerson & Aiken 2003)
# ---------------------------------------------------------------------------

def winnow_fingerprints(df: DataFrame, k: int = 8, window: int = 4,
                        text_col: str = "text", id_col: str = "doc_id"
                        ) -> DataFrame:
    """Winnowing (SIGMOD 2003): per document, hash every k-token gram and
    keep, from each sliding window of `window` consecutive gram hashes,
    the RIGHTMOST minimum — the classic local-fingerprinting scheme with
    the guarantee that any shared passage of >= k + window - 1 tokens
    yields at least one IDENTICAL selected fingerprint in both documents
    (robust-winnowing tie rule). This is the passage-level complement to
    the document-level MinHash/SimHash kernels: it localizes WHICH part
    of a document is duplicated, not just that some of it is.

    Everything runs as one JVM higher-order-function expression per row
    (no UDF, no shuffle): tokenize -> gram -> md5-24bit hash (the same
    engine-portable digit arithmetic as the sampling/minhash twins) ->
    windowed rightmost-argmin via array_position on the reversed slice.
    Documents shorter than one full window still emit their global-min
    fingerprint (every non-empty doc is represented). Expression cost is
    O(tokens * window) per row; output density ~ 2/(window+1) of grams.

    Returns exploded rows (doc_id, pos, fp): pos = 1-based gram index of
    the selected fingerprint, fp in [0, 2^24). The only downstream
    shuffle consumers need is groupBy(fp) — bucketable, and hot fps ARE
    the duplicated passages, collapsed map-side by partial aggregation.
    """
    from .sampling import md5_uniform_p24

    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda t: t != "")
    m = F.size(toks) - k + 1  # gram count
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(m, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    hashes = F.transform(grams, lambda g: md5_uniform_p24(g, salt="wf"))
    m_c = F.greatest(m, F.lit(1))  # clamped gram count == size(hashes)
    n_win = F.greatest(m - window + 1, F.lit(1))
    sels = F.transform(
        F.sequence(F.lit(1), n_win),
        lambda j: F.struct(
            (j + F.least(F.lit(window), m_c) - F.array_position(
                F.reverse(F.slice(hashes, j, window)),
                F.array_min(F.slice(hashes, j, window)))).alias("pos"),
            F.array_min(F.slice(hashes, j, window)).alias("fp"),
        ),
    )
    return (
        df.select(F.col(id_col).alias("doc_id"),
                  F.when(F.size(toks) > 0, F.array_distinct(sels))
                  .otherwise(F.array().cast(
                      "array<struct<pos:long,fp:long>>")).alias("_s"))
        .select("doc_id", F.explode("_s").alias("s"))
        .select("doc_id", F.col("s.pos").alias("pos"),
                F.col("s.fp").alias("fp"))
    )


def duplicate_passages(df: DataFrame, k: int = 8, window: int = 4,
                       min_docs: int = 2, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Per-document duplicated-passage coverage from winnowing
    fingerprints: a fingerprint is `shared` when >= min_docs distinct
    documents selected it; each document reports how much of its
    fingerprint set is shared (integer basis points — the float-free
    gate discipline). High share_bp = document is mostly boilerplate /
    mirrored passages even if no OTHER whole-document kernel fires.

    Shape: fingerprint rows -> groupBy(fp) distinct-doc count (map-side
    partials; hot fps are exactly the duplicates) -> broadcast-or-
    shuffle semi back -> groupBy(doc_id). Returns
    (doc_id, n_fp, n_shared, share_bp)."""
    fps = winnow_fingerprints(df, k=k, window=window,
                              text_col=text_col, id_col=id_col
                              ).select("doc_id", "fp").distinct()
    shared = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("_nd"))  # fps already doc-distinct
        .filter(F.col("_nd") >= min_docs)
        .select("fp", F.lit(True).alias("_shared"))
    )
    marked = fps.join(shared, "fp", "left")
    return (
        marked.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_fp"),
             F.sum(F.when(F.col("_shared"), 1).otherwise(0)).alias("n_shared"))
        .select("doc_id", "n_fp", "n_shared",
                F.expr("(10000 * n_shared) div n_fp").alias("share_bp"))
    )


def cluster_survivors(clusters: DataFrame, quality: DataFrame,
                      id_col: str = "doc_id",
                      comp_col: str = "component",
                      score_col: str = "score") -> DataFrame:
    """Quality-aware canonical selection over dedup clusters: given the
    connected-components labeling (`connected_components` output:
    id -> component) and any per-doc quality signal, pick ONE survivor
    per cluster — the highest-quality member, ties broken by smallest id
    (fully deterministic) — and map every member to it.

    This is the step after near-dup clustering in a training-data
    pipeline: naive min-id survivor selection keeps whichever copy
    happened to hash first; quality-aware selection keeps the best copy
    (longest / cleanest / highest Gopher score) of each duplicate family.

    Scale shape: one sort-merge join clusters⋈quality on the id, the
    skew-safe two-phase salted top-k (frontier.top_k_per_group — giant
    clusters cannot pin a task), then one co-partitioned join back on
    the component to emit the full member -> survivor mapping. Docs
    missing from `quality` rank lowest (null sorts last on desc).

    Returns (id, component, survivor_id, is_survivor)."""
    from .frontier import top_k_per_group

    c = clusters.select(F.col(id_col).alias("_id"),
                        F.col(comp_col).alias("_comp"))
    q = quality.select(F.col(id_col).alias("_id"),
                       F.col(score_col).alias("_score"))
    members = c.join(q, "_id", "left")
    best = top_k_per_group(
        members, ["_comp"],
        [F.col("_score").desc_nulls_last(), F.col("_id").asc()], k=1,
    ).select("_comp", F.col("_id").alias("survivor_id"))
    return (
        members.join(best, "_comp")
        .select(
            F.col("_id").alias(id_col),
            F.col("_comp").alias(comp_col),
            "survivor_id",
            (F.col("_id") == F.col("survivor_id")).alias("is_survivor"),
        )
    )


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC) dedup for binary payloads
# ---------------------------------------------------------------------------

# Gear table: 256 fixed 64-bit constants derived from blake2b — the
# rolling-hash alphabet (public technique: LBFS (Muthitacharoen et al.,
# SOSP 2001) content-defined chunking with the Gear hash of FastCDC
# (Xia et al., USENIX ATC 2016)).
_GEAR = None


def _gear_table():
    global _GEAR
    if _GEAR is None:
        import hashlib

        _GEAR = np.array(
            [int.from_bytes(hashlib.blake2b(bytes([i]), digest_size=8).digest(),
                            "big") for i in range(256)],
            dtype=np.uint64)
    return _GEAR


def _gear_hashes(buf: np.ndarray) -> np.ndarray:
    """Rolling Gear hash at every position, vectorized.

    The scalar recurrence h_i = (h_{i-1} << 1) + G[b_i] (mod 2^64) expands
    to h_i = sum_{k=0..63} G[b_{i-k}] << k (mod 2^64) — contributions
    older than 64 bytes shift out. That windowed sum is 64 shifted
    vector adds over the gear-mapped buffer (wrapping uint64 arithmetic),
    ~100x the throughput of the byte loop; tools/gen_golden.py gates this
    kernel against the scalar recurrence independently."""
    n = len(buf)
    g = _gear_table()[buf]
    h = np.zeros(n, dtype=np.uint64)
    for k in range(min(64, n)):
        h[k:] += g[:n - k] << np.uint64(k)
    return h


def cdc_chunks_bytes(payload: bytes, min_size: int = 64, avg_bits: int = 8,
                     max_size: int = 1024) -> list[tuple[int, int, int]]:
    """Content-defined chunk boundaries for one payload:
    [(offset, length, fp)] with fp = signed-64 blake2b of the chunk bytes.

    A position ends a chunk when its rolling Gear hash has `avg_bits` low
    zero bits (expected chunk size 2^avg_bits), subject to min/max bounds
    (greedy: first qualifying candidate >= min; forced cut at max).
    Boundaries are pure functions of a 64-byte content window — NOT of
    previous cut positions — so two payloads sharing a region chunk it
    identically regardless of offset shifts (the whole point: an edited
    or re-hosted file still dedups on its unchanged regions, where
    whole-file hashing sees a brand-new blob)."""
    n = len(payload)
    if n == 0:
        return []
    import hashlib

    buf = np.frombuffer(payload, dtype=np.uint8)
    mask = np.uint64((1 << avg_bits) - 1)
    cand = np.flatnonzero((_gear_hashes(buf) & mask) == 0) + 1  # end offsets
    out = []
    s = 0
    while s < n:
        lo = s + min_size
        hi = min(s + max_size, n)
        if lo >= n:
            e = n
        else:
            i = int(np.searchsorted(cand, lo, side="left"))
            e = int(cand[i]) if i < len(cand) and cand[i] <= hi else hi
        chunk = payload[s:e]
        fp = int.from_bytes(hashlib.blake2b(chunk, digest_size=8).digest(),
                            "big", signed=True)
        out.append((s, e - s, fp))
        s = e
    return out


CDC_CHUNK_SCHEMA = ("media_ref string, chunk_idx int, offset long, "
                    "length int, fp long")


def cdc_chunk_table(raw: DataFrame, ref_col: str = "media_ref",
                    payload_col: str = "payload", min_size: int = 64,
                    avg_bits: int = 8, max_size: int = 1024) -> DataFrame:
    """(media_ref, payload) rows -> one row per content-defined chunk.
    mapInPandas, Arrow-batched, hash-repartitioned: payload bytes cross
    JVM->Arrow once and never shuffle; only (ref, idx, offset, length,
    fp) rows — a few dozen bytes per ~2^avg_bits payload bytes — enter
    downstream exchanges. At 100 TB of media this is the table the
    chunk-store dedup joins against."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                for idx, (off, ln, fp) in enumerate(cdc_chunks_bytes(
                        bytes(r[payload_col]), min_size, avg_bits, max_size)):
                    rows.append({"media_ref": r[ref_col], "chunk_idx": idx,
                                 "offset": off, "length": ln, "fp": fp})
            yield pd.DataFrame(rows, columns=["media_ref", "chunk_idx",
                                              "offset", "length", "fp"])

    return raw.repartition(F.pmod(F.xxhash64(ref_col), F.lit(32))).mapInPandas(
        gen, CDC_CHUNK_SCHEMA)


def cdc_dedup_stats(chunks: DataFrame) -> DataFrame:
    """Corpus-level CDC dedup ratio from a chunk table: one row
    (total_bytes, distinct_bytes, dup_bp) where dup_bp = integer basis
    points of bytes a chunk store would NOT have to keep twice. Two hash
    aggs (fp-distinct then global) — the canonical scale shape."""
    per_fp = chunks.groupBy("fp").agg(
        F.max("length").alias("_len"),
        F.sum(F.col("length").cast("long")).alias("_tot"),
    )
    return per_fp.agg(
        F.sum("_tot").alias("total_bytes"),
        F.sum(F.col("_len").cast("long")).alias("distinct_bytes"),
    ).select(
        "total_bytes", "distinct_bytes",
        F.expr("(10000 * (total_bytes - distinct_bytes)) div total_bytes")
        .alias("dup_bp"),
    )


def dedup_against_corpus(new_docs: DataFrame, corpus: DataFrame,
                         text_col: str = "text", id_col: str = "doc_id",
                         near: bool = False, num_perm: int = 64,
                         bands: int = 16, shingle_n: int = 3) -> DataFrame:
    """Incremental-ingestion dedup: keep only the rows of `new_docs` whose
    content is NOT already in `corpus` — the batch analog of the
    streaming pipeline's cross-run dedup, and the shape every append-only
    corpus build runs each cycle (new crawl batch vs 10^9 existing docs).

    Exact tier: anti-join on the normalized-text xxhash64 fingerprint —
    the corpus side reduces to DISTINCT 8-byte keys, so at scale this is
    a fingerprint-bucketed anti-join that never moves document text.
    With `near=True`, an additional MinHash-band tier: new docs whose ANY
    band bucket collides with an existing corpus bucket are dropped too
    (same single-linkage semantics as `minhash_dedup`, applied across
    the corpus boundary). Both tiers are anti-joins on small keys; the
    new batch is typically orders of magnitude smaller than the corpus,
    and only keys shuffle."""
    fp = F.xxhash64(F.lower(clean_text(F.col(text_col))))
    corpus_fps = corpus.select(fp.alias("_fp")).distinct()
    out = (
        new_docs.withColumn("_fp", fp)
        .join(corpus_fps, "_fp", "left_anti")
        .drop("_fp")
    )
    if near:
        nb = minhash_band_buckets(
            minhash_signatures(out, text_col, id_col, num_perm, shingle_n),
            num_perm, bands, id_col)
        cb = minhash_band_buckets(
            minhash_signatures(corpus, text_col, id_col, num_perm, shingle_n),
            num_perm, bands, id_col).select("band", "bucket").distinct()
        hit = nb.join(cb, ["band", "bucket"], "left_semi") \
                .select(id_col).distinct()
        out = out.join(hit, id_col, "left_anti")
    return out


# ---------------------------------------------------------------------------
# exact-substring dedup (Lee, Ippolito et al. 2022, "Deduplicating Training
# Data Makes Language Models Better")
# ---------------------------------------------------------------------------

def _gram_positions(df: DataFrame, k: int, text_col: str, id_col: str,
                    portable: bool) -> DataFrame:
    """(doc_id, pos, gh): one row per token position 1..m (m = tokens-k+1)
    with the hash of the k-token gram starting there. Pure JVM
    higher-order functions (tokenizer shared via textops.word_tokens);
    docs shorter than k tokens emit nothing. `portable=True` keys grams
    by their full md5 hex (128-bit, collision-free for gate purposes and
    replayable in DuckDB); production uses xxhash64 (8-byte shuffle
    keys; a 64-bit collision mislabels one position in ~1e19 grams)."""
    from ..functions.textops import word_tokens

    toks = word_tokens(F.col(text_col))
    m = F.size(toks) - k + 1
    gram = lambda i: F.concat_ws(" ", F.slice(toks, i, k))  # noqa: E731
    hash_fn = (lambda g: F.md5(g)) if portable else (lambda g: F.xxhash64(g))
    grams = F.when(
        m >= 1,
        F.transform(F.sequence(F.lit(1), F.greatest(m, F.lit(1))),
                    lambda i: F.struct(i.cast("long").alias("pos"),
                                       hash_fn(gram(i)).alias("gh"))),
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), grams.alias("_g"))
        .filter(F.col("_g").isNotNull())
        .select("doc_id", F.explode("_g").alias("g"))
        .select("doc_id", F.col("g.pos").alias("pos"), F.col("g.gh").alias("gh"))
    )


def _merge_islands(dup_pos: DataFrame, k: int) -> DataFrame:
    """Maximal duplicated spans from duplicated gram-start positions:
    positions p_prev < p start a NEW span when p - p_prev > k (their
    k-token intervals neither overlap nor touch); otherwise they merge.
    Classic gaps-and-islands: lag -> break flag -> running sum -> group.
    The window partitions by doc_id, so its state is bounded by document
    length (the same per-doc bound line_dedup_corpus's reassembly relies
    on), never by corpus size. Spans within a doc are disjoint by
    construction (next start > prev end + 1).

    Returns (doc_id, start_tok, end_tok, span_tokens, n_grams), token
    positions 1-based inclusive."""
    w = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(F.col("pos") - F.lag("pos").over(w) > k, 1).otherwise(0)
    grp = F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        dup_pos.withColumn("_grp", grp)
        .groupBy("doc_id", "_grp")
        .agg(F.min("pos").alias("start_tok"),
             (F.max("pos") + k - 1).cast("long").alias("end_tok"),
             F.count(F.lit(1)).alias("n_grams"))
        .select("doc_id", "start_tok", "end_tok",
                (F.col("end_tok") - F.col("start_tok") + 1).alias("span_tokens"),
                "n_grams")
    )


def exact_substring_spans(df: DataFrame, k: int = 10,
                          min_occurrences: int = 2,
                          text_col: str = "text", id_col: str = "doc_id",
                          portable: bool = False) -> DataFrame:
    """Exact-substring duplication map (Lee et al. 2022 §3.1): every
    token position whose k-gram occurs >= min_occurrences times in the
    WHOLE corpus (occurrence semantics — a doc repeating itself counts)
    is duplicated; maximal runs of duplicated positions merge into
    spans. The union of the reported [start_tok, end_tok] intervals is
    exactly the set of tokens inside some >=k-token substring that
    appears >= min_occurrences times — the same artifact the paper's
    suffix array computes, re-expressed as a position-level k-gram
    join (their ExactSubstr definition, without the suffix-array
    machinery Spark has no use for).

    Returns (doc_id, start_tok, end_tok, span_tokens, n_grams).

    Scale shape (100 TB): one explode to (doc, pos, 8-byte gh) rows; one
    groupBy(gh) count with map-side combine (hot grams ARE the
    duplicates, collapsed to one partial row per map task before the
    exchange); one semi-join back; one per-doc window bounded by doc
    length. No all-pairs stage anywhere — cost is linear in corpus
    tokens plus the duplicated-position volume."""
    # the gram table feeds both the hot-gram aggregation and the probe
    # side of the join; persist it so tokenization + k-gram hashing run
    # once, not twice (the materialized-gram-table discipline of Lee et
    # al.'s suffix-array artifact — MEMORY_AND_DISK, so at corpus scale
    # it spills to local disk rather than recomputing the corpus pass)
    pos = _gram_positions(df, k, text_col, id_col, portable).persist()
    hot = (pos.groupBy("gh").agg(F.count(F.lit(1)).alias("_n"))
           .filter(F.col("_n") >= min_occurrences).select("gh"))
    dup = pos.join(hot, "gh", "left_semi").select("doc_id", "pos")
    return _merge_islands(dup, k)


def exact_substring_removal(df: DataFrame, k: int = 10,
                            text_col: str = "text", id_col: str = "doc_id",
                            portable: bool = False) -> DataFrame:
    """Exact-substring dedup, removal form: duplicated spans are CUT
    from every occurrence except the corpus-first one (lowest
    (doc_id, pos) per gram — the deterministic survivor rule shared
    with line_dedup_corpus), and documents are reassembled from their
    surviving tokens. Lee et al. remove "all but one" copy; first-
    occurrence is the arbitrary-but-reproducible choice every gate can
    replay.

    Returns (doc_id, text_deduped, n_tokens, n_tokens_kept) for EVERY
    input row (token-less docs keep a (doc, '', 0, 0) row rather than
    disappearing).

    Scale shape: the gram aggregation carries (count, min(struct(doc,
    pos))) — still one map-side-combined shuffle on the 8-byte gram key;
    covered positions come from exploding the (disjoint) spans, never
    from a range join; reassembly is the bounded per-doc collect_list
    contract of line_dedup_corpus."""
    # persist: the gram table feeds both the occurrence aggregation and
    # the probe side of the join (see exact_substring_spans)
    pos = _gram_positions(df, k, text_col, id_col, portable).persist()
    occ = pos.groupBy("gh").agg(
        F.count(F.lit(1)).alias("_n"),
        F.min(F.struct(F.col("doc_id").alias("d"),
                       F.col("pos").alias("p"))).alias("_first"),
    )
    dup = (
        pos.join(occ, "gh")
        .filter((F.col("_n") >= 2)
                & ~((F.col("doc_id") == F.col("_first.d"))
                    & (F.col("pos") == F.col("_first.p"))))
        .select("doc_id", "pos")
    )
    spans = _merge_islands(dup, k)
    covered = spans.select(
        "doc_id",
        F.explode(F.sequence(F.col("start_tok"), F.col("end_tok"))).alias("tpos"),
    ).withColumn("_cov", F.lit(True))
    from ..functions.textops import word_tokens

    tokens = (
        df.select(F.col(id_col).alias("doc_id"),
                  F.posexplode(word_tokens(F.col(text_col))).alias("_p0", "tok"))
        .select("doc_id", (F.col("_p0") + 1).cast("long").alias("tpos"), "tok")
    )
    agg = (
        tokens.join(covered, ["doc_id", "tpos"], "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count(F.when(F.col("_cov").isNull(), 1)).alias("n_tokens_kept"),
            F.array_sort(
                F.collect_list(
                    F.when(F.col("_cov").isNull(),
                           F.struct(F.col("tpos").alias("tpos"),
                                    F.col("tok").alias("tok"))))
            ).alias("_a"),
        )
        .select(
            "doc_id",
            F.concat_ws(" ", F.expr("transform(_a, x -> x.tok)"))
            .alias("text_deduped"),
            "n_tokens", "n_tokens_kept",
        )
    )
    base = df.select(F.col(id_col).alias("doc_id"))
    return (
        base.join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("text_deduped", F.lit("")).alias("text_deduped"),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_tokens_kept", F.lit(0)).cast("long").alias("n_tokens_kept"),
        )
    )
