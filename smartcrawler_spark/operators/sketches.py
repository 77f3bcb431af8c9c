"""Distributed cardinality sketches (HyperLogLog) in engine-portable
integer arithmetic.

A 100 TB crawl needs per-key distinct counts everywhere — distinct URLs
per host for budget planning, distinct docs per source for mixing
weights, distinct fingerprints per shard for dedup telemetry — and exact
`count(distinct)` shuffles every value.  HyperLogLog (Flajolet et al.
2007) replaces that with m = 2^b integer registers per key: hash each
value, route it to register `bucket` = top b bits, record rho = number
of leading zeros of the remaining w = nbits-b bits, plus one; the
per-key register vector is `groupBy(key, bucket).agg(max(rho))` — fully
map-side-combinable, mergeable across partitions / days / clusters by
plain `max`, and its size is bounded by m per key no matter how many
values stream through.

The hash is the repo's engine-portable md5 discipline (md5 -> first
nbits/4 hex digits -> integer; see operators/sampling.md5_uniform_bits),
default nbits=48: supports ~10^12 distinct values before hash-collision
saturation, and a DuckDB oracle replays every register bit-exactly —
the register table itself is the all-integer driver gate, while the
float estimate stays a consumer-side function.

Scale notes: the only shuffle is the (key, bucket) groupBy, whose
cardinality is keys x m regardless of input rows; partial max-agg
collapses each executor's contribution to <= m rows per key before the
exchange.  No reference analog (this is a pipeline extension beyond
/root/reference/src — the Rust engine keeps exact HashSets,
storage.rs:78-150, which cannot scale past memory).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .sampling import md5_uniform_bits

__all__ = [
    "hll_registers",
    "hll_estimate",
    "hll_merge",
    "hll_estimate_py",
    "cms_registers",
    "cms_merge",
    "cms_estimate",
    "cms_query_py",
    "kmv_registers",
    "kmv_estimate_py",
    "kmv_overlap_pairs",
    "log2_histogram",
    "log2_quantile_py",
]


def _alpha(m: int) -> float:
    """HLL bias-correction constant (Flajolet et al. 2007, Fig. 3)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_registers(df: DataFrame, key_cols: list[str], value_col: str,
                  b: int = 8, nbits: int = 48, salt: str = "hll"
                  ) -> DataFrame:
    """Per-key HLL register table: (key..., bucket, max_rho), all
    integers.  bucket in [0, 2^b); max_rho in [1, nbits-b+1].  Absent
    (key, bucket) rows mean register value 0.  This IS the sketch:
    union register tables from any number of runs and re-`hll_merge`
    them — max is associative, so sketches compose across partitions,
    snapshots, and clusters with no precision loss."""
    if not 2 <= b <= 14 or nbits - b < 8:
        raise ValueError("need 2 <= b <= 14 and nbits - b >= 8")
    w = nbits - b
    u = md5_uniform_bits(F.col(value_col), salt=salt, nbits=nbits)
    bucket = F.shiftright(u, w)
    tail = u.bitwiseAND(F.lit((1 << w) - 1).cast("long"))
    rho = (
        F.when(tail == 0, F.lit(w + 1).cast("long"))
        .otherwise(F.lit(w + 1) - F.length(F.bin(tail)))
    )
    return (
        df.filter(F.col(value_col).isNotNull())  # count(distinct) parity
        .select(*key_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*key_cols, "bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_merge(regs: DataFrame, *more: DataFrame) -> DataFrame:
    """Merge register tables (same key_cols/b/nbits/salt): union +
    per-register max.  Lossless — merge(sketch(A), sketch(B)) is
    bit-identical to sketch(A UNION ALL B)."""
    out = regs
    for r in more:
        out = out.unionByName(r)
    keys = [c for c in out.columns if c != "max_rho"]
    return out.groupBy(*keys).agg(F.max("max_rho").alias("max_rho"))


def hll_estimate(regs: DataFrame, key_cols: list[str], b: int = 8,
                 nbits: int = 48) -> DataFrame:
    """Cardinality estimate per key from a register table (consumer-side
    floats; the gate stays on the integer registers).  Standard HLL
    estimator with the small-range linear-counting correction:
    E = alpha_m * m^2 / (V + sum 2^-M_j); if E <= 2.5m and V > 0,
    E = m * ln(m / V), where V = number of zero registers.  Relative
    std error ~ 1.04 / sqrt(m)."""
    m = 1 << b
    am = _alpha(m)
    agg = regs.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("_present"),
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("_inv"),
    )
    v = F.lit(m) - F.col("_present")  # zero registers
    raw = F.lit(am * m * m) / (F.col("_inv") + v.cast("double"))
    est = F.when(
        (raw <= 2.5 * m) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    return agg.select(*key_cols, est.alias("estimate"))


def hll_estimate_py(registers: dict[int, int], b: int = 8) -> float:
    """Pure-Python estimator over {bucket: max_rho} — the oracle twin of
    `hll_estimate` for tests and driver-side spot checks."""
    m = 1 << b
    inv = sum(2.0 ** -r for r in registers.values()) + (m - len(registers))
    raw = _alpha(m) * m * m / inv
    v = m - len(registers)
    if raw <= 2.5 * m and v > 0:
        return m * math.log(m / v)
    return raw


# ---------------------------------------------------------------------------
# count-min sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------

def cms_registers(df: DataFrame, key_cols: list[str], value_col: str,
                  depth: int = 4, width: int = 256, salt: str = "cms",
                  weight: Column | None = None) -> DataFrame:
    """Count-min frequency sketch per key: depth x width integer counters,
    counter[d][h_d(v) % width] += weight (default 1) for each of `depth`
    independent md5-salted hash rows.  Output (key..., d, col, count) —
    at most keys x depth x width rows regardless of input size, built by
    one groupBy with map-side partial sums, mergeable across runs /
    partitions by plain SUM (lossless, tested).  Point-frequency queries
    (`cms_query_py` / `cms_estimate`) take min over depth: never an
    underestimate, overestimate bounded by e/width x total_weight with
    probability 1 - e^-depth — the standard CMS guarantee.

    Use for hot-URL / hot-term detection where exact per-value counts
    would shuffle every distinct value: the exchange here is bounded by
    the sketch dimensions, not the data."""
    if depth < 1 or width < 2:
        raise ValueError("need depth >= 1 and width >= 2")
    w_col = (weight if weight is not None else F.lit(1)).cast("long")
    rows = df.filter(F.col(value_col).isNotNull()).select(
        *key_cols,
        F.explode(F.array(*[
            F.struct(
                F.lit(d).alias("d"),
                (md5_uniform_bits(F.col(value_col),
                                  salt=f"{salt}{d}", nbits=24)
                 % width).alias("col"),
            ) for d in range(depth)
        ])).alias("s"),
        w_col.alias("_w"),
    )
    return (
        rows.groupBy(*key_cols, F.col("s.d").alias("d"),
                     F.col("s.col").alias("col"))
        .agg(F.sum("_w").alias("count"))
    )


def cms_merge(regs: DataFrame, *more: DataFrame) -> DataFrame:
    """Merge CMS register tables (same dims/salt): union + per-counter
    SUM — bit-identical to sketching the concatenated input."""
    out = regs
    for r in more:
        out = out.unionByName(r)
    keys = [c for c in out.columns if c != "count"]
    return out.groupBy(*keys).agg(F.sum("count").alias("count"))


def cms_estimate(regs: DataFrame, probes: DataFrame, key_cols: list[str],
                 value_col: str, depth: int = 4, width: int = 256,
                 salt: str = "cms") -> DataFrame:
    """Estimated frequency for each (key, probe value): min over depth of
    the probed counters; absent counters read 0.  The probe side carries
    only (key, value, d, col) longs through a join on the bounded
    register table — broadcastable whenever keys x depth x width is
    dimension-sized.  Returns (key..., value, est)."""
    p = probes.filter(F.col(value_col).isNotNull()).select(
        *key_cols, F.col(value_col).alias("value"),
        F.explode(F.array(*[
            F.struct(
                F.lit(d).alias("d"),
                (md5_uniform_bits(F.col(value_col),
                                  salt=f"{salt}{d}", nbits=24)
                 % width).alias("col"),
            ) for d in range(depth)
        ])).alias("s"),
    ).select(*key_cols, "value", "s.d", "s.col")
    joined = p.join(regs, [*key_cols, "d", "col"], "left")
    return (
        joined.groupBy(*key_cols, "value")
        .agg(F.min(F.coalesce(F.col("count"), F.lit(0))).alias("est"))
    )


def cms_query_py(registers: dict[tuple[int, int], int], value,
                 depth: int = 4, width: int = 256, salt: str = "cms"
                 ) -> int:
    """Pure-Python point query over {(d, col): count} — oracle twin of
    `cms_estimate`."""
    import hashlib

    est = None
    for d in range(depth):
        u = int(hashlib.md5(f"{value}|{salt}{d}".encode()).hexdigest()[:6],
                16)
        c = registers.get((d, u % width), 0)
        est = c if est is None else min(est, c)
    return est or 0


# ---------------------------------------------------------------------------
# KMV sketch (Bar-Yossef et al. 2002 / Beyer et al. 2007) + corpus overlap
# ---------------------------------------------------------------------------

def kmv_registers(df: DataFrame, key_cols: list[str], value_col: str,
                  k: int = 64, nbits: int = 48, salt: str = "kmv",
                  n_salts: int = 32) -> DataFrame:
    """K-minimum-values sketch per key: the k smallest DISTINCT md5-nbits
    hashes of the value column, as (key..., pos, hash) with pos = 1-based
    rank.  Distinct estimate = (k-1) * 2^nbits / hash_k; unlike HLL, KMV
    sketches also support SET operations (union = k smallest of the
    merged lists; intersection via `kmv_overlap_pairs`), which is what
    cross-corpus overlap measurement needs.

    Shuffle discipline: dropDuplicates on (key, hash) is the one
    full-width exchange (unavoidable for exact k-min of distincts), then
    a two-phase salted top-k — rank within (key, hash%n_salts) first, so
    a single hot key spreads over n_salts reducers and the final
    per-key window sees at most n_salts*k rows, never the raw
    distribution (the politeness_topk skew pattern)."""
    u = md5_uniform_bits(F.col(value_col), salt=salt, nbits=nbits)
    hashes = (
        df.filter(F.col(value_col).isNotNull())
        .select(*key_cols, u.alias("hash"))
        .dropDuplicates([*key_cols, "hash"])
    )
    w1 = (
        Window.partitionBy(*key_cols, F.col("hash") % n_salts)
        .orderBy("hash")
    )
    cand = (
        hashes.withColumn("_r", F.row_number().over(w1))
        .filter(F.col("_r") <= k)
        .drop("_r")
    )
    w2 = Window.partitionBy(*key_cols).orderBy("hash")
    return (
        cand.withColumn("pos", F.row_number().over(w2).cast("long"))
        .filter(F.col("pos") <= k)
        .select(*key_cols, "pos", "hash")
    )


def kmv_estimate_py(hashes: list[int], k: int = 64, nbits: int = 48
                    ) -> float:
    """Distinct-count estimate from a KMV hash list (oracle twin): if the
    sketch is unsaturated (< k hashes) the count is exact; else
    (k-1) * 2^nbits / kth_smallest."""
    hs = sorted(hashes)
    if len(hs) < k:
        return float(len(hs))
    return (k - 1) * float(1 << nbits) / hs[k - 1]


def kmv_overlap_pairs(regs: DataFrame, key_col: str, k: int = 64
                      ) -> DataFrame:
    """Pairwise corpus overlap from KMV register tables: for every key
    pair a < b, take the k smallest hashes of sketch(a) UNION sketch(b)
    and count how many of those appear in BOTH sketches — n_common / k
    estimates Jaccard(A, B) (Beyer et al. 2007).  Returns all-integer
    (a, b, k_used, n_common); divide consumer-side.

    Everything here is dimension-sized: with S keys the working set is
    2*k*S^2 rows of longs, independent of corpus size — the corpus was
    compressed into the sketches already."""
    ka = regs.select(F.col(key_col).alias("a"), "hash")
    kb = regs.select(F.col(key_col).alias("b"), "hash")
    keys = regs.select(F.col(key_col).alias("_k")).distinct()
    # membership rows for every ordered pair (a < b)
    left = ka.join(keys, ka["a"] < keys["_k"]).select(
        "a", F.col("_k").alias("b"), "hash", F.lit(1).alias("in_a"),
        F.lit(0).alias("in_b"))
    right = kb.join(keys, keys["_k"] < kb["b"]).select(
        F.col("_k").alias("a"), "b", "hash", F.lit(0).alias("in_a"),
        F.lit(1).alias("in_b"))
    uni = (
        left.unionByName(right)
        .groupBy("a", "b", "hash")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("a", "b").orderBy("hash")
    topk = uni.withColumn("_r", F.row_number().over(w)).filter(
        F.col("_r") <= k)
    return (
        topk.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("k_used"),
             F.sum(F.col("in_a") * F.col("in_b")).alias("n_common"))
    )


# ---------------------------------------------------------------------------
# log2 histogram — integer-exact distribution sketch
# ---------------------------------------------------------------------------

def log2_histogram(df: DataFrame, key_cols: list[str], value_col: str
                   ) -> DataFrame:
    """Power-of-two histogram per key for a non-negative integer metric
    (doc length, fetch bytes, latency ms): bucket = floor(log2(v)) for
    v > 0, computed INTEGER-EXACTLY as bit_length - 1 (`length(bin(v))`
    — no float log that could round log2(8) to 2.9999), bucket -1 holds
    zeros.  Output (key..., bucket, n): at most keys x 64 rows, merge by
    SUM, and any quantile is answerable within a factor of 2 from the
    cumulative counts (`log2_quantile_py`) — the cheap alternative to a
    full KLL/t-digest when order-of-magnitude accuracy is enough
    (shuffle bounded by keys x 64, never a global sort)."""
    v = F.col(value_col).cast("long")
    bucket = (
        F.when(v <= 0, F.lit(-1).cast("long"))
        .otherwise((F.length(F.bin(v)) - 1).cast("long"))
    )
    return (
        df.filter(v.isNotNull())
        .select(*key_cols, bucket.alias("bucket"))
        .groupBy(*key_cols, "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def log2_quantile_py(hist: dict[int, int], q: float) -> int:
    """Quantile estimate from a {bucket: n} log2 histogram: returns the
    geometric midpoint (3 * 2^b / 2 rounded down; 0 for the zero bucket)
    of the bucket containing the q-quantile.  Exact to within the
    bucket's factor-of-2 span — the oracle/consumer twin of
    `log2_histogram`."""
    if not 0 <= q <= 1:
        raise ValueError("q in [0, 1]")
    total = sum(hist.values())
    if total == 0:
        raise ValueError("empty histogram")
    target = q * total
    run = 0
    for b in sorted(hist):
        run += hist[b]
        if run >= target:
            return 0 if b < 0 else (3 * (1 << b)) // 2
    return 0 if b < 0 else (3 * (1 << b)) // 2


def kmv_candidate_pairs(regs: DataFrame, key_col: str, m: int = 8,
                        max_bucket: int = 64) -> DataFrame:
    """Bottom-m sketch LSH: candidate key pairs sharing ANY of their m
    smallest KMV register hashes — near-identical value sets almost
    surely collide on their minimum hashes (bottom-k minwise sampling),
    so this finds mirror-grade overlap WITHOUT kmv_overlap_pairs' S^2
    pair enumeration.  A register hash held by more than `max_bucket`
    keys is dropped from pairing (a fingerprint shared that widely is
    boilerplate, and an uncapped bucket self-join is the quadratic
    blowup — the df-cap discipline of dedup.ngram_jaccard_pairs).

    Scale: one bucket self-join on 8-byte hashes over m rows per key;
    output pairs bounded by m * max_bucket^2 per hash, never S^2."""
    small = regs.filter(F.col("pos") <= m).select(
        F.col(key_col).alias("_key"), "hash")
    ok = (
        small.groupBy("hash")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") <= max_bucket)
        .select("hash")
    )
    small = small.join(ok, "hash")
    a = small.select(F.col("_key").alias("a"), "hash")
    b = small.select(F.col("_key").alias("b"), "hash")
    return (
        a.join(b, "hash")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def kmv_overlap_for_pairs(regs: DataFrame, pairs: DataFrame, key_col: str,
                          k: int = 64) -> DataFrame:
    """`kmv_overlap_pairs` semantics restricted to the given candidate
    (a, b) pairs: k smallest hashes of sketch(a) UNION sketch(b), count
    those present in both. All-integer (a, b, k_used, n_common); the
    per-pair window sees at most 2k register rows — bounded state."""
    ra = regs.select(F.col(key_col).alias("a"), "hash")
    rb = regs.select(F.col(key_col).alias("b"), "hash")
    left = pairs.join(ra, "a").select(
        "a", "b", "hash", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    right = pairs.join(rb, "b").select(
        "a", "b", "hash", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    uni = (
        left.unionByName(right)
        .groupBy("a", "b", "hash")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("a", "b").orderBy("hash")
    ranked = uni.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k)
    return ranked.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("k_used"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_common"),
    )


def mirror_hosts(docs: DataFrame, host_col: str = "host",
                 fingerprint: Column | None = None, k: int = 64,
                 m: int = 8, max_bucket: int = 64, nbits: int = 48,
                 salt: str = "kmv", n_salts: int = 32,
                 min_jaccard_ppm: int = 500_000) -> DataFrame:
    """Mirror / heavily-syndicated host detection: sketch every host's
    content-fingerprint set (KMV over `fingerprint`, default md5(text)),
    find candidates via bottom-m LSH, verify with the k-min-union
    Jaccard estimate.  Output (a, b, k_used, n_common, jaccard_ppm,
    is_mirror) — all columns integral; jaccard_ppm = 10^6 * n_common //
    k_used estimates J(A, B), is_mirror applies `min_jaccard_ppm`
    (default 0.5).  A crawl scheduler drops or deprioritizes the b side
    of confirmed mirrors before spending fetch budget on them.

    Scale: corpus -> k registers per host (kmv_registers' salted
    two-phase top-k), then everything downstream is register-sized."""
    fp = fingerprint if fingerprint is not None else F.md5(F.col("text"))
    src = docs.select(F.col(host_col).alias("_host"), fp.alias("_fp"))
    # persist the register table: candidate generation reads it three
    # times (bucket-cap build + both join sides) and the verify two more
    # — uncached, the whole corpus sketch pipeline (fingerprint md5 +
    # dedup exchange + two top-k windows) re-ran five times. Registers
    # are bounded at hosts x k rows, safe to cache at any corpus size.
    regs = kmv_registers(src, ["_host"], "_fp", k=k, nbits=nbits,
                         salt=salt, n_salts=n_salts).persist()
    cands = kmv_candidate_pairs(regs, "_host", m=m, max_bucket=max_bucket)
    ov = kmv_overlap_for_pairs(regs, cands, "_host", k=k)
    jac = F.floor(F.col("n_common") * F.lit(1_000_000) / F.col("k_used"))
    return ov.select(
        "a", "b", "k_used", "n_common",
        jac.cast("long").alias("jaccard_ppm"),
        (jac >= min_jaccard_ppm).alias("is_mirror"),
    )
