"""HyperLogLog register/estimator tests vs a pure-Python oracle."""

import hashlib
import math

import pytest

import smartcrawler_spark.operators.sketches as SK


def _py_registers(values, b=8, nbits=48, salt="hll"):
    """Independent register oracle: md5 -> first nbits/4 hex digits."""
    m_mask = (1 << (nbits - b)) - 1
    regs = {}
    for v in values:
        u = int(hashlib.md5(f"{v}|{salt}".encode()).hexdigest()
                [: nbits // 4], 16)
        bucket = u >> (nbits - b)
        tail = u & m_mask
        w = nbits - b
        rho = w + 1 if tail == 0 else w - tail.bit_length() + 1
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def test_hll_registers_match_python_oracle(spark):
    rows = [(("h%d" % (i % 3)), "val-%d" % i) for i in range(500)]
    df = spark.createDataFrame(rows, "host string, url string")
    got = {}
    for r in SK.hll_registers(df, ["host"], "url", b=6).collect():
        got.setdefault(r["host"], {})[r["bucket"]] = r["max_rho"]
    for h in ("h0", "h1", "h2"):
        vals = [u for hh, u in rows if hh == h]
        assert got[h] == _py_registers(vals, b=6)


def test_hll_merge_is_lossless(spark):
    rows = [("k", "v-%d" % i) for i in range(400)]
    df = spark.createDataFrame(rows, "k string, v string")
    whole = {(r["k"], r["bucket"]): r["max_rho"]
             for r in SK.hll_registers(df, ["k"], "v").collect()}
    a = SK.hll_registers(df.limit(150), ["k"], "v")
    b = SK.hll_registers(df.subtract(df.limit(150)), ["k"], "v")
    merged = {(r["k"], r["bucket"]): r["max_rho"]
              for r in SK.hll_merge(a, b).collect()}
    assert merged == whole


@pytest.mark.parametrize("n", [80, 1200, 6000])
def test_hll_estimate_accuracy(spark, n):
    df = spark.createDataFrame(
        [("k", "item-%d" % i) for i in range(n)], "k string, v string")
    regs = SK.hll_registers(df, ["k"], "v", b=8)
    est = SK.hll_estimate(regs, ["k"], b=8).collect()[0]["estimate"]
    # m=256 -> rel std err ~6.5%; allow 4 sigma
    assert abs(est - n) / n < 4 * 1.04 / math.sqrt(256)
    # spark estimator == python estimator on the same registers
    py = SK.hll_estimate_py(
        {r["bucket"]: r["max_rho"] for r in regs.collect()}, b=8)
    assert est == pytest.approx(py, rel=1e-9)


def test_hll_estimate_exact_small_range(spark):
    # linear counting regime: tiny cardinalities come out near-exact
    df = spark.createDataFrame(
        [("k", "x-%d" % i) for i in range(5)], "k string, v string")
    regs = SK.hll_registers(df, ["k"], "v", b=8)
    est = SK.hll_estimate(regs, ["k"], b=8).collect()[0]["estimate"]
    assert abs(est - 5) < 1.0


def test_hll_duplicates_do_not_move_registers(spark):
    base = [("k", "u-%d" % i) for i in range(300)]
    df1 = spark.createDataFrame(base, "k string, v string")
    df2 = spark.createDataFrame(base * 5, "k string, v string")
    r1 = {(r["bucket"], r["max_rho"])
          for r in SK.hll_registers(df1, ["k"], "v").collect()}
    r2 = {(r["bucket"], r["max_rho"])
          for r in SK.hll_registers(df2, ["k"], "v").collect()}
    assert r1 == r2


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------

def _py_cms(values, depth=4, width=64, salt="cms"):
    regs = {}
    for v in values:
        for d in range(depth):
            u = int(hashlib.md5(f"{v}|{salt}{d}".encode()).hexdigest()[:6],
                    16)
            key = (d, u % width)
            regs[key] = regs.get(key, 0) + 1
    return regs


def test_cms_registers_match_python_oracle(spark):
    vals = ["u-%d" % (i % 40) for i in range(600)]  # skewed: 15 each
    df = spark.createDataFrame([("k", v) for v in vals], "k string, v string")
    got = {(r["d"], r["col"]): r["count"]
           for r in SK.cms_registers(df, ["k"], "v", depth=4,
                                     width=64).collect()}
    assert got == _py_cms(vals, 4, 64)


def test_cms_estimate_never_underestimates(spark):
    from collections import Counter
    vals = (["hot"] * 200 + ["warm"] * 50
            + ["u-%d" % i for i in range(300)])
    truth = Counter(vals)
    df = spark.createDataFrame([("k", v) for v in vals], "k string, v string")
    regs = SK.cms_registers(df, ["k"], "v", depth=4, width=256)
    probes = spark.createDataFrame(
        [("k", v) for v in truth], "k string, v string")
    est = {r["value"]: r["est"]
           for r in SK.cms_estimate(regs, probes, ["k"], "v",
                                    depth=4, width=256).collect()}
    for v, n in truth.items():
        assert est[v] >= n, v                       # one-sided guarantee
        assert est[v] <= n + len(vals) // 16, v     # loose eps*N bound
    # hot item clearly separated
    assert est["hot"] >= 200 and est["hot"] < 250
    # spark estimate == python oracle query on the same registers
    py_regs = {(r["d"], r["col"]): r["count"] for r in regs.collect()}
    for v in ("hot", "warm", "u-0"):
        assert est[v] == SK.cms_query_py(py_regs, v, 4, 256)


def test_cms_merge_is_lossless(spark):
    vals = [("k", i, "v-%d" % (i % 30)) for i in range(400)]
    df = spark.createDataFrame(vals, "k string, i long, v string")
    whole = {(r["k"], r["d"], r["col"]): r["count"]
             for r in SK.cms_registers(df, ["k"], "v").collect()}
    a = SK.cms_registers(df.filter("i % 3 = 0"), ["k"], "v")
    b = SK.cms_registers(df.filter("i % 3 != 0"), ["k"], "v")
    merged = {(r["k"], r["d"], r["col"]): r["count"]
              for r in SK.cms_merge(a, b).collect()}
    assert merged == whole


def test_cms_weighted(spark):
    import pyspark.sql.functions as F
    df = spark.createDataFrame(
        [("k", "a", 7), ("k", "a", 3), ("k", "b", 5)],
        "k string, v string, w long")
    regs = SK.cms_registers(df, ["k"], "v", depth=2, width=32,
                            weight=F.col("w"))
    probes = spark.createDataFrame([("k", "a"), ("k", "b")],
                                   "k string, v string")
    est = {r["value"]: r["est"]
           for r in SK.cms_estimate(regs, probes, ["k"], "v",
                                    depth=2, width=32).collect()}
    assert est["a"] >= 10 and est["b"] >= 5


# ---------------------------------------------------------------------------
# KMV sketch + corpus overlap
# ---------------------------------------------------------------------------

def _py_kmv(values, k=64, nbits=48, salt="kmv"):
    hs = sorted({int(hashlib.md5(f"{v}|{salt}".encode()).hexdigest()
                     [: nbits // 4], 16) for v in values})
    return hs[:k]


def test_kmv_registers_match_python_oracle(spark):
    rows = [("s%d" % (i % 2), "v-%d" % i) for i in range(300)]
    df = spark.createDataFrame(rows, "src string, v string")
    got = {}
    for r in SK.kmv_registers(df, ["src"], "v", k=16).collect():
        got.setdefault(r["src"], []).append((r["pos"], r["hash"]))
    for s in ("s0", "s1"):
        vals = [v for src, v in rows if src == s]
        want = [(i + 1, h) for i, h in enumerate(_py_kmv(vals, k=16))]
        assert sorted(got[s]) == want


def test_kmv_estimate(spark):
    # unsaturated: exact; saturated: within 4 sigma (~1/sqrt(k-2))
    import math
    for n, k in [(10, 64), (5000, 64)]:
        df = spark.createDataFrame(
            [("k", "item-%d" % i) for i in range(n)], "k string, v string")
        hs = [r["hash"]
              for r in SK.kmv_registers(df, ["k"], "v", k=k).collect()]
        est = SK.kmv_estimate_py(hs, k=k)
        if n < k:
            assert est == n
        else:
            assert abs(est - n) / n < 4 / math.sqrt(k - 2)


def test_kmv_overlap_pairs(spark):
    # A = 0..999, B = 500..1499 (J = 1/3), C = A (J = 1), D disjoint
    rows = ([("A", "x-%d" % i) for i in range(1000)]
            + [("B", "x-%d" % i) for i in range(500, 1500)]
            + [("C", "x-%d" % i) for i in range(1000)]
            + [("D", "y-%d" % i) for i in range(1000)])
    df = spark.createDataFrame(rows, "src string, v string")
    regs = SK.kmv_registers(df, ["src"], "v", k=128)
    got = {(r["a"], r["b"]): r
           for r in SK.kmv_overlap_pairs(regs, "src", k=128).collect()}
    assert len(got) == 6  # all unordered pairs of 4 keys
    # identical corpora: identical sketches, every union hash in both
    ac = got[("A", "C")]
    assert ac["n_common"] == ac["k_used"] == 128
    # disjoint corpora: nothing in common
    assert got[("A", "D")]["n_common"] == 0
    assert got[("B", "D")]["n_common"] == 0
    # J(A,B) = 1/3 within 4 sigma of sqrt(J(1-J)/k)
    import math
    j = got[("A", "B")]["n_common"] / got[("A", "B")]["k_used"]
    assert abs(j - 1 / 3) < 4 * math.sqrt((1 / 3) * (2 / 3) / 128)


# ---------------------------------------------------------------------------
# log2 histogram
# ---------------------------------------------------------------------------

def test_log2_histogram_buckets_exact(spark):
    rows = [("k", v) for v in [0, 1, 2, 3, 4, 7, 8, 1023, 1024, 0]]
    df = spark.createDataFrame(rows, "k string, v long")
    got = {r["bucket"]: r["n"]
           for r in SK.log2_histogram(df, ["k"], "v").collect()}
    # exact powers land in their OWN bucket (no float-log off-by-one)
    assert got == {-1: 2, 0: 1, 1: 2, 2: 2, 3: 1, 9: 1, 10: 1}


def test_log2_quantile(spark):
    import random
    rng = random.Random(7)
    vals = [rng.randint(1, 10000) for _ in range(2000)]
    df = spark.createDataFrame([("k", v) for v in vals], "k string, v long")
    hist = {r["bucket"]: r["n"]
            for r in SK.log2_histogram(df, ["k"], "v").collect()}
    vals.sort()
    for q in (0.1, 0.5, 0.9):
        est = SK.log2_quantile_py(hist, q)
        true = vals[int(q * len(vals)) - 1]
        assert true / 2 <= est <= true * 2, (q, est, true)


# ---------------------------------------------------------------------------
# mirror-host detection (bottom-m LSH candidates + k-min-union verify)
# ---------------------------------------------------------------------------

def _py_mirror_oracle(host_docs, k=16, m=4, max_bucket=64,
                      min_ppm=500_000):
    """Full-spec python re-derivation: KMV per host over md5(text),
    bottom-m bucket candidates with the hot-hash cap, k-min-union
    overlap, integer jaccard ppm."""
    regs = {h: _py_kmv([hashlib.md5(t.encode()).hexdigest() for t in docs],
                       k=k) for h, docs in host_docs.items()}
    owners = {}
    for h, hs in regs.items():
        for v in hs[:m]:
            owners.setdefault(v, set()).add(h)
    cands = set()
    for v, hosts in owners.items():
        if len(hosts) > max_bucket:
            continue
        for a in hosts:
            for b in hosts:
                if a < b:
                    cands.add((a, b))
    out = {}
    for a, b in cands:
        uni = sorted(set(regs[a]) | set(regs[b]))[:k]
        common = sum(1 for v in uni if v in set(regs[a]) and v in set(regs[b]))
        ppm = 1_000_000 * common // len(uni)
        out[(a, b)] = (len(uni), common, ppm, ppm >= min_ppm)
    return out


def test_mirror_hosts_matches_python_oracle(spark):
    base = [f"document body number {i} with unique content" for i in range(40)]
    host_docs = {
        "h1.com": base,
        "h2.com": list(base),               # exact mirror
        "h3.com": base[:20] + [f"own text {i}" for i in range(20)],  # half
        "h4.com": [f"disjoint {i}" for i in range(40)],              # none
    }
    rows = [(h, t) for h, docs in host_docs.items() for t in docs]
    df = spark.createDataFrame(rows, "host string, text string")
    got = {(r["a"], r["b"]): (r["k_used"], r["n_common"], r["jaccard_ppm"],
                              r["is_mirror"])
           for r in SK.mirror_hosts(df, k=16, m=4).collect()}
    want = _py_mirror_oracle(host_docs, k=16, m=4)
    assert got == want
    # the planted structure: exact mirror found and flagged, half-overlap
    # found but below 0.5, disjoint host never paired
    assert got[("h1.com", "h2.com")][3] is True
    assert got[("h1.com", "h2.com")][1] == 16  # every union hash common
    if ("h1.com", "h3.com") in got:
        assert got[("h1.com", "h3.com")][3] is False
    assert not any("h4.com" in p for p in got)


def test_mirror_hosts_hot_hash_cap_drops_boilerplate_bucket(spark):
    # one document shared by EVERY host (the classic shared boilerplate
    # page): with max_bucket below the host count that hash cannot pair
    # anyone, so otherwise-disjoint hosts yield no candidates
    rows = [(f"h{i}.com", "identical boilerplate everywhere") for i in range(6)]
    rows += [(f"h{i}.com", f"unique {i} {j}") for i in range(6)
             for j in range(10)]
    df = spark.createDataFrame(rows, "host string, text string")
    none = SK.mirror_hosts(df, k=16, m=16, max_bucket=5).collect()
    assert none == []
    # raising the cap re-admits the bucket -> all 15 pairs appear
    some = SK.mirror_hosts(df, k=16, m=16, max_bucket=6).collect()
    assert len(some) == 15 and all(not r["is_mirror"] for r in some)
