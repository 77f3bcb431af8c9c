"""Deterministic sampling ops vs pure-python oracles."""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from smartcrawler_spark.operators import sampling as S

_HEX = "0123456789abcdef"


def py_bucket(v, n=100):
    h = hashlib.md5(str(v).encode()).hexdigest()
    return (_HEX.index(h[0]) * 16 + _HEX.index(h[1])) % n


def test_hash_split_matches_python_and_is_stable(spark):
    ids = list(range(500))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r["doc_id"]: (r["bucket"], r["split"]) for r in S.hash_split(df).collect()}
    for i in ids:
        b = py_bucket(i)
        want = "train" if b < 80 else ("val" if b < 90 else "test")
        assert got[i] == (b, want), i
    # roughly proportional
    n_train = sum(1 for v in got.values() if v[1] == "train")
    assert 350 < n_train < 450


def test_hash_split_stable_under_append(spark):
    """New rows never change old rows' membership (pure function of id)."""
    small = S.hash_split(spark.createDataFrame([(i,) for i in range(100)], "doc_id long"))
    big = S.hash_split(spark.createDataFrame([(i,) for i in range(1000)], "doc_id long"))
    s = {r["doc_id"]: r["split"] for r in small.collect()}
    b = {r["doc_id"]: r["split"] for r in big.collect()}
    assert all(b[i] == s[i] for i in s)


def test_token_budget_pack_matches_python(spark):
    rows = [
        (0, "en", "one two three four five"),
        (1, "en", "a b c d e f g h i j k l"),
        (2, "en", "short text"),
        (3, "de", "ein zwei drei"),
        (4, "de", "eins zwei drei vier funf sechs sieben acht"),
        (5, "en", "medium length document here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = [(r["grp"], r["doc_id"], r["n_tokens"], r["cum_tokens"])
           for r in S.token_budget_pack(df, budget=15).collect()]

    def ntok(t):
        return len(re.findall(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]", t))

    want = []
    for grp in ("de", "en"):
        cand = sorted(
            [(i, ntok(t)) for i, g, t in rows if g == grp],
            key=lambda x: (-x[1], x[0]),
        )
        cum = 0
        for i, n in cand:
            cum += n
            if cum > 15:
                break
            want.append((grp, i, n, cum))
    assert sorted(got) == sorted(want)
    # the 12-token en doc packs first; the 5-token one fits after; rest don't
    en = [t for t in got if t[0] == "en"]
    assert {t[1] for t in en} == {1}.union(
        {t[1] for t in want if t[0] == "en"} - {1})


def test_token_budget_pack_priority_override(spark):
    rows = [(0, "en", "low quality " * 5), (1, "en", "high quality text")]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    pri = F.when(F.col("doc_id") == 1, 100.0).otherwise(0.0)
    got = [r["doc_id"] for r in
           S.token_budget_pack(df, budget=3, priority=pri).collect()]
    assert got == [1]


def test_weighted_sample_matches_python_oracle(spark):
    """Membership = pure function of (id, salt): md5-uniform 24-bit draw
    vs an integer threshold, independently recomputed in python."""
    import hashlib

    rows = [(i, (i * 37) % 300) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars int")
    w = F.least(F.col("n_chars") * 100_000, F.lit(1 << 24))
    got = {r["doc_id"]: r["u24"]
           for r in S.weighted_sample(df, w).select("doc_id", "u24").collect()}

    def u24(i):
        return int(hashlib.md5(f"{i}|ws".encode()).hexdigest()[:6], 16)

    want = {i: u24(i) for i, n in rows
            if u24(i) < min(n * 100_000, 1 << 24)}
    assert got == want
    assert 0 < len(got) < len(rows)  # neither degenerate extreme


def test_weighted_sample_monotone_superset(spark):
    """Raising the keep probability only ADDS rows (u24 is fixed per id),
    the property that makes staged corpus scale-ups reproducible."""
    df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    small = {r["doc_id"] for r in
             S.weighted_sample(df, F.lit(1 << 22)).collect()}
    big = {r["doc_id"] for r in
           S.weighted_sample(df, F.lit(1 << 23)).collect()}
    assert small < big
    # a weight of 2^24 keeps everything; 0 keeps nothing
    assert {r["doc_id"] for r in
            S.weighted_sample(df, F.lit(1 << 24)).collect()} == set(range(300))
    assert S.weighted_sample(df, F.lit(0)).count() == 0


def _py_u24(i, salt="tmix"):
    import hashlib as _h
    return int(_h.md5(f"{i}|{salt}".encode()).hexdigest()[:6], 16)


def test_temperature_mix_sqrt_matches_python_oracle(spark):
    """The alpha=1/2 integer-exact kernel vs a from-scratch python oracle:
    floor-sqrt group weights, integer-div thresholds, md5 draw."""
    import math

    # three sources with very different sizes: 400 / 100 / 25
    rows = ([(i, "big") for i in range(400)]
            + [(400 + i, "mid") for i in range(100)]
            + [(500 + i, "small") for i in range(25)])
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = {(r["source"], r["doc_id"]): (r["n_group"], r["p24"], r["u24"])
           for r in S.temperature_mix_sqrt(df, total_target=200).collect()}

    n = {"big": 400, "mid": 100, "small": 25}
    w = {g: math.isqrt(c) for g, c in n.items()}
    wsum = sum(w.values())
    p24 = {g: min(1 << 24, (200 * w[g] * (1 << 24)) // (wsum * n[g]))
           for g in n}
    want = {}
    for i, g in rows:
        u = _py_u24(i)
        if u < p24[g]:
            want[(g, i)] = (n[g], p24[g], u)
    assert got == want
    # smaller groups must be kept at a strictly HIGHER rate (alpha < 1
    # flattens the mix toward uniform): p24 ordering is inverse to size
    assert p24["small"] > p24["mid"] > p24["big"]


def test_temperature_mix_alpha_semantics(spark):
    """alpha=1 -> natural proportions = one uniform keep rate for every
    group; alpha=0 -> per-group expected output is equal (uniform over
    groups), so the keep RATE is inverse to group size."""
    rows = ([(i, "big") for i in range(300)]
            + [(300 + i, "small") for i in range(60)])
    df = spark.createDataFrame(rows, "doc_id long, source string")

    nat = S.temperature_mix(df, total_target=90, alpha=1.0)
    p = {r["source"]: r["p24"]
         for r in nat.select("source", "p24").distinct().collect()}
    assert p["big"] == p["small"]  # T/N for everyone
    assert abs(p["big"] - (90 / 360) * (1 << 24)) <= 1

    uni = S.temperature_mix(df, total_target=90, alpha=0.0)
    p0 = {r["source"]: r["p24"]
          for r in uni.select("source", "p24").distinct().collect()}
    # expected kept per group = p24 * n / 2^24 ~= 45 each (floor slack
    # on each p24 allows up to ~n/2^24 docs of difference)
    assert abs(p0["big"] * 300 - p0["small"] * 60) / (1 << 24) < 1e-3


def test_temperature_mix_sqrt_superset_under_bigger_target(spark):
    """Raising total_target only ADDS rows (fixed u24 per id, monotone
    thresholds) — staged corpus scale-ups stay reproducible."""
    rows = [(i, f"s{i % 7}") for i in range(350)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    small = {r["doc_id"]
             for r in S.temperature_mix_sqrt(df, total_target=50).collect()}
    big = {r["doc_id"]
           for r in S.temperature_mix_sqrt(df, total_target=150).collect()}
    assert small <= big
    assert len(small) < len(big)


def test_uniform_sample_k_deterministic_and_stable(spark):
    from smartcrawler_spark.operators.sampling import uniform_sample_k

    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3)) for i in range(90)], "doc_id long, lang string")
    s1 = {(r["lang"], r["doc_id"]) for r in uniform_sample_k(df, 5).collect()}
    s2 = {(r["lang"], r["doc_id"]) for r in uniform_sample_k(df, 5).collect()}
    assert s1 == s2 and len(s1) == 15
    for g in ("g0", "g1", "g2"):
        assert sum(1 for x in s1 if x[0] == g) == 5
    # independent redraw under a different salt
    s3 = {(r["lang"], r["doc_id"]) for r in
          uniform_sample_k(df, 5, salt="v2").collect()}
    assert s3 != s1
    # python oracle: k smallest md5 draws per group
    import hashlib

    want = set()
    for g in ("g0", "g1", "g2"):
        members = [i for i in range(90) if "g%d" % (i % 3) == g]
        ranked = sorted(members,
                        key=lambda i: (hashlib.md5(f"{i}|".encode()).hexdigest(), i))
        want |= {(g, i) for i in ranked[:5]}
    assert s1 == want
    # append-stability: adding rows can only displace, never reshuffle —
    # survivors of the superset that existed before are ranked the same
    df2 = spark.createDataFrame(
        [(i, "g%d" % (i % 3)) for i in range(120)], "doc_id long, lang string")
    s_big = {(r["lang"], r["doc_id"]) for r in uniform_sample_k(df2, 5).collect()}
    # every survivor in the bigger draw that is < 90 must also have been
    # a survivor before OR be displaced only by new (>= 90) rows
    for g, i in s_big:
        if i < 90 and (g, i) not in s1:
            raise AssertionError((g, i))
