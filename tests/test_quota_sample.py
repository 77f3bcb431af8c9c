"""Exact stratified sampling (operators/sampling.quota_sample /
stratified_sample). The driver gate replays apportionment + draws in
DuckDB over the sf tables; these tests pin the python-oracle semantics
on adversarial strata."""

from __future__ import annotations

import hashlib

import pytest

from smartcrawler_spark.operators.sampling import (quota_sample,
                                                   stratified_sample)


def _draw(doc_id: int, salt: str = "") -> str:
    return hashlib.md5(f"{doc_id}|{salt}".encode()).hexdigest()


def _expect(rows, quotas, salt=""):
    """Brute-force quota sample: per group, the quota smallest draws."""
    out = set()
    for g, q in quotas.items():
        members = sorted((r for r in rows if r[1] == g),
                         key=lambda r: (_draw(r[0], salt), r[0]))
        out |= {r[0] for r in members[:q]}
    return out


def test_quota_sample_matches_brute_force(spark):
    rows = [(i, "abc"[i % 3]) for i in range(90)]
    quotas = {"a": 5, "b": 17, "c": 0}
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    qd = spark.createDataFrame(list(quotas.items()), "lang string, quota long")
    got = {r["doc_id"] for r in quota_sample(df, qd).collect()}
    assert got == _expect(rows, quotas)
    # a stratum smaller than its quota keeps every row
    quotas2 = {"a": 1000, "b": 2, "c": 1}
    qd2 = spark.createDataFrame(list(quotas2.items()), "lang string, quota long")
    got2 = {r["doc_id"] for r in quota_sample(df, qd2).collect()}
    assert got2 == _expect(rows, quotas2)
    assert len([d for d in got2 if d % 3 == 0]) == 30  # all of stratum a


def test_quota_sample_append_stable(spark):
    """Appending rows can shrink a stratum's survivor set only by
    displacement — survivors of the bigger corpus that existed before
    are survivors chosen by the same global draw order."""
    rows = [(i, "x") for i in range(40)]
    qd = spark.createDataFrame([("x", 10)], "lang string, quota long")
    small = spark.createDataFrame(rows[:20], "doc_id long, lang string")
    big = spark.createDataFrame(rows, "doc_id long, lang string")
    s_small = {r["doc_id"] for r in quota_sample(small, qd).collect()}
    s_big = {r["doc_id"] for r in quota_sample(big, qd).collect()}
    assert s_small == _expect(rows[:20], {"x": 10})
    assert s_big == _expect(rows, {"x": 10})
    # membership is a pure function of the draw: every pre-existing doc
    # the big sample keeps was already a survivor in the small corpus
    # (new rows can only DISPLACE old survivors, never promote losers)
    assert {d for d in s_big if d < 20} <= s_small


def test_stratified_sample_exact_total(spark):
    # 60/25/15 rows -> proportional quotas must sum to exactly 25
    rows = ([(i, "big") for i in range(60)]
            + [(100 + i, "mid") for i in range(25)]
            + [(200 + i, "sml") for i in range(15)])
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(df, total=25, group_col="lang").collect()
    assert len(out) == 25
    by_lang = {}
    for r in out:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + 1
    # largest remainder on (60,25,15)/100*25 = 15, 6.25, 3.75 ->
    # bases 15,6,3 + 1 leftover to the largest remainder (sml .75)
    assert by_lang == {"big": 15, "mid": 6, "sml": 4}


def test_stratified_sample_custom_weights(spark):
    rows = [(i, "abc"[i % 3]) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    w = spark.createDataFrame([("a", 1), ("b", 0), ("c", 3)],
                              "lang string, weight long")
    out = stratified_sample(df, total=8, group_col="lang", weights=w).collect()
    by_lang = {}
    for r in out:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + 1
    # 8 * (1,0,3)/4 = 2,0,6 exactly
    assert by_lang == {"a": 2, "c": 6}


# --- chunk_documents (same module: corpus assembly) ---

def _py_chunks(text, chunk, overlap):
    toks = text.lower().split()
    if not toks:
        return []
    stride = chunk - overlap
    n = len(toks)
    nc = 1 if n <= chunk else 1 + -(-(n - chunk) // stride)
    return [" ".join(toks[c * stride: c * stride + chunk])
            for c in range(nc)]


def test_chunk_documents_matches_python_oracle(spark):
    from smartcrawler_spark.operators.sampling import chunk_documents

    cases = [
        (1, "a b c d e f g h i j"),          # 10 toks
        (2, " ".join(f"w{i}" for i in range(33))),  # just past one window
        (3, "one"),                          # single token
        (4, ""),                             # token-less: no chunks
        (5, " ".join(f"t{i}" for i in range(64))),  # exact multiple
    ]
    df = spark.createDataFrame(cases, "doc_id long, text string")
    for chunk, overlap in ((8, 0), (8, 3), (32, 8)):
        got = {}
        out = chunk_documents(df, chunk_tokens=chunk, overlap=overlap)
        for r in out.collect():
            got.setdefault(r["doc_id"], []).append(
                (r["chunk_idx"], r["text"], r["n_tokens"]))
        for doc_id, text in cases:
            want = _py_chunks(text, chunk, overlap)
            rows = sorted(got.get(doc_id, []))
            assert [t for _, t, _ in rows] == want, (doc_id, chunk, overlap)
            assert [i for i, _, _ in rows] == list(range(len(want)))
            assert all(n == len(t.split()) for _, t, n in rows)


def test_chunk_documents_overlap_property(spark):
    """With overlap o, consecutive chunks share exactly the last/first o
    tokens (except the ragged tail, which may start deeper inside)."""
    from smartcrawler_spark.operators.sampling import chunk_documents

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(40)))], "doc_id long, text string")
    rows = sorted((r["chunk_idx"], r["text"].split())
                  for r in chunk_documents(df, 16, 4).collect())
    for (_, a), (_, b) in zip(rows, rows[1:]):
        assert a[12:16] == b[0:4]


def test_chunk_documents_guard():
    from smartcrawler_spark.operators.sampling import chunk_documents

    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(None, chunk_tokens=8, overlap=8)
