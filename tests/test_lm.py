"""Bigram LM quality scoring (operators/lm.py) vs a pure-python oracle."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from smartcrawler_spark.operators import lm


def _tokens(text):
    if text is None:
        return []
    return [w for w in re.sub(r"\s+", " ", text.strip()).lower().split(" ")
            if w]


def _floor_log2(n):
    return n.bit_length() - 1


def _oracle(train, score):
    uni, big = {}, {}
    for _, t in train:
        ws = _tokens(t)
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    v = len(uni)
    out = {}
    for i, t in score:
        ws = _tokens(t)
        pairs = list(zip(ws, ws[1:]))
        bits = sum(
            _floor_log2(uni.get(a, 0) + v) - _floor_log2(big.get((a, b), 0) + 1)
            for a, b in pairs
        )
        n = len(pairs)
        out[i] = (n, bits, (bits * 1000) // n if n else None)
    return out, v


TRAIN = [
    (1, "the cat sat on the mat and the cat slept"),
    (2, "the dog sat on the rug"),
    (3, "a cat and a dog met on the mat"),
    (4, "the the the the"),
]
SCORE = [
    (10, "the cat sat on the mat"),      # in-domain: cheap
    (11, "slept rug met dog a"),         # shuffled: expensive
    (12, "zz qq unseen tokens here"),    # OOV everywhere
    (13, "the"),                         # 1 token: no bigram
    (14, ""),                            # blank
    (15, None),                          # null
]


def test_lm_score_matches_python_oracle(spark):
    train = spark.createDataFrame(TRAIN, "doc_id int, text string")
    score = spark.createDataFrame(SCORE, "doc_id int, text string")
    uni = lm.unigram_counts(train)
    big = lm.bigram_counts(train)
    want, v = _oracle(TRAIN, SCORE)
    # count tables match the oracle's
    got_uni = {r["w1"]: r["c1"] for r in uni.collect()}
    assert got_uni == {w: c for w, c in
                       __import__("collections").Counter(
                           t for _, x in TRAIN for t in _tokens(x)).items()}
    assert uni.count() == v
    got = {r["doc_id"]: (r["n_bigrams"], r["bits"], r["mbits"])
           for r in lm.lm_score_bits(score, uni, big, v).collect()}
    assert got == want
    # surprisal ordering: in-domain < shuffled < OOV (per-bigram)
    assert got[10][2] < got[11][2] <= got[12][2]


def test_lm_score_non_broadcast_path_identical(spark):
    train = spark.createDataFrame(TRAIN, "doc_id int, text string")
    score = spark.createDataFrame(SCORE, "doc_id int, text string")
    uni, big = lm.unigram_counts(train), lm.bigram_counts(train)
    v = uni.count()
    a = sorted(map(tuple, lm.lm_score_bits(score, uni, big, v).collect()))
    b = sorted(map(tuple, lm.lm_score_bits(
        score, uni, big, v, broadcast_model=False).collect()))
    assert a == b


def test_lm_filter_threshold_and_unscored(spark):
    train = spark.createDataFrame(TRAIN, "doc_id int, text string")
    score = spark.createDataFrame(SCORE, "doc_id int, text string")
    uni, big = lm.unigram_counts(train), lm.bigram_counts(train)
    scored = lm.lm_score_bits(score, uni, big, uni.count())
    want, _ = _oracle(TRAIN, SCORE)
    thr = want[11][2]  # keep up to the shuffled doc's score
    kept = {r["doc_id"] for r in lm.lm_filter(scored, thr).collect()}
    assert kept == {i for i, (_, _, m) in want.items()
                    if m is not None and m <= thr}
    kept2 = {r["doc_id"]
             for r in lm.lm_filter(scored, thr, keep_unscored=True).collect()}
    assert kept2 == kept | {13, 14, 15}


def test_lm_score_self_training_floor(spark):
    """A doc scored against a model trained on itself pays at most
    ~log2(V) bits per bigram more than 0 and never goes negative."""
    docs = spark.createDataFrame(TRAIN, "doc_id int, text string")
    uni, big = lm.unigram_counts(docs), lm.bigram_counts(docs)
    rows = lm.lm_score_bits(docs, uni, big, uni.count()).collect()
    assert all(r["bits"] >= 0 for r in rows)
    assert all(r["n_bigrams"] > 0 for r in rows)


def test_lm_buckets_split(spark):
    train = spark.createDataFrame(TRAIN, "doc_id int, text string")
    score = spark.createDataFrame(SCORE, "doc_id int, text string")
    uni, big = lm.unigram_counts(train), lm.bigram_counts(train)
    scored = lm.lm_score_bits(score, uni, big, uni.count())
    want, _ = _oracle(TRAIN, SCORE)
    mbits = sorted(m for _, _, m in want.values() if m is not None)
    # head = best doc only; tail = the worst doc (threshold just below)
    t1, t2 = mbits[0], mbits[2] - 1
    got = {r["doc_id"]: r["lm_bucket"]
           for r in lm.lm_buckets(scored, t1, t2).collect()}
    for i, (_, _, m) in want.items():
        if m is None:
            assert got[i] == "unscored"
        elif m <= t1:
            assert got[i] == "head"
        elif m <= t2:
            assert got[i] == "middle"
        else:
            assert got[i] == "tail"
    assert {"head", "tail", "unscored"} <= set(got.values())
