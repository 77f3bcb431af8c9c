"""Hashed Naive-Bayes classifier (operators/nbclassifier.py).

The driver gates (nb_model / nb_classify) replay the integer spec in
DuckDB over the sf tables; these tests pin the spec against a pure-
Python reimplementation on adversarial micro-corpora and cover the
paths the gate can't: the fast xxhash64 tier, token-less docs,
deterministic tie-breaks, and the portable-space guard.
"""

from __future__ import annotations

import hashlib

import pytest

from smartcrawler_spark.operators import nbclassifier as NB


def _bucket(tok: str, n_buckets: int = 4096) -> int:
    h = hashlib.md5(tok.encode()).hexdigest()
    return (int(h[0], 16) * 256 + int(h[1], 16) * 16 + int(h[2], 16)) % n_buckets


def _fl2(n: int) -> int:
    return n.bit_length() - 1


def _py_nb(train: list[tuple[str, str]], test: list[tuple[int, str]],
           n_buckets: int = 4096):
    """Pure-python replay of the module's integer spec."""
    feats: dict[tuple[str, int], int] = {}
    n_docs: dict[str, int] = {}
    n_toks: dict[str, int] = {}
    for label, text in train:
        toks = text.lower().split()
        n_docs[label] = n_docs.get(label, 0) + 1
        n_toks[label] = n_toks.get(label, 0) + len(toks)
        for t in toks:
            k = (label, _bucket(t, n_buckets))
            feats[k] = feats.get(k, 0) + 1
    total = sum(n_docs.values())
    out = {}
    for doc_id, text in test:
        toks = text.lower().split()
        scores = {}
        for lab in sorted(n_docs):
            bits = (len(toks) * _fl2(n_toks[lab] + n_buckets)
                    - sum(_fl2(feats.get((lab, _bucket(t, n_buckets)), 0) + 1)
                          for t in toks)
                    + _fl2(total) - _fl2(n_docs[lab]))
            scores[lab] = bits
        pred = min(scores, key=lambda m: (scores[m], m))
        out[doc_id] = (pred, scores[pred], scores)
    return out


TRAIN = [
    ("clean", "the quick brown fox jumps over the lazy dog"),
    ("clean", "a calm clear morning with fresh bread and tea"),
    ("clean", "the library opens early and closes late on weekdays"),
    ("spam", "click here buy now free free discount winner prize"),
    ("spam", "free money click now buy cheap prize winner offer"),
    ("spam", "winner winner free offer click buy now now now"),
]
TEST = [
    (1, "the fox and the dog rest in the morning"),
    (2, "free prize click now buy winner offer"),
    (3, "bread tea and a clear morning walk"),
    (4, ""),  # token-less: prior-only
    (5, "zzz qqq vvv"),  # all-unseen tokens
]


def test_integer_spec_matches_pure_python(spark):
    train = spark.createDataFrame(TRAIN, "label string, text string")
    test = spark.createDataFrame(TEST, "doc_id int, text string")
    feats, priors = NB.nb_train(train, portable=True)
    scored = NB.nb_score_bits(test, feats, priors, portable=True)
    want = _py_nb(TRAIN, TEST)
    got_scores = {(r["doc_id"], r["label"]): r["bits"]
                  for r in scored.collect()}
    for doc_id, (_, _, scores) in want.items():
        for lab, bits in scores.items():
            assert got_scores[(doc_id, lab)] == bits, (doc_id, lab)
    got_pred = {r["doc_id"]: (r["pred_label"], r["bits"])
                for r in NB.nb_predict(scored).collect()}
    assert got_pred == {d: (p, b) for d, (p, b, _) in want.items()}


def test_separable_corpus_classifies_correctly(spark):
    train = spark.createDataFrame(TRAIN, "label string, text string")
    test = spark.createDataFrame(TEST[:3], "doc_id int, text string")
    feats, priors = NB.nb_train(train, portable=True)
    pred = {r["doc_id"]: r["pred_label"]
            for r in NB.nb_predict(
                NB.nb_score_bits(test, feats, priors, portable=True)
            ).collect()}
    assert pred == {1: "clean", 2: "spam", 3: "clean"}


def test_fast_tier_same_shape_and_separation(spark):
    """The xxhash64 production tier: same schema, same classification on
    the separable corpus (hash family differs, decisions shouldn't)."""
    train = spark.createDataFrame(TRAIN, "label string, text string")
    test = spark.createDataFrame(TEST[:3], "doc_id int, text string")
    feats, priors = NB.nb_train(train, n_buckets=1 << 16)
    scored = NB.nb_score_bits(test, feats, priors, n_buckets=1 << 16)
    assert scored.columns == ["doc_id", "label", "n_toks", "bits"]
    pred = {r["doc_id"]: r["pred_label"]
            for r in NB.nb_predict(scored).collect()}
    assert pred == {1: "clean", 2: "spam", 3: "clean"}


def test_tokenless_and_unseen_docs_keep_rows(spark):
    train = spark.createDataFrame(TRAIN, "label string, text string")
    test = spark.createDataFrame(TEST, "doc_id int, text string")
    feats, priors = NB.nb_train(train, portable=True)
    scored = NB.nb_score_bits(test, feats, priors, portable=True)
    rows = {(r["doc_id"], r["label"]): r for r in scored.collect()}
    assert len(rows) == 5 * 2  # every doc x every label, incl. doc 4/5
    # token-less doc: bits = prior only (equal priors here -> equal bits)
    assert rows[(4, "clean")]["n_toks"] == 0
    assert rows[(4, "clean")]["bits"] == rows[(4, "spam")]["bits"]
    # tie -> lexicographically first label
    pred = {r["doc_id"]: r["pred_label"]
            for r in NB.nb_predict(scored).collect()}
    assert pred[4] == "clean"


def test_portable_space_guard():
    with pytest.raises(ValueError, match="portable bucketing"):
        NB._bucket_expr("_tok", 8192, portable=True)
