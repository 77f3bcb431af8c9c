"""BPE training/application (operators/bpe.py) vs an independent
sequential python trainer (the Sennrich formulation, re-implemented in
the test with its own pair counting and tie-break)."""

from __future__ import annotations

import re
from collections import Counter

from smartcrawler_spark.operators import bpe


def _tok(text):
    return [w for w in re.sub(r"\s+", " ", (text or "").strip()).lower()
            .split(" ") if w]


def _train_py(word_counts, num_merges, min_pair_count=2):
    seg = {w: list(w) + [bpe.END] for w in word_counts}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for w, syms in seg.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += word_counts[w]
        if not pairs:
            break
        # count desc, then (a, b) lexicographic — the module's contract
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_count:
            break
        merges.append((a, b))
        for w, syms in seg.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            seg[w] = out
    return merges, seg


SENNRICH = ("low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3).strip()


def test_train_matches_sequential_reference(spark):
    docs = spark.createDataFrame([(1, SENNRICH)], "doc_id int, text string")
    counts = bpe.word_counts(docs)
    wc = {r["word"]: r["n"] for r in counts.collect()}
    assert wc == Counter(_tok(SENNRICH))
    merges, seg = bpe.train_bpe(spark, counts, num_merges=8)
    want_merges, want_seg = _train_py(wc, 8)
    assert merges == want_merges
    got_seg = {r["word"]: list(r["syms"]) for r in seg.collect()}
    assert got_seg == want_seg
    # the classic example's first merges
    assert merges[:3] == [("e", "s"), ("es", "t"), ("est", bpe.END)]


def test_train_tie_break_deterministic(spark):
    # every pair occurs exactly once -> pure lexicographic selection
    docs = spark.createDataFrame([(1, "ba dc")], "doc_id int, text string")
    counts = bpe.word_counts(docs)
    merges, _ = bpe.train_bpe(spark, counts, num_merges=2, min_pair_count=1)
    want, _ = _train_py({"ba": 1, "dc": 1}, 2, min_pair_count=1)
    assert merges == want
    assert merges[0] == ("a", bpe.END)  # smallest (a, b) among count-1 pairs


def test_train_early_stop_on_min_count(spark):
    docs = spark.createDataFrame([(1, "ab cd ef")], "doc_id int, text string")
    counts = bpe.word_counts(docs)
    merges, _ = bpe.train_bpe(spark, counts, num_merges=10, min_pair_count=2)
    assert merges == []  # no pair reaches 2


def test_apply_matches_kernel_and_roundtrips(spark):
    docs = spark.createDataFrame(
        [(1, SENNRICH), (2, "lowest newlow"), (3, ""), (4, None)],
        "doc_id int, text string")
    counts = bpe.word_counts(docs.filter("doc_id = 1"))
    merges, _ = bpe.train_bpe(spark, counts, num_merges=6)
    rows = {r["doc_id"]: r["bpe_tokens"]
            for r in bpe.apply_bpe(docs, merges).collect()}
    for i, text in [(1, SENNRICH), (2, "lowest newlow")]:
        want = [s for w in _tok(text) for s in bpe.bpe_segment_py(w, merges)]
        assert rows[i] == want
    assert rows[3] == [] and rows[4] == []
    # detokenization invariant: joining and splitting on </w> recovers words
    words = "".join(rows[2]).split(bpe.END)
    assert [w for w in words if w] == _tok("lowest newlow")


def test_overlapping_merge_leftmost_first(spark):
    # 'aaa' with merge (a,a): leftmost-first -> [aa, a, </w>], never [a, aa]
    docs = spark.createDataFrame([(1, "aaa aaa aa")], "doc_id int, text string")
    counts = bpe.word_counts(docs)
    merges, seg = bpe.train_bpe(spark, counts, num_merges=1, min_pair_count=1)
    assert merges == [("a", "a")]
    got = {r["word"]: list(r["syms"]) for r in seg.collect()}
    assert got["aaa"] == ["aa", "a", bpe.END]
    assert got["aa"] == ["aa", bpe.END]


def test_vocab_rollup(spark):
    docs = spark.createDataFrame([(1, SENNRICH)], "doc_id int, text string")
    counts = bpe.word_counts(docs)
    merges, seg = bpe.train_bpe(spark, counts, num_merges=4)
    _, want_seg = _train_py({r["word"]: r["n"] for r in counts.collect()}, 4)
    wc = {r["word"]: r["n"] for r in counts.collect()}
    want = Counter()
    wn = Counter()
    for w, syms in want_seg.items():
        for s in syms:
            want[s] += wc[w]
            wn[s] += 1
    got = {r["token"]: (r["n_words"], r["total_n"])
           for r in bpe.bpe_vocab(seg).collect()}
    assert got == {t: (wn[t], want[t]) for t in want}
