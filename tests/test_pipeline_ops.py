"""Tests for the round-2 pipeline operators: portable SimHash / ANN twins,
connected-component dedup clusters, decontamination, repetition profile,
PII redaction, top terms. Every operator is checked against an independent
pure-Python oracle (same pattern as test_dedup / test_similarity)."""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from smartcrawler_spark.functions import textops as T
from smartcrawler_spark.operators import dedup as DD
from smartcrawler_spark.operators import similarity as SIM

# ---------------------------------------------------------------------------
# pure-python oracles
# ---------------------------------------------------------------------------


def _words(text: str) -> list[str]:
    return [w for w in re.sub(r"\s+", " ", text.lower()).strip().split(" ") if w]


def py_simhash_portable(text: str, bits: int = 16) -> int:
    toks = _words(text)
    votes = [0] * bits
    for w in toks:
        for i in range(bits):
            b = ord(hashlib.md5(f"{i}|{w}".encode()).hexdigest()[0]) % 2
            votes[i] += 1 if b == 1 else -1
    return sum(1 << i for i in range(bits) if votes[i] > 0)


def py_simhash_pairs(docs: dict[int, str], bits=16, n_chunks=4, max_ham=3):
    sigs = {i: py_simhash_portable(t, bits) for i, t in docs.items()}
    width = bits // n_chunks
    mask = (1 << width) - 1
    out = set()
    ids = sorted(sigs)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            share = any(
                (sigs[a] >> (width * c)) & mask == (sigs[b] >> (width * c)) & mask
                for c in range(n_chunks)
            )
            ham = bin(sigs[a] ^ sigs[b]).count("1")
            if share and ham <= max_ham:
                out.add((a, b, ham))
    return out


class UnionFind:
    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


# ---------------------------------------------------------------------------
# simhash portable twin
# ---------------------------------------------------------------------------


DOCS = {
    0: "the cat sat on the mat and looked around quietly",
    1: "the cat sat on the mat and looked around quietly today",
    2: "completely different text about spark distributed computing engines",
    3: "the cat sat on the mat and looked around",
    4: "",
    5: "completely different text about spark distributed computing engine",
    6: "one",
}


def test_simhash_portable_matches_python_oracle(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in DOCS.items()], "doc_id long, text string"
    )
    got = {
        (r["a"], r["b"], r["hamming"])
        for r in DD.simhash_pairs_portable(df, max_hamming=6).collect()
    }
    want = py_simhash_pairs(DOCS, max_ham=6)
    assert got == want
    assert want, "oracle produced no pairs — test data too weak"


def test_simhash_portable_empty_doc_is_zero(spark):
    df = spark.createDataFrame([(0, ""), (1, "   ")], "doc_id long, text string")
    # both empty docs hash to 0 -> identical signature -> pair at hamming 0
    got = DD.simhash_pairs_portable(df, max_hamming=0).collect()
    assert [(r["a"], r["b"], r["hamming"]) for r in got] == [(0, 1, 0)]


# ---------------------------------------------------------------------------
# connected components / dedup clusters
# ---------------------------------------------------------------------------


def test_connected_components_matches_union_find(spark):
    edges = [(1, 2), (2, 3), (5, 6), (8, 9), (9, 1), (20, 21)]
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    want = {n: uf.find(n) for ab in edges for n in ab}
    df = spark.createDataFrame(edges, "a long, b long")
    # driver path (default, graph below threshold) and the distributed
    # iterative path (forced) must both produce the exact labels
    for thresh in (200_000, 0):
        got = {r["node"]: r["comp"]
               for r in DD.connected_components(
                   df, driver_threshold=thresh).collect()}
        assert got == want, thresh
        # chain 1-2-3-9-8 collapses to min id 1
        assert got[8] == 1 and got[3] == 1


def test_connected_components_paths_agree_on_null_edges(spark):
    # output must not depend on which side of driver_threshold the edge
    # count lands: both paths apply the same long-cast + null-endpoint
    # filter (the null edge contributes NO label row on either path)
    edges = [(1, 2), (None, 3), (4, None), (5, 6)]
    df = spark.createDataFrame(edges, "a long, b long")
    outs = []
    for thresh in (200_000, 0):
        out = DD.connected_components(df, driver_threshold=thresh)
        assert [f.name for f in out.schema.fields] == ["node", "comp"]
        assert [f.dataType.simpleString() for f in out.schema.fields] == \
            ["bigint", "bigint"]
        outs.append(sorted((r["node"], r["comp"]) for r in out.collect()))
    assert outs[0] == outs[1] == [(1, 1), (2, 1), (5, 5), (6, 5)]


def test_connected_components_long_chain(spark):
    # path graph 0-1-2-...-9: worst case for propagation (diameter rounds);
    # force the distributed loop (default would take the driver path)
    edges = [(i, i + 1) for i in range(9)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["comp"]
           for r in DD.connected_components(df, driver_threshold=0).collect()}
    assert got == {i: 0 for i in range(10)}


def test_connected_components_star_matches_union_find(spark):
    edges = [(1, 2), (2, 3), (5, 6), (8, 9), (9, 1), (20, 21)]
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    want = {n: uf.find(n) for ab in edges for n in ab}
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["comp"]
           for r in DD.connected_components_star(df).collect()}
    assert got == want


def test_connected_components_escalates_past_max_iter(spark):
    # path graph of diameter 40 with max_iter=5: min-label propagation
    # CANNOT converge — the default policy escalates to large-star/
    # small-star, which must return the exact labels (never silently
    # returning split components)
    edges = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["comp"]
           for r in DD.connected_components(
               df, max_iter=5, driver_threshold=0).collect()}
    assert got == {i: 0 for i in range(41)}


def test_connected_components_raises_when_asked(spark):
    edges = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(edges, "a long, b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        DD.connected_components(df, max_iter=5, on_nonconverged="raise",
                                driver_threshold=0)


def test_connected_components_star_long_chain_few_rounds(spark):
    # O(log n) convergence: a 64-node path collapses well within 64 rounds
    edges = [(i, i + 1) for i in range(63)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["comp"]
           for r in DD.connected_components_star(df).collect()}
    assert got == {i: 0 for i in range(64)}


def test_dedup_clusters_includes_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    edges = spark.createDataFrame([(1, 3), (3, 5)], "a long, b long")
    got = {r["doc_id"]: r["cluster"] for r in DD.dedup_clusters(docs, edges).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 1, 4: 4, 5: 1}


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


def py_grams(text: str, n: int) -> set[str]:
    toks = _words(text)
    if len(toks) < n:
        return set()  # no full n-gram exists — short docs emit nothing
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_mark_contaminated_matches_python(spark):
    train = {
        0: "alpha beta gamma delta epsilon zeta eta theta",
        1: "totally clean document with unique words here",
        2: "prefix words then alpha beta gamma delta epsilon tail",
        3: "",
    }
    evals = {100: "alpha beta gamma delta epsilon", 101: "quick brown fox jumps over"}
    eg = set().union(*(py_grams(t, 5) for t in evals.values()))
    want = {}
    for i, t in train.items():
        n_overlap = len(py_grams(t, 5) & eg)
        want[i] = (n_overlap, n_overlap > 0)
    tdf = spark.createDataFrame(list(train.items()), "doc_id long, text string")
    edf = spark.createDataFrame(list(evals.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_overlap"], r["contaminated"])
        for r in DD.mark_contaminated(tdf, edf, n=5).collect()
    }
    assert got == want
    assert got[0][1] and got[2][1] and not got[1][1]


def test_mark_contaminated_short_docs_never_flagged(spark):
    # a doc shorter than n words shares NO full n-gram with anything —
    # without the size(toks) >= n guard, two short docs sharing their
    # single partial (< n-word) gram were falsely flagged
    tdf = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "alpha beta gamma delta epsilon")],
        "doc_id long, text string",
    )
    edf = spark.createDataFrame(
        [(100, "alpha beta gamma"), (101, "alpha beta gamma delta epsilon")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_overlap"], r["contaminated"])
        for r in DD.mark_contaminated(tdf, edf, n=5).collect()
    }
    # doc 0 (3 words) emits no 5-gram despite eval doc 100 being identical;
    # doc 1 shares its full 5-gram with eval doc 101
    assert got == {0: (0, False), 1: (1, True)}


# ---------------------------------------------------------------------------
# repetition profile
# ---------------------------------------------------------------------------


def py_repetition(text: str):
    toks = _words(text)
    n = len(toks)
    grams = [" ".join(toks[i : i + 2]) for i in range(max(n - 1, 1))] if n >= 2 else []
    dup = round(1.0 - len(set(grams)) / len(grams), 4) if grams else 0.0
    top = round(max(toks.count(w) for w in set(toks)) / n, 4) if toks else 0.0
    return n, dup, top


def test_repetition_profile_matches_python(spark):
    docs = {
        0: "spam spam spam spam spam spam",
        1: "all words are unique in this one document",
        2: "a b a b a b a b",
        3: "",
        4: "single",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_words"], r["dup_2gram_frac"], r["top_word_frac"])
        for r in T.repetition_profile(df).collect()
    }
    want = {i: py_repetition(t) for i, t in docs.items()}
    assert got == want
    assert got[0][1] >= 0.8 and got[1][1] == 0.0


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------


def test_redact_pii_matches_python_re(spark):
    rows = [
        (0, "mail bob.smith+x@corp.example.org now"),
        (1, "server at 192.168.0.1 answered"),
        (2, "call 555-123-4567 or 555.987.6543 today"),
        (3, "mixed alice@a.io via 10.0.0.2 tel 111-222-3333"),
        (4, "no pii here at all"),
        (5, "not-a-phone 12-345-6789 and version 1.2.3 stay"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["red"] for r in
           df.select("doc_id", T.redact_pii(F.col("text")).alias("red")).collect()}
    for i, t in rows:
        expect = t
        for pat, repl in T.PII_PATTERNS:
            expect = re.sub(pat, repl, expect)
        assert got[i] == expect, (i, got[i], expect)
    assert got[3] == "mixed <EMAIL> via <IP> tel <PHONE>"
    assert got[4] == "no pii here at all"


# ---------------------------------------------------------------------------
# top terms
# ---------------------------------------------------------------------------


def test_top_terms_matches_python(spark):
    docs = {
        0: "apple apple apple banana cherry",
        1: "banana banana cherry cherry cherry",
        2: "apple zebra zebra zebra zebra",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["tf"], r["doc_freq"])
        for r in T.top_terms(df, k=2).collect()
    }
    # python oracle
    tf = {(i, w): _words(t).count(w) for i, t in docs.items() for w in set(_words(t))}
    dfreq = {}
    for (_, w) in tf:
        dfreq[w] = dfreq.get(w, 0) + 1
    want = {}
    for i in docs:
        terms = sorted(
            {w for (j, w) in tf if j == i},
            key=lambda w: (-tf[(i, w)], dfreq[w], w),
        )
        for rank, w in enumerate(terms[:2], 1):
            want[(i, rank)] = (w, tf[(i, w)], dfreq[w])
    assert got == want
    assert got[(0, 1)][0] == "apple"
    assert got[(2, 1)][0] == "zebra"


# ---------------------------------------------------------------------------
# portable ANN twins
# ---------------------------------------------------------------------------


def _py_quant(vec, scale=1000):
    import decimal

    out = []
    for x in vec:
        # mirror Spark: multiply in DOUBLE first, then HALF_UP on that double
        d = decimal.Decimal(float(x) * float(scale))
        out.append(int(d.quantize(0, rounding=decimal.ROUND_HALF_UP)))
    return out


@pytest.fixture(scope="module")
def emb_df(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    base = rng.standard_normal((6, 8)).astype("float32")
    rows = []
    for i in range(48):
        v = base[i % 6] + rng.standard_normal(8).astype("float32") * 0.05
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), rows


def test_topk_lsh_portable_matches_python(spark, emb_df):
    df, rows = emb_df
    signs = SIM._portable_signs(8, 8)
    q = {i: _py_quant(v) for i, v in rows}
    buckets = {
        i: sum(
            (1 << p)
            for p in range(8)
            if sum(s * x for s, x in zip(signs[p], qv)) > 0
        )
        for i, qv in q.items()
    }
    cand = [i for i in q if buckets[i] == buckets[0]]
    scores = sorted(
        ((sum(a * b for a, b in zip(q[i], q[0])), i) for i in cand),
        key=lambda t: (-t[0], t[1]),
    )
    want = [(i, s) for s, i in scores[:10]]
    got = [
        (r["vec_id"], r["score"])
        for r in SIM.topk_lsh_portable(df, k=10, planes=8, dim=8).collect()
    ]
    assert got == want
    # the query collides with its own bucket (MIPS ranking may put longer
    # same-direction vectors above it, so membership, not first place)
    assert 0 in {i for i, _ in got}


def test_topk_ivf_portable_matches_python(spark, emb_df):
    df, rows = emb_df
    q = {i: _py_quant(v) for i, v in rows}
    cents = {i: q[i] for i in range(4)}

    def l2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    cells = {i: min((l2(qv, cv), c) for c, cv in cents.items())[1] for i, qv in q.items()}
    probes = [c for _, c in sorted((l2(q[0], cv), c) for c, cv in cents.items())[:2]]
    cand = [i for i in q if cells[i] in probes]
    want = sorted(((l2(q[i], q[0]), i) for i in cand))[:10]
    want = [(i, d) for d, i in want]
    got = [
        (r["vec_id"], r["dist"])
        for r in SIM.topk_ivf_portable(df, k=10, n_centroids=4, nprobe=2).collect()
    ]
    assert got == want
    assert got[0] == (0, 0)


# ---------------------------------------------------------------------------
# C4-style cross-corpus line dedup
# ---------------------------------------------------------------------------


def _line_dedup_oracle(docs, min_chars=10):
    """Independent pure-Python re-statement: first (doc_id, pos) per
    eligible line wins; short lines always kept."""
    seen = {}
    order = []
    for doc_id, text in sorted(docs):
        for pos, line in enumerate(text.split("\n")):
            order.append((doc_id, pos, line))
    keep = set()
    for doc_id, pos, line in sorted(order):
        if len(line.strip()) < min_chars:
            keep.add((doc_id, pos))
        elif line not in seen:
            seen[line] = (doc_id, pos)
            keep.add((doc_id, pos))
    out = {}
    for doc_id, text in docs:
        lines = text.split("\n")
        kept = [l for p, l in enumerate(lines) if (doc_id, p) in keep]
        out[doc_id] = ("\n".join(kept), len(lines), len(kept))
    return out


def test_line_dedup_corpus_matches_hand_oracle(spark):
    boiler = "subscribe to our newsletter for updates"
    legal = "all rights reserved by the example corporation"
    docs = [
        (1, f"unique opening line one\n{boiler}\nmore unique text here\nok"),
        (2, f"{boiler}\nanother document body line\n{legal}"),
        (3, f"{legal}\n{boiler}\nclosing remarks for doc three"),
        (4, "short\nok\n-\n"),                      # all-short: untouched
        (5, boiler),                                 # whole doc is boiler
        (6, f"{boiler}\n{boiler}"),                  # intra-doc repeat
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: (r["text_deduped"], r["n_lines"], r["n_lines_kept"])
           for r in DD.line_dedup_corpus(df).collect()}
    want = _line_dedup_oracle(docs)
    assert got == want
    # the first corpus occurrence (doc 1) keeps the boilerplate...
    assert boiler in got[1][0]
    # ...every later copy loses it
    assert boiler not in got[2][0] and boiler not in got[3][0]
    assert got[5][0] == "" and got[6] == ("", 2, 0)
    # short lines are never deduped even when repeated ("ok" in 1 and 4)
    assert got[4] == ("short\nok\n-\n", 4, 4)


def test_line_dedup_plan_is_window_free(spark):
    df = spark.createDataFrame([(1, "aaaaaaaaaaaa\nbbbbbbbbbbbb")],
                               "doc_id long, text string")
    plan = DD.line_dedup_corpus(df)._jdf.queryExecution().executedPlan().toString()
    # the scale contract: aggregation shapes (map-side partials), no
    # window over the line key
    assert "Window" not in plan
    assert "partial" in plan.lower()


# ---------------------------------------------------------------------------
# corpus snapshot diff
# ---------------------------------------------------------------------------

def test_corpus_diff_classifies_all_four_ways(spark):
    from smartcrawler_spark.plans import analysis as AN

    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "will vanish")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, "same"), (2, "changed!"), (4, "brand new")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["change"]
           for r in AN.corpus_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}
    summ = {r["change"]: r["n"]
            for r in AN.corpus_diff_summary(AN.corpus_diff(old, new)).collect()}
    assert summ == {"unchanged": 1, "changed": 1, "removed": 1, "added": 1}


def test_corpus_diff_custom_fingerprint(spark):
    from smartcrawler_spark.plans import analysis as AN

    # fingerprint on length only: text edits of equal length = unchanged
    old = spark.createDataFrame([(1, "aaaa")], "doc_id long, text string")
    new = spark.createDataFrame([(1, "bbbb")], "doc_id long, text string")
    got = AN.corpus_diff(old, new,
                         fingerprint=F.length("text").cast("string")
                         ).collect()
    assert got[0]["change"] == "unchanged"


def test_corpus_datacard_hand_oracle(spark):
    from smartcrawler_spark.plans.analysis import corpus_datacard

    rows = [
        ("a", "train", "en", 10), ("b", "train", "en", 20),
        ("c", "val", "en", 7), ("d", "train", "fr", 5),
    ]
    df = spark.createDataFrame(
        [(i, s, l, "x" * (t * 2), t) for (i, s, l, t) in rows],
        "doc_id string, split string, lang string, text string, n_tokens int")
    got = {(r["split"], r["lang"]): (r["n_docs"], r["total_tokens"],
                                     r["min_tokens"], r["max_tokens"],
                                     r["total_chars"], r["mean_tokens"])
           for r in corpus_datacard(df).collect()}
    assert got == {
        ("train", "en"): (2, 30, 10, 20, 60, 15),
        ("val", "en"): (1, 7, 7, 7, 14, 7),
        ("train", "fr"): (1, 5, 5, 5, 10, 5),
    }
