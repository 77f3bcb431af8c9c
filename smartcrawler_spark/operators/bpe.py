"""Distributed BPE tokenizer training + application.

Byte-pair encoding (Sennrich et al. 2016) is the vocabulary step every
LLM training pipeline runs over its cleaned corpus. The classic
formulation is sequential, but its state factors exactly the way Spark
wants:

* the corpus collapses ONCE to a (word, n) count table — BPE statistics
  are invariant to where words occur, so all further work happens on
  vocab-cardinality rows (10^6-ish), not corpus rows (10^10);
* each merge step is: explode adjacent symbol pairs weighted by word
  count -> one groupBy(pair) sum -> argmax (count desc, then pair
  lexicographic — a DETERMINISTIC tie-break, where reference BPE
  implementations silently inherit dict order) -> rewrite the symbol
  arrays with that pair fused.  The rewrite is a pure JVM
  `aggregate` fold over each word's symbol array — no Python in the
  loop, no shuffle beyond the pair-count groupBy;
* the merge list (the trained artifact) is tiny and driver-side, like
  any model. `apply_bpe` segments new text with it via an
  Arrow-batched pandas UDF (the per-token merge loop is inherently
  sequential per word — the sanctioned custom-kernel path).

Scale shape: training touches the corpus exactly once (word counts);
each of the k merge iterations is one map + one partial-agg shuffle
over the vocab table + a 1-row collect. k jobs of vocab-sized work —
the same plan at sf0.001 and at 100 TB.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import textops as T

END = "</w>"  # end-of-word sentinel, per the original BPE formulation


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (word, n) counts, the only corpus-sized pass in BPE
    training. Tokenizer shared with every text operator
    (textops.word_tokens)."""
    return (
        df.select(F.explode(T.word_tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _initial_symbols() -> F.Column:
    """word -> array of single characters + the </w> sentinel."""
    return F.concat(
        F.split(F.col("word"), ""), F.array(F.lit(END))
    )


def _pair_counts(seg: DataFrame) -> DataFrame:
    """(a, b, cnt): adjacent symbol pairs over the segmentation table,
    weighted by word count. transform+explode then one partial-agg
    groupBy."""
    syms = F.col("syms")
    pairs = F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("a"),
                F.element_at(syms, i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    return (
        seg.select(F.col("n"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("n").alias("cnt"))
    )


def initial_pair_counts(counts: DataFrame) -> DataFrame:
    """(a, b, cnt): the character-pair statistics of merge iteration 0 —
    the oracle-expressible face of the training loop (each later
    iteration is the same plan over the rewritten symbol table)."""
    return _pair_counts(
        counts.select("word", "n", _initial_symbols().alias("syms"))
    )


def _merge_expr(a: str, b: str) -> F.Column:
    """Fuse every adjacent (a, b) into a+b inside the syms array — a pure
    JVM left fold (greedy leftmost-first, matching sequential BPE)."""
    # the fold is exactly the sequential kernel's greed: once a pair
    # fuses, the accumulator's last element becomes a+b, which can never
    # equal a again, so overlapping matches (aaa with merge a,a -> aa a)
    # resolve leftmost-first on both paths
    merged = F.lit(a + b)
    return F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe(spark: SparkSession, counts: DataFrame, num_merges: int,
              min_pair_count: int = 2) -> tuple[list[tuple[str, str]],
                                                DataFrame]:
    """Learn `num_merges` BPE merges from a (word, n) count table.
    Returns (merges, final_segmentation): merges in learned order, and
    the (word, n, syms) table after all merges (useful for vocab
    extraction / inspection). Stops early when no pair reaches
    `min_pair_count`.

    Deterministic: ties on count break lexicographically on (a, b)."""
    seg = counts.select("word", "n", _initial_symbols().alias("syms"))
    seg = seg.localCheckpoint()  # truncate lineage at the fold-in point
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        top = (
            _pair_counts(seg)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_pair_count:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        seg = seg.select("word", "n", _merge_expr(a, b).alias("syms"))
        # k nested folds would stack k HOFs into one expression tree;
        # checkpoint keeps each iteration's plan flat and re-runnable
        seg = seg.localCheckpoint()
    return merges, seg


def bpe_segment_py(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Sequential reference segmentation (also the pandas-UDF kernel):
    apply the merge list in learned order, leftmost-first within each."""
    syms = list(word) + [END]
    for a, b in merges:
        out: list[str] = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        syms = out
    return syms


def apply_bpe(df: DataFrame, merges: list[tuple[str, str]],
              text_col: str = "text",
              out_col: str = "bpe_tokens") -> DataFrame:
    """Segment every document's tokens with a trained merge list —
    Arrow-batched mapInPandas-free pandas UDF over the tokens array
    (the per-word merge loop is order-dependent; vectorized transfer,
    scalar kernel — the sanctioned custom-op path)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    mlist = list(merges)

    @pandas_udf(ArrayType(StringType()))
    def seg_udf(tokens: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def one(toks):
            out = []
            for w in (toks if toks is not None else []):
                got = cache.get(w)
                if got is None:
                    got = cache[w] = bpe_segment_py(w, mlist)
                out.extend(got)
            return out

        return tokens.map(one)

    return df.withColumn(out_col, seg_udf(T.word_tokens(F.col(text_col))))


def bpe_vocab(seg: DataFrame) -> DataFrame:
    """(token, n_words, total_n): the symbol vocabulary implied by a
    segmentation table — token frequency weighted by word counts. One
    explode + groupBy."""
    return (
        seg.select("n", F.explode("syms").alias("token"))
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n").alias("total_n"),
        )
    )
