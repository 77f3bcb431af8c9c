"""Bigram language-model quality scoring, integer-exact (CCNet-style).

CCNet (Wenzek et al. 2020) buckets web documents by the perplexity of a
KenLM n-gram model trained on a trusted corpus — low-perplexity text is
"head" quality, high-perplexity is noise.  This module is the same
filter re-expressed as two DataFrame stages with an INTEGER spec:

* training: unigram + bigram counts over a reference corpus — one
  groupBy each (map-side combine; the token-keyed shuffle carries Zipf
  skew, but counts are a sum so partial aggregation flattens it).
* scoring: each candidate doc's bigrams are joined against the count
  tables and charged add-one-smoothed surprisal in FLOOR-LOG2 space,

      bits(w1 w2) = floor_log2(c(w1) + V) - floor_log2(c(w1, w2) + 1)

  a per-bigram integer >= 0 (larger = more surprising), since
  c12 <= c1 and V >= 1.  floor_log2(n) = length(bin(n)) - 1, integer-
  exact on every engine — no transcendental ln whose last ulp could
  flip a gate hash.  Doc score = total bits plus milli-bits-per-bigram
  (mbits = 1000 * bits // n_bigrams), the length-normalized rank key;
  quantizing log2 to its floor costs < 1 bit per bigram of resolution,
  which re-orders only near-ties while keeping every column integral.

Scale shape: the candidate corpus explodes to bigram rows once, joins
the (vocab-sized) count dims on their natural keys — broadcast when the
model is small, shuffled hash otherwise — and re-aggregates per doc.
The reference corpus is never re-read at scoring time; ship the two
count tables like any other model artifact.

Reference context: the reference has no LM filter (its quality gate is
structural dup-marking, /root/reference/src/storage.rs:139-149); this
is pipeline breadth for the 100 TB training-data use case, alongside
textops.gopher_rules / c4_line_filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import textops as T


def _bigram_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — one row per adjacent token pair, tokenizer shared
    with every other text operator (textops.word_tokens)."""
    toks = T.word_tokens(F.col(text_col))
    pairs = F.arrays_zip(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
    )
    return (
        df.select(F.col(id_col).alias("_id"), F.explode(pairs).alias("p"))
        .select("_id", F.col("p.0").alias("w1"), F.col("p.1").alias("w2"))
    )


def unigram_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """LM training, unigram side: (w1, c1) token counts over the
    reference corpus. One groupBy with map-side combine."""
    return (
        df.select(F.explode(T.word_tokens(F.col(text_col))).alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )


def bigram_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """LM training, bigram side: (w1, w2, c12) adjacent-pair counts over
    the reference corpus. One groupBy with map-side combine."""
    return (
        _bigram_rows(df.withColumn("_one", F.lit(1)), "_one", text_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )


def _floor_log2(col):
    """floor(log2(col)) for col >= 1, integer-exactly (bit length - 1)."""
    return (F.length(F.bin(col.cast("long"))) - 1).cast("long")


def lm_score_bits(docs: DataFrame, unigrams: DataFrame, bigrams: DataFrame,
                  vocab_size: int, id_col: str = "doc_id",
                  text_col: str = "text",
                  broadcast_model: bool = True) -> DataFrame:
    """Score every doc with the add-one-smoothed bigram LM in floor-log2
    space (module docstring): output (id, n_bigrams, bits, mbits) —
    all integer; smaller mbits = more reference-corpus-like. Docs with
    no bigram (0- or 1-token text) score n_bigrams=0, bits=0, mbits
    NULL (no evidence — callers decide their fate, same contract as
    textops.quality_features on blank text).

    `vocab_size` is the unigram table's row count (the add-one
    denominator mass); pass it in rather than recounting per call so
    scoring stays a pure plan."""
    uni = unigrams.select("w1", "c1")
    big = bigrams.select("w1", "w2", "c12")
    if broadcast_model:
        uni, big = F.broadcast(uni), F.broadcast(big)
    pairs = _bigram_rows(docs, id_col, text_col)
    scored = (
        pairs.join(big, ["w1", "w2"], "left")
        .join(uni, "w1", "left")
        .select(
            "_id",
            (
                _floor_log2(F.coalesce(F.col("c1"), F.lit(0))
                            + F.lit(int(vocab_size)))
                - _floor_log2(F.coalesce(F.col("c12"), F.lit(0)) + F.lit(1))
            ).alias("_bits"),
        )
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("_bits").alias("bits"),
        )
    )
    # left join back so bigram-less docs keep a row (score of "no
    # evidence", not silent disappearance)
    base = docs.select(F.col(id_col).alias("_id")).distinct()
    return (
        base.join(scored, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.coalesce(F.col("bits"), F.lit(0)).alias("bits"),
            F.when(
                F.col("n_bigrams").isNotNull() & (F.col("n_bigrams") > 0),
                F.floor(F.col("bits") * F.lit(1000) / F.col("n_bigrams")),
            ).cast("long").alias("mbits"),
        )
    )


def lm_filter(scored: DataFrame, max_mbits: int,
              keep_unscored: bool = False) -> DataFrame:
    """The CCNet-style gate over `lm_score_bits` output: keep docs at or
    below `max_mbits` milli-bits per bigram. `keep_unscored` decides the
    no-evidence rows (mbits NULL)."""
    cond = F.col("mbits") <= max_mbits
    if keep_unscored:
        cond = cond | F.col("mbits").isNull()
    return scored.filter(cond)


def lm_buckets(scored: DataFrame, head_max_mbits: int,
               middle_max_mbits: int) -> DataFrame:
    """CCNet's head/middle/tail split over `lm_score_bits` output: docs
    at or below `head_max_mbits` are 'head' (most reference-like),
    at or below `middle_max_mbits` 'middle', the rest 'tail'; docs with
    no evidence (mbits NULL) are 'unscored'. Thresholds are integers —
    derive them from a corpus sample's mbits quantiles driver-side
    (CCNet uses the 1/3 and 2/3 perplexity cuts) and pin them in config
    so the split is reproducible across runs."""
    bucket = (
        F.when(F.col("mbits").isNull(), F.lit("unscored"))
        .when(F.col("mbits") <= head_max_mbits, F.lit("head"))
        .when(F.col("mbits") <= middle_max_mbits, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return scored.withColumn("lm_bucket", bucket)
