"""Hashed multinomial Naive-Bayes text classifier, integer-exact.

Model-based quality filtering is the step modern training-data
pipelines run after rule filters: FineWeb / DCLM score every document
with a cheap linear classifier (fastText-style) trained on a labeled
seed set and keep the high-scoring tail. This module is that filter as
two DataFrame stages with an INTEGER spec, so a DuckDB oracle can
replay every decision bit-exactly (same contract as operators/lm.py):

* training — hash each token into a fixed bucket space (hashing trick,
  vocabulary-free) and count per (label, bucket); one groupBy with
  map-side combine, shuffle bounded by labels x n_buckets regardless of
  corpus size, plus a label-keyed prior count.
* scoring — per document and label, add-one-smoothed log-likelihood in
  FLOOR-LOG2 space:

      bits(doc, label) = n_toks * floor_log2(N_label + B)      (norm)
                       - sum_tok floor_log2(c(label, h(tok)) + 1)
                       + floor_log2(D) - floor_log2(d_label)   (prior)

  where N_label = total tokens trained for the label, B = n_buckets,
  D / d_label = total / per-label training docs. Every term is a
  nonnegative integer; smaller bits = more label-like. floor_log2 is
  bit-length - 1 (see lm.py) — no transcendental whose last ulp could
  flip a gate hash. Quantization costs < 1 bit/token of resolution;
  ties break to the lexicographically first label, deterministically.

Bucketing is two-tier like dedup's hash twins: the production path uses
xxhash64 (JVM, vectorized); `portable=True` switches to a 3-hex-digit
md5 bucket (4096-slot space) expressible in both Spark SQL and DuckDB —
the gate/oracle path.

Scale shape: the model (labels x n_buckets counts + a labels-row prior)
is bounded and broadcast; documents explode to token rows map-side,
join the broadcast model, and re-aggregate per (doc, label) — one
partial-agg exchange. The seed corpus is never re-read at scoring time.

Reference context: the reference has no classifier (its quality gate is
structural dup-marking, /root/reference/src/storage.rs:139-149); this
is 100 TB pipeline breadth alongside lm.py and textops.gopher_rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import textops as T

_HEX = "0123456789abcdef"
_PORTABLE_SPACE = 4096  # 3 md5 hex digits
# dense-model scoring kernel guard: labels x n_buckets int64 cells the
# driver + every executor hold (1<<24 cells = 128 MB); above it the
# join-based plan is used instead
_DENSE_MODEL_MAX_CELLS = 1 << 24


def _bucket_expr(tok_col: str, n_buckets: int, portable: bool):
    """Token -> [0, n_buckets) bucket. Portable tier: first 3 md5 hex
    digits via instr('0123456789abcdef', .) — replayable in DuckDB with
    strpos; fast tier: xxhash64 pmod."""
    if not portable:
        return F.pmod(F.xxhash64(F.col(tok_col)), F.lit(n_buckets))
    if n_buckets > _PORTABLE_SPACE:
        raise ValueError(
            f"portable bucketing spans {_PORTABLE_SPACE} slots; "
            f"n_buckets={n_buckets} would leave empty buckets")
    digit = (f"(instr('{_HEX}', substr(md5({tok_col}), {{i}}, 1)) - 1)")
    return F.expr(
        f"({digit.format(i=1)} * 256 + {digit.format(i=2)} * 16 "
        f"+ {digit.format(i=3)}) % {n_buckets}"
    ).cast("long")


def _bucket_of(tok, n_buckets: int, portable: bool):
    """Column-level twin of `_bucket_expr` usable inside higher-order
    lambdas (the element has no SQL name to string-format). Identical
    values: the portable tier's 3-hex-digit value is conv(base16) of the
    md5 prefix — the same integer as the instr() digit arithmetic."""
    if not portable:
        return F.pmod(F.xxhash64(tok), F.lit(n_buckets))
    return F.conv(F.substring(F.md5(tok), 1, 3), 16, 10).cast("long") % n_buckets


def _token_rows(docs: DataFrame, id_cols: list[str], text_col: str,
                n_buckets: int, portable: bool) -> DataFrame:
    return (
        docs.select(*id_cols,
                    F.explode(T.word_tokens(F.col(text_col))).alias("_tok"))
        .select(*id_cols,
                _bucket_expr("_tok", n_buckets, portable).alias("bucket"))
    )


def nb_train(docs: DataFrame, label_col: str = "label",
             text_col: str = "text", n_buckets: int = _PORTABLE_SPACE,
             portable: bool = False) -> tuple[DataFrame, DataFrame]:
    """(feature counts, priors) from a labeled seed corpus.

    feats:  (label, bucket, c)       — hashed-token counts per label
    priors: (label, n_docs, n_tokens) — per-label document/token mass

    Both all-integer and bounded by labels x n_buckets (+ labels rows):
    the model artifact a 1000-executor scoring job broadcasts."""
    lab = F.col(label_col).alias("label")
    # count per DISTINCT (label, token) first — the map-side-combined
    # exchange carries vocabulary-sized rows, and the bucket hash runs
    # once per distinct token instead of once per token OCCURRENCE
    # (guide §2.3 "aggregate before you shuffle"; corpus token count /
    # vocabulary size is the saved factor). Summing the counts per
    # (label, bucket) afterwards is the same integer total.
    toks = docs.select(
        lab, F.explode(T.word_tokens(F.col(text_col))).alias("_tok"))
    feats = (
        toks.groupBy("label", "_tok").agg(F.count(F.lit(1)).alias("_n"))
        .select("label",
                _bucket_expr("_tok", n_buckets, portable).alias("bucket"),
                "_n")
        .groupBy("label", "bucket").agg(F.sum("_n").alias("c"))
    )
    priors = (
        docs.select(lab, F.size(T.word_tokens(F.col(text_col))).alias("_n"))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("_n").cast("long").alias("n_tokens"))
    )
    return feats, priors


def _floor_log2(col):
    return (F.length(F.bin(col.cast("long"))) - 1).cast("long")


def nb_score_bits(docs: DataFrame, feats: DataFrame, priors: DataFrame,
                  n_buckets: int = _PORTABLE_SPACE, id_col: str = "doc_id",
                  text_col: str = "text", portable: bool = False,
                  broadcast_model: bool = True) -> DataFrame:
    """(id, label, n_toks, bits) for every doc x trained label — the
    integer NB surprisal of the module docstring; smaller = more
    label-like. Token-less docs keep their rows (prior-only bits), the
    no-silent-disappearance contract shared with lm_score_bits.

    Default path (broadcast_model=True, model under
    _DENSE_MODEL_MAX_CELLS): the bounded model is collected into a dense
    (n_buckets x labels) int64 evidence matrix and broadcast; documents
    compute their token-bucket arrays map-side (HOF transform — no
    explode, no shuffle) and a vectorized numpy kernel gather-sums the
    evidence per label. All arithmetic stays int64, bit-identical to the
    join plan (pytest-proven equality); the corpus is never exchanged
    and the old token⋈model join's |tokens| x |labels| intermediate
    (the r5 bench's 13.5M-row stage) disappears. broadcast_model=False
    keeps the pure-DataFrame join plan (the model-too-big-to-collect
    regime)."""
    if broadcast_model:
        pri_rows = priors.select("label", "n_docs", "n_tokens").collect()
        if len(pri_rows) * n_buckets <= _DENSE_MODEL_MAX_CELLS:
            return _nb_score_bits_dense(docs, feats, pri_rows, n_buckets,
                                        id_col, text_col, portable)
    if broadcast_model:
        feats, priors = F.broadcast(feats), F.broadcast(priors)
    total_docs = priors.select(
        F.sum("n_docs").cast("long").alias("_total_docs"))
    pri = (
        priors.crossJoin(F.broadcast(total_docs))
        .select(
            "label",
            (_floor_log2(F.col("n_tokens") + F.lit(int(n_buckets)))
             ).alias("_norm_per_tok"),
            (_floor_log2(F.col("_total_docs"))
             - _floor_log2(F.col("n_docs"))).alias("_prior_bits"),
        )
    )
    base = docs.select(
        F.col(id_col).alias("_id"),
        F.size(T.word_tokens(F.col(text_col))).cast("long").alias("n_toks"),
    ).crossJoin(F.broadcast(pri) if broadcast_model else pri)
    evid = (
        _token_rows(docs.select(F.col(id_col).alias("_id"), text_col),
                    ["_id"], text_col, n_buckets, portable)
        .join(feats, "bucket")  # broadcast: every label's count per token
        .select("_id", "label", _floor_log2(F.col("c") + 1).alias("_e"))
        .groupBy("_id", "label")
        .agg(F.sum("_e").alias("_evidence"))
    )
    return (
        base.join(evid, ["_id", "label"], "left")
        .select(
            F.col("_id").alias(id_col), "label", "n_toks",
            (F.col("n_toks") * F.col("_norm_per_tok")
             - F.coalesce(F.col("_evidence"), F.lit(0))
             + F.col("_prior_bits")).alias("bits"),
        )
    )


def _floor_log2_py(v: int) -> int:
    return int(v).bit_length() - 1


def _nb_score_bits_dense(docs: DataFrame, feats: DataFrame, pri_rows,
                         n_buckets: int, id_col: str, text_col: str,
                         portable: bool) -> DataFrame:
    """Dense broadcast-matrix scoring kernel (see nb_score_bits). The
    model is bounded by contract (labels x n_buckets); collecting it is
    the same driver traffic as the broadcast the join plan shipped."""
    import numpy as np

    pri_rows = sorted(pri_rows, key=lambda r: str(r["label"]))
    labels = [r["label"] for r in pri_rows]
    n_labels = len(labels)
    spark = docs.sparkSession
    id_type = docs.schema[id_col].dataType.simpleString()

    if n_labels == 0:  # no trained labels -> no rows (docs x empty dim)
        return (docs.select(F.col(id_col),
                            F.lit(None).cast("string").alias("label"),
                            F.lit(0).cast("long").alias("n_toks"),
                            F.lit(0).cast("long").alias("bits"))
                .where(F.lit(False)))

    total_docs = sum(int(r["n_docs"]) for r in pri_rows)
    npt = [_floor_log2_py(int(r["n_tokens"]) + n_buckets) for r in pri_rows]
    pb = [_floor_log2_py(total_docs) - _floor_log2_py(int(r["n_docs"]))
          for r in pri_rows]
    lab_idx = {lab: i for i, lab in enumerate(labels)}

    ev_mat = np.zeros((n_buckets, n_labels), dtype=np.int64)
    for r in feats.select("label", "bucket", "c").collect():
        i = lab_idx.get(r["label"])
        b = r["bucket"]
        if i is not None and 0 <= b < n_buckets:  # out-of-range buckets
            ev_mat[b, i] = _floor_log2_py(int(r["c"]) + 1)  # never match
    b_ev = spark.sparkContext.broadcast(ev_mat)

    toks = T.word_tokens(F.col(text_col))
    sel = docs.select(
        F.col(id_col).alias("_id"),
        F.size(toks).cast("long").alias("n_toks"),
        F.transform(toks, lambda t: _bucket_of(t, n_buckets, portable))
        .alias("_bk"),
    )

    def _score(batches):
        import pandas as pd

        E = b_ev.value
        nl = E.shape[1]
        for pdf in batches:
            bl = pdf["_bk"]
            lens = np.fromiter(
                (0 if b is None else len(b) for b in bl), np.int64,
                count=len(bl))
            total = int(lens.sum())
            if total == 0:
                ev = np.zeros((len(bl), nl), dtype=np.int64)
            else:
                flat = np.concatenate(
                    [np.asarray(b, dtype=np.int64)
                     for b in bl if b is not None and len(b)])
                csum = np.vstack([np.zeros((1, nl), np.int64),
                                  np.cumsum(E[flat], axis=0, dtype=np.int64)])
                off = np.zeros(len(bl) + 1, np.int64)
                np.cumsum(lens, out=off[1:])
                ev = csum[off[1:]] - csum[off[:-1]]
            yield pd.DataFrame({"_id": pdf["_id"],
                                "n_toks": pdf["n_toks"],
                                "_ev": list(ev)})

    mapped = sel.mapInPandas(
        _score, schema=f"_id {id_type}, n_toks long, _ev array<bigint>")

    lab_lit = F.array(*[F.lit(lab) for lab in labels])
    npt_lit = F.array(*[F.lit(int(v)) for v in npt])
    pb_lit = F.array(*[F.lit(int(v)) for v in pb])
    per_label = F.transform(
        F.sequence(F.lit(1), F.lit(n_labels)),
        lambda i: F.struct(
            F.element_at(lab_lit, i).alias("label"),
            (F.col("n_toks") * F.element_at(npt_lit, i)
             - F.element_at(F.col("_ev"), i)
             + F.element_at(pb_lit, i)).cast("long").alias("bits"),
        ),
    )
    return (
        mapped.select(F.col("_id").alias(id_col), "n_toks",
                      F.explode(per_label).alias("_s"))
        .select(id_col, F.col("_s.label").alias("label"), "n_toks",
                F.col("_s.bits").alias("bits"))
    )


def nb_predict(scored: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """argmin-bits label per doc, ties to the lexicographically first
    label: (id, pred_label, bits). One hash agg (min over a (bits,
    label) struct — no window, no extra shuffle beyond the groupBy)."""
    best = (
        scored.groupBy(id_col)
        .agg(F.min(F.struct("bits", "label")).alias("_b"))
    )
    return best.select(
        id_col,
        F.col("_b.label").alias("pred_label"),
        F.col("_b.bits").alias("bits"),
    )
