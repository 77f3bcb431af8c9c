"""Inverted index over the corpus: positional posting lists + query ops.

The retrieval-side complement of functions/textops.top_terms: instead of
ranking terms per document, materialize the term -> documents map a
search / retrieval-augmented pipeline consumes.  Output row per term:

    (term, doc_freq, total_tf,
     postings: array<struct<doc_id, tf, positions: array<int>>>)

postings sorted by doc_id, positions sorted ascending (0-based token
offsets from the same whitespace tokenizer every text operator here
uses, textops.word_tokens — one tokenizer, one vocabulary).

Plan shape / 100 TB design:
* posexplode -> (term, doc) partial agg -> term agg: two shuffles, both
  with map-side combine; the first keys on (term, doc_id) so it spreads
  a hot term across all docs' reducers, the second keys on term alone.
* the term-keyed shuffle is where Zipf skew lives: stopword-grade terms
  own posting lists the size of the corpus.  ``max_df`` drops them at
  the (term, doc) stage — BEFORE the term shuffle — which is both the
  standard IR stoplist and the skew control (same discipline as the
  df_cap in operators/dedup.ngram_jaccard_pairs).  With max_df bounded,
  per-term state is bounded and no reducer can be handed an unbounded
  collect_list.
* queries never re-touch the corpus: conjunctive_docs / phrase_docs run
  on the index alone, exploding only the k requested terms' postings
  (an index-partition-pruned read when the index is stored partitioned
  by a term hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import textops as T


def inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_df: int | None = None,
) -> DataFrame:
    """Build the positional inverted index.

    ``min_df`` / ``max_df`` bound document frequency inclusively; terms
    outside the band are dropped (max_df is the stoplist/skew cap —
    enforced before the term-level shuffle, see module docstring).
    """
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(T.word_tokens(F.col(text_col))).alias("pos", "term"),
    )
    per_doc = tok.groupBy("term", "doc_id").agg(
        F.count("*").alias("tf"),
        F.sort_array(F.collect_list("pos")).alias("positions"),
    )
    if max_df is not None or min_df > 1:
        # document frequency is countable from the (term, doc) rows with a
        # vocabulary-sized agg; filtering here keeps capped terms out of
        # the term-keyed shuffle entirely
        dfreq = per_doc.groupBy("term").agg(F.count("*").alias("_df"))
        if min_df > 1:
            dfreq = dfreq.filter(F.col("_df") >= min_df)
        if max_df is not None:
            dfreq = dfreq.filter(F.col("_df") <= max_df)
        per_doc = per_doc.join(dfreq.select("term"), "term")
    return (
        per_doc.groupBy("term")
        .agg(
            F.count("*").alias("doc_freq"),
            F.sum("tf").alias("total_tf"),
            F.sort_array(
                F.collect_list(F.struct("doc_id", "tf", "positions"))
            ).alias("postings"),
        )
    )


def postings_of(index: DataFrame, terms: list[str]) -> DataFrame:
    """Explode the requested terms' posting lists to flat match rows:
    (term, doc_id, tf, positions)."""
    return (
        index.filter(F.col("term").isin(list(terms)))
        .select("term", F.explode("postings").alias("p"))
        .select(
            "term",
            F.col("p.doc_id").alias("doc_id"),
            F.col("p.tf").alias("tf"),
            F.col("p.positions").alias("positions"),
        )
    )


def conjunctive_docs(index: DataFrame, terms: list[str]) -> DataFrame:
    """AND query: doc_ids containing ALL of ``terms`` (posting-list
    intersection as a group-count over the k exploded lists)."""
    uniq = sorted(set(terms))
    return (
        postings_of(index, uniq)
        .groupBy("doc_id")
        .agg(F.count_distinct("term").alias("_n"))
        .filter(F.col("_n") == len(uniq))
        .select("doc_id")
    )


def phrase_docs(index: DataFrame, first: str, second: str) -> DataFrame:
    """Adjacent-bigram phrase query from positions alone: doc_ids where
    ``first`` is immediately followed by ``second``.

    JVM-side adjacency test: shift the first term's positions by +1 and
    intersect with the second's (arrays_overlap) — no re-scan of text.
    """
    a = postings_of(index, [first]).select(
        "doc_id", F.col("positions").alias("pa")
    )
    b = postings_of(index, [second]).select(
        "doc_id", F.col("positions").alias("pb")
    )
    return (
        a.join(b, "doc_id")
        .filter(
            F.arrays_overlap(
                F.transform("pa", lambda p: p + F.lit(1)), F.col("pb")
            )
        )
        .select("doc_id")
    )


def cooccurrence_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
    min_pair_count: int = 1,
) -> DataFrame:
    """Document-level term co-occurrence: (term_a, term_b, n_docs) for
    every unordered pair of DISTINCT terms appearing in the same document
    (term_a < term_b), counted once per document.

    Integer-exact corpus statistics — the count table PMI / word-vector /
    topic pipelines start from.  Plan: distinct (doc, term) -> per-doc
    self-join (term_a < term_b) -> pair-keyed agg with map-side combine.
    The per-doc pairing is quadratic in the doc's distinct vocabulary, and
    corpus-wide the Zipf head makes stopword x stopword the dominant
    pairs; ``max_df`` drops high-document-frequency terms BEFORE pairing
    (one vocabulary-sized agg + semi-join), which bounds both the blowup
    and the skew — identical role to max_df in ``inverted_index`` and
    df_cap in dedup.ngram_jaccard_pairs.
    """
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(T.word_tokens(F.col(text_col))).alias("term"),
    ).distinct()
    if max_df is not None:
        keep = (
            tok.groupBy("term").agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_df).select("term")
        )
        tok = tok.join(keep, "term").select("doc_id", "term")
    a = tok.select("doc_id", F.col("term").alias("term_a"))
    b = tok.select("doc_id", F.col("term").alias("term_b"))
    pairs = a.join(b, "doc_id").filter(F.col("term_a") < F.col("term_b"))
    out = pairs.groupBy("term_a", "term_b").agg(
        F.count("*").alias("n_docs")
    )
    if min_pair_count > 1:
        out = out.filter(F.col("n_docs") >= min_pair_count)
    return out


def doc_lengths(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, dl) token counts from the shared tokenizer — the length
    normalization BM25 needs. One map-side pass, one tiny agg."""
    # null text -> 0 tokens, not a null/-1 size: N and avgdl must count
    # every document or idf drifts from the corpus it describes
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.greatest(
            F.coalesce(F.size(T.word_tokens(F.col(text_col))), F.lit(0)),
            F.lit(0),
        ).alias("dl"),
    )


def bm25_topk(
    index: DataFrame,
    lengths: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    broadcast_postings: bool | None = None,
    broadcast_max_postings: int = 5_000_000,
) -> DataFrame:
    """BM25-ranked top-k documents for a bag-of-terms query, computed
    from the inverted index + a (doc_id, dl) lengths table — the corpus
    text is never re-read.

    Uses the Lucene/standard formulation:
        idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
        score(d)    = sum_t idf(t) * tf * (k1+1)
                              / (tf + k1 * (1 - b + b * dl / avgdl))
    N and avgdl come from the lengths table (one scalar agg). Ties break
    by doc_id asc so the output is deterministic.

    Plan: explode only the |query| requested terms' postings (partition-
    prunable on a term-bucketed index), join the (doc_id, dl) dim on
    doc_id, one groupBy(doc_id) sum, TakeOrdered k. Float scores are for
    RANKING only — gates/oracles should compare the returned doc set /
    order, not the raw score column (float cross-engine hashes diverge;
    same policy as top_terms' integer-exact ordering).
    """
    stats = lengths.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = stats["n"], stats["avgdl"]
    if not n_docs:
        return lengths.select(
            F.col("doc_id"), F.lit(0.0).alias("score")
        ).limit(0)
    uniq_terms = list(dict.fromkeys(terms))
    matches = postings_of(index, uniq_terms)
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("doc_freq") + F.lit(0.5))
        / (F.col("doc_freq") + F.lit(0.5))
    )
    # matches (the |query| terms' postings) is usually the SMALL side vs
    # the corpus-sized lengths dim — but on an index built without max_df
    # a stopword-grade query term has a corpus-sized posting list, and
    # forcing that broadcast would OOM at the 10^10-doc design point.
    # Auto mode probes the terms' summed doc_freq (a |query|-row lookup
    # against the vocab-keyed term dim) and only hints broadcast when it
    # fits; otherwise the planner picks a shuffled hash join.
    if broadcast_postings is None:
        probed = (
            index.filter(F.col("term").isin(uniq_terms))
            .agg(F.sum("doc_freq").alias("s"))
            .collect()[0]["s"]
        )
        broadcast_postings = (probed or 0) <= broadcast_max_postings
    joined = matches.join(index.select("term", "doc_freq"), "term")
    if broadcast_postings:
        joined = F.broadcast(joined)
    with_df = lengths.join(joined, "doc_id")
    contrib = (
        idf
        * (F.col("tf") * (F.lit(k1) + 1.0))
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(float(avgdl)))
        )
    )
    return (
        with_df.select("doc_id", contrib.alias("_c"))
        .groupBy("doc_id")
        .agg(F.sum("_c").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def merge_index(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Merge two inverted indexes over DISJOINT document sets (the
    incremental-ingestion shape: yesterday's index + today's batch's
    index). Posting lists concatenate and re-sort; doc_freq/total_tf
    add. One union + one term-keyed agg — the corpus is never re-read.

    Disjointness is the caller's contract (dedup the delta against the
    base corpus first — operators/dedup.dedup_against_corpus); if a
    doc_id appears on both sides its postings would double-count.
    """
    both = base.unionByName(delta)
    return both.groupBy("term").agg(
        F.sum("doc_freq").alias("doc_freq"),
        F.sum("total_tf").alias("total_tf"),
        F.sort_array(F.flatten(F.collect_list("postings"))).alias("postings"),
    )
