"""Main-content extraction (boilerplate removal) over the node model.

The reference strips boilerplate only indirectly — cross-page duplicate
subtrees get content-replaced (/root/reference/src/storage.rs:139-149,
html_parser.rs:204-229). This module adds the single-page complement a
training-data pipeline needs before quality scoring: a jusText/
Boilerpipe-style block classifier over the flattened pre-order `nodes`
array (offset, tag, classes, id, content, size, path — node i's subtree
is exactly nodes[i .. i+size), sources/corpus.flatten).

Spec (deterministic, integer-only):
* a BLOCK is a node whose tag ∈ block_tags that is INNERMOST — no other
  block tag inside its subtree (innermost blocks tile the readable text
  without double-counting nested wrappers);
* per block: n_words = whitespace words over the subtree's content
  (block node included), n_link_words = the subset lying in nodes whose
  path contains an anchor component ('a' or 'a.cls…' — link text),
  link_ppt = 1000 * n_link_words // n_words (parts-per-thousand integer
  link density; empty blocks pin to 1000);
* boiler = TRUE iff the block's own path passes through a chrome tag
  (boiler_tags: nav/header/footer/aside/form/button/menu by default);
* is_content = ¬boiler ∧ n_words ≥ min_words ∧ link_ppt ≤ max_link_ppt
  — the low-link-density long-text heuristic every main-content
  extractor shares (jusText's "good" class, Boilerpipe's dense blocks).

Plan shape: map-only — every block statistic is computed with JVM
higher-order functions (transform/filter/aggregate/exists) inside the
row, so a 10^10-doc corpus classifies without a single shuffle; the
per-doc O(blocks × subtree) aggregate work is bounded by page size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOCK_TAGS = ("p", "li", "td", "th", "blockquote", "pre", "h1", "h2",
              "h3", "h4", "h5", "h6", "dd", "dt", "figcaption")
BOILER_TAGS = ("nav", "header", "footer", "aside", "form", "button", "menu")


def _n_words(content: Column) -> Column:
    """Whitespace word count of a (possibly null) content string."""
    return F.size(
        F.filter(F.split(F.trim(F.coalesce(content, F.lit(""))), r"\s+"),
                 lambda w: w != F.lit(""))
    )


def _has_tag(path: Column, tags) -> Column:
    """TRUE iff any path component's tag part is in `tags` (components
    are 'tag.cls1.cls2' strings)."""
    return F.exists(path,
                    lambda c: F.split(c, r"\.").getItem(0).isin(list(tags)))


def _block_structs(nodes_col: str, block_tags, boiler_tags) -> Column:
    """array<struct<offset,tag,n_words,n_link_words,boiler,text>> — one
    element per INNERMOST block, document order, computed entirely with
    JVM higher-order functions (no explode, no shuffle)."""
    n = F.col(nodes_col)
    is_block = lambda nd: nd["tag"].isin(list(block_tags))  # noqa: E731

    def profile(i):
        node = F.element_at(n, i + 1)
        sub = F.slice(n, i + 1, node["size"])
        words = F.aggregate(
            sub, F.lit(0), lambda acc, d: acc + _n_words(d["content"])
        )
        link_words = F.aggregate(
            sub, F.lit(0),
            lambda acc, d: acc + F.when(
                _has_tag(d["path"], ("a",)), _n_words(d["content"])
            ).otherwise(F.lit(0)),
        )
        innermost = ~F.exists(F.slice(n, i + 2, node["size"] - 1), is_block)
        text = F.array_join(
            F.filter(
                F.transform(sub,
                            lambda d: F.trim(F.coalesce(d["content"],
                                                        F.lit("")))),
                lambda t: t != F.lit(""),
            ),
            " ",
        )
        return F.struct(
            (is_block(node) & innermost).alias("keep"),
            node["offset"].alias("offset"),
            node["tag"].alias("tag"),
            words.alias("n_words"),
            link_words.alias("n_link_words"),
            _has_tag(node["path"], boiler_tags).alias("boiler"),
            text.alias("text"),
        )

    # sequence(0, -1) would DESCEND on empty arrays — guard explicitly
    idx = F.when(F.size(n) > 0,
                 F.sequence(F.lit(0), F.size(n) - 1)).otherwise(
        F.array().cast("array<int>"))
    return F.filter(F.transform(idx, profile), lambda s: s["keep"])


def _is_content(min_words: int, max_link_ppt: int) -> Column:
    return (
        ~F.col("boiler")
        & (F.col("n_words") >= min_words)
        & (F.col("link_ppt") <= max_link_ppt)
    )


def block_profile(docs: DataFrame, id_col: str = "doc_id",
                  nodes_col: str = "nodes",
                  block_tags=BLOCK_TAGS, boiler_tags=BOILER_TAGS,
                  min_words: int = 5,
                  max_link_ppt: int = 330) -> DataFrame:
    """One row per innermost block: (id, offset, tag, n_words,
    n_link_words, link_ppt, boiler, is_content) — all statistics
    integral; the explode is the only row multiplication, still no
    shuffle."""
    blocks = _block_structs(nodes_col, block_tags, boiler_tags)
    return (
        docs.select(F.col(id_col).alias(id_col), F.explode(blocks).alias("b"))
        .select(
            id_col,
            F.col("b.offset").alias("offset"),
            F.col("b.tag").alias("tag"),
            F.col("b.n_words").alias("n_words"),
            F.col("b.n_link_words").alias("n_link_words"),
            F.when(
                F.col("b.n_words") > 0,
                F.floor(F.col("b.n_link_words") * 1000 / F.col("b.n_words")),
            ).otherwise(F.lit(1000)).cast("int").alias("link_ppt"),
            F.col("b.boiler").alias("boiler"),
        )
        .withColumn("is_content", _is_content(min_words, max_link_ppt))
    )


def main_text(docs: DataFrame, id_col: str = "doc_id",
              nodes_col: str = "nodes",
              block_tags=BLOCK_TAGS, boiler_tags=BOILER_TAGS,
              min_words: int = 5, max_link_ppt: int = 330) -> DataFrame:
    """(id, main_text, n_blocks, n_content_blocks): the content blocks'
    text concatenated in document order — the extracted article body the
    quality/LM/dedup operators downstream consume. Map-only: the block
    array is filtered and joined INSIDE the row; the document table is
    never exploded or shuffled."""
    blocks = _block_structs(nodes_col, block_tags, boiler_tags)
    link_ppt = lambda s: F.when(  # noqa: E731
        s["n_words"] > 0,
        F.floor(s["n_link_words"] * 1000 / s["n_words"]),
    ).otherwise(F.lit(1000))
    keep = lambda s: (  # noqa: E731
        ~s["boiler"] & (s["n_words"] >= min_words)
        & (link_ppt(s) <= max_link_ppt)
    )
    content = F.filter(blocks, keep)
    return docs.select(
        F.col(id_col).alias(id_col),
        F.array_join(
            F.filter(F.transform(content, lambda s: s["text"]),
                     lambda t: t != F.lit("")),
            " ",
        ).alias("main_text"),
        F.size(blocks).alias("n_blocks"),
        F.size(content).alias("n_content_blocks"),
    )
