"""Span/tree analytics over interleaved documents — duplicate detection,
duplicate marking, path queries and template-path extraction.

The recursive HtmlNode tree (/root/reference/src/html_parser.rs:8-15) is
flattened to two parallel arrays per document (sources.corpus.flatten):

* `spans` — the input_hint payload (kind,text,media_ref,offset), leaf-only;
* `nodes` — EVERY node in pre-order: (offset, tag, classes, id, content,
  size, path), where `size` is the subtree node count, so node i's subtree
  is exactly nodes[i .. i+size) and `path` is the root->node chain of
  'tag.cls1.cls2' components.

Signature semantics re-specified from NodeSignature
(/root/reference/src/storage.rs:377-422): the reference hashes the node's
(tag, classes, id, content) plus all descendants' fields in pre-order; that
flat pre-order sequence is precisely nodes[i..i+size), so our signature is
a 64-bit blake2b over the serialized slice. Signature equality then implies
equality of every field the reference's NodeSignature carries.

Duplicate analysis (/root/reference/src/storage.rs:119-195), preserved
exactly:
* counts OCCURRENCES, not distinct pages — a signature appearing twice on
  one page qualifies (HashMap<sig,usize> incremented per node);
* >= 2 SUCCESS pages per domain guard;
* structural tags (html/head/body/main/article/section) never counted;
* only "meaningful" nodes counted (content | children | classes | id |
  semantic tag).

Scale notes: signatures are computed per document inside one Arrow batch
(pandas UDF — sanctioned custom-op path; subtree hashing is not expressible
with built-ins), then everything downstream is plain explode + hash
aggregation + broadcast semi-join, all JVM-side.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from ..functions.templates import detect_template_udf

STRUCTURAL_TAGS = ("html", "head", "body", "main", "article", "section")
SEMANTIC_TAGS = ("nav", "header", "footer", "aside", "form", "button", "a", "ul", "ol", "menu")
FILTERED_MARKER = "[FILTERED DUPLICATE]"


# ---------------------------------------------------------------------------
# signature kernel (shared by the engine UDF and the pytest oracle)
# ---------------------------------------------------------------------------


def _node_serial(n: dict) -> bytes:
    classes = n["classes"] if n["classes"] is not None else []
    return (
        "\x1f".join(
            [n["tag"] or "", "\x1e".join(classes), n["id"] or "\x00", n["content"] or ""]
        )
    ).encode("utf-8") + b"\x1d"


def subtree_hashes(nodes: list[dict]) -> list[int]:
    """64-bit signature per node: blake2b over the serialized pre-order
    subtree slice nodes[i..i+size). O(n * depth) via per-node slices — node
    counts per document are small (tens to hundreds)."""
    serials = [_node_serial(n) for n in nodes]
    out = []
    for i, n in enumerate(nodes):
        size = n["size"]
        h = hashlib.blake2b(b"".join(serials[i : i + size]), digest_size=8).digest()
        out.append(int.from_bytes(h, "big", signed=True))
    return out


def is_meaningful(n: dict) -> bool:
    """/root/reference/src/storage.rs:174-195 (note: `content | children`
    makes the first clause cover most nodes; classes/id/semantic-tag keep
    childless empty nodes like <nav/>)."""
    has_content = bool((n["content"] or "").strip())
    has_children = n["size"] > 1
    return (
        has_content
        or has_children
        or bool(n["classes"])
        or n["id"] is not None
        or n["tag"] in SEMANTIC_TAGS
    )


@pandas_udf(ArrayType(LongType()))
def subtree_hashes_udf(nodes_col: pd.Series) -> pd.Series:
    return nodes_col.map(lambda nodes: subtree_hashes(list(nodes)))


# -- portable (cross-engine checkable) twin ---------------------------------


def _node_serial_portable(n: Column) -> Column:
    """JVM serial matching _node_serial byte-for-byte except: md5-oriented
    twin uses chr(1) for a NULL id (chr(0) is not representable in every
    SQL engine's VARCHAR — DuckDB rejects embedded NULs)."""
    return F.concat(
        F.coalesce(n["tag"], F.lit("")), F.lit("\x1f"),
        F.array_join(F.coalesce(n["classes"], F.array().cast("array<string>")), "\x1e"),
        F.lit("\x1f"),
        F.coalesce(n["id"], F.lit("\x01")), F.lit("\x1f"),
        F.coalesce(n["content"], F.lit("")), F.lit("\x1d"),
    )


def subtree_hashes_portable(nodes: Column) -> Column:
    """Engine-portable twin of subtree_hashes: signature[i] = md5 over the
    SAME serialized pre-order subtree slice nodes[i..i+size) — md5-on-string
    exists identically in every SQL engine, so this variant is verifiable
    end-to-end against a DuckDB oracle (the pattern proven by
    operators/dedup.py minhash_lsh_pairs_portable). 100% JVM expressions —
    whole-stage codegen, no Python. Reference semantics being specified:
    NodeSignature over the pre-order slice
    (/root/reference/src/storage.rs:377-422)."""
    serials = F.transform(nodes, _node_serial_portable)
    return F.when(F.size(nodes) == 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(nodes)),
            lambda i: F.md5(
                F.array_join(
                    F.slice(serials, i, F.element_at(nodes, i)["size"]), ""
                )
            ),
        )
    )


# ---------------------------------------------------------------------------
# A1/A2 — signature collection + cross-page duplicate counting
# ---------------------------------------------------------------------------


def with_signatures(docs: DataFrame, portable: bool = False) -> DataFrame:
    """docs(doc_id?, host, spans, nodes) -> + sigs aligned with nodes
    (sigs[i] is the subtree signature of nodes[i]). portable=True swaps the
    blake2b Arrow kernel for the md5 JVM twin (oracle-checkable; also the
    zero-Python scale path — sig type string instead of long)."""
    sig = (subtree_hashes_portable(F.col("nodes")) if portable
           else subtree_hashes_udf(F.col("nodes")))
    return docs.withColumn("sigs", sig)


def exploded_nodes(docs: DataFrame, portable: bool = False) -> DataFrame:
    """One row per (doc, node) with its signature: explode the zipped
    (node, sig) arrays. Filters nothing — callers choose predicates."""
    with_sigs = with_signatures(docs, portable=portable)
    zipped = F.arrays_zip(F.col("nodes"), F.col("sigs")).alias("z")
    return (
        with_sigs.select("doc_id", "host", F.explode(zipped).alias("z"))
        .select(
            "doc_id",
            "host",
            F.col("z.nodes.offset").alias("offset"),
            F.col("z.nodes.tag").alias("tag"),
            F.col("z.nodes.classes").alias("classes"),
            F.col("z.nodes.id").alias("id"),
            F.col("z.nodes.content").alias("content"),
            F.col("z.nodes.size").alias("size"),
            F.col("z.nodes.path").alias("path"),
            F.col("z.sigs").alias("sig"),
        )
    )


def meaningful_filter() -> Column:
    """JVM predicate mirroring is_meaningful (P12+P13)."""
    return (~F.col("tag").isin(*STRUCTURAL_TAGS)) & (
        (F.trim(F.coalesce(F.col("content"), F.lit(""))) != "")
        | (F.col("size") > 1)
        | (F.size(F.coalesce(F.col("classes"), F.array())) > 0)
        | F.col("id").isNotNull()
        | F.col("tag").isin(*SEMANTIC_TAGS)
    )


def domain_duplicates(success_docs: DataFrame, portable: bool = False) -> DataFrame:
    """(host, sig, n) for signatures occurring >= 2 times across a host's
    SUCCESS pages, with the >= 2-pages-per-host guard. Occurrence semantics
    preserved exactly (see module docstring).

    Plan shape: explode -> cheap predicates BEFORE the hash shuffle ->
    hash-aggregate on (host, sig) with map-side partial aggregation; the
    page-count guard is a broadcast semi-join of a tiny per-host aggregate."""
    eligible_hosts = (
        success_docs.groupBy("host")
        .agg(F.count("*").alias("_pages"))
        .filter(F.col("_pages") >= 2)
        .select("host")
    )
    nodes = exploded_nodes(
        success_docs.join(F.broadcast(eligible_hosts), "host", "left_semi"),
        portable=portable,
    )
    return (
        nodes.filter(meaningful_filter())
        .groupBy("host", "sig")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
    )


# ---------------------------------------------------------------------------
# J2/T6 — duplicate marking (tree rewrite, structure preserved)
# ---------------------------------------------------------------------------


def mark_duplicates(docs: DataFrame, dups: DataFrame,
                    portable: bool = False) -> DataFrame:
    """Rewrite spans: text of any span whose node signature is in the host's
    duplicate set becomes '[FILTERED DUPLICATE]'; structure (kind, media_ref,
    offset, order) preserved — /root/reference/src/html_parser.rs:204-229.

    dups(host, sig) is aggregated to a per-host array and BROADCAST — the
    duplicate set is tiny relative to the corpus."""
    sig_type = "array<string>" if portable else "array<long>"
    dup_sets = dups.groupBy("host").agg(F.collect_set("sig").alias("_dup_sigs"))
    with_sigs = with_signatures(docs, portable=portable).join(
        F.broadcast(dup_sets), "host", "left"
    )
    dup_sigs = F.coalesce(F.col("_dup_sigs"), F.array().cast(sig_type))

    # offsets of nodes whose signature is duplicated
    marked_offsets = F.transform(
        F.filter(
            F.arrays_zip(F.col("nodes"), F.col("sigs")),
            lambda z: F.array_contains(dup_sigs, z["sigs"]),
        ),
        lambda z: z["nodes"]["offset"],
    )
    new_spans = F.transform(
        F.col("spans"),
        lambda s: F.struct(
            s["kind"].alias("kind"),
            F.when(F.array_contains(marked_offsets, s["offset"]), FILTERED_MARKER)
            .otherwise(s["text"])
            .alias("text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset"),
        ),
    )
    return with_sigs.withColumn("spans", new_spans).drop("_dup_sigs", "sigs")


# ---------------------------------------------------------------------------
# T2/T3 — title + CSS-ish path queries
# ---------------------------------------------------------------------------


def find_title(docs: DataFrame) -> Column:
    """First (pre-order) non-empty title span — html_parser.rs:32-44.
    try_element_at: NULL (not an ANSI error) when a page has no title."""
    return F.try_element_at(
        F.filter("spans", lambda s: (s["kind"] == "title") & (s["text"] != "")), F.lit(1)
    )["text"]


def _parse_part(part: str) -> tuple[str, frozenset[str]]:
    if "." in part:
        tag, _, cls = part.partition(".")
        return tag, frozenset(c for c in cls.split(".") if c)
    return part, frozenset()


def _comp_matches(comp: str, part: tuple[str, frozenset[str]]) -> bool:
    tag, _, cls = comp.partition(".")
    classes = set(c for c in cls.split(".") if c) if cls else set()
    return tag == part[0] and part[1] <= classes


def path_match_count(node_path: list[str], parts: list[tuple[str, frozenset[str]]]) -> int:
    """EXACT emit count of the reference's find_by_path recursion
    (/root/reference/src/html_parser.rs:48-106) for one node: the recursion
    visits (node, depth) once per ordered subsequence embedding of the first
    `depth` parts into the node's strict ancestors, and pushes the node on
    each visit at depth == len(parts)-1 where the node matches the last
    part. So: count = (#embeddings of parts[:-1] into ancestors) if the node
    matches parts[-1], else 0. Standard subsequence-count DP. Component
    matching: tag equality + required classes ⊆ node classes (ids ignored)."""
    if not parts or not _comp_matches(node_path[-1], parts[-1]):
        return 0
    need = parts[:-1]
    # dp[j] = number of embeddings of need[:j] seen so far
    dp = [0] * (len(need) + 1)
    dp[0] = 1
    for comp in node_path[:-1]:
        for j in range(len(need) - 1, -1, -1):
            if dp[j] and _comp_matches(comp, need[j]):
                dp[j + 1] += dp[j]
    return dp[len(need)]


def find_by_path(docs: DataFrame, path_spec: str,
                 portable: bool = False) -> DataFrame:
    """All nodes matching the CSS-ish descendant path, one row per hit:
    (doc_id, host, offset, content, multiplicity) where multiplicity is the
    reference's exact emit count for that node. Matching runs in an Arrow
    pandas UDF over the precomputed per-node ancestor chains."""
    parts = [_parse_part(p) for p in path_spec.split()]

    @pandas_udf(LongType())
    def match_count(paths: pd.Series) -> pd.Series:
        return paths.map(lambda p: path_match_count(list(p), parts))

    nodes = exploded_nodes(docs, portable=portable)
    return (
        nodes.withColumn("multiplicity", match_count(F.col("path")))
        .filter(F.col("multiplicity") > 0)
        .select("doc_id", "host", "offset", "content", "multiplicity")
    )


# ---------------------------------------------------------------------------
# R7 — template-path extraction (prep mode)
# ---------------------------------------------------------------------------


def extract_template_paths(success_docs: DataFrame) -> DataFrame:
    """(host, path, pattern) DISTINCT across pages — the engine form of
    TemplatePathStore (/root/reference/src/template_detection.rs:306-347 +
    set-union in main.rs:140-152). Only content-bearing nodes are probed;
    explode -> template UDF -> distinct (D3)."""
    nodes = exploded_nodes(success_docs).filter(
        F.trim(F.coalesce(F.col("content"), F.lit(""))) != ""
    )
    hits = nodes.withColumn("_tpl", detect_template_udf(F.col("content"))).filter(
        F.col("_tpl.pattern").isNotNull()
    )
    return hits.select("host", "path", F.col("_tpl.pattern").alias("pattern")).distinct()
