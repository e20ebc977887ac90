"""End-to-end training-corpus curation: the composition every LLM data
pipeline runs over raw documents, expressed as one lazy DataFrame plan:

    quality filter → exact dedup → MinHash-LSH near-dedup
                   → connected-components keeper selection

Stage semantics (all stages reuse the standalone operators, so each is
individually oracle-checked elsewhere):
  1. ``quality_score(text) >= quality_threshold`` (row-local, pushes to
     the scan — low-quality docs never reach the hash stages);
  2. exact dedup keeps the MIN doc id per content fingerprint (one
     hash-agg + semi-join);
  3. MinHash+LSH candidate pairs verified at ``jaccard_threshold`` over
     the exact-deduped corpus;
  4. near-dup clusters via large-star/small-star connected components;
     each cluster keeps its MIN doc id (the component representative) —
     every other member is anti-joined away.

Scale posture (100 TB): stage order is the whole point — quality filter
and exact dedup shrink the corpus before the expensive shingle/minhash
pass; LSH keeps candidate generation sub-quadratic; component finding
never materializes the graph on the driver. The surviving corpus is
materialized once (eager localCheckpoint) because two downstream
subtrees (pair generation and the final anti-join) both consume it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import connected_components, minhash_lsh_pairs
from .text import fingerprint, quality_score

__all__ = ["curate_documents", "curation_audit"]


def curate_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_threshold: float = 0.5,
    jaccard_threshold: float = 0.5,
    k: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
) -> DataFrame:
    """Curated corpus: one row per kept document, with its quality
    score. Deterministic: every keeper rule is min-id."""
    scored = docs.withColumn("quality", quality_score(F.col(text_col)))
    passed = scored.filter(F.col("quality") >= quality_threshold)

    fp = passed.withColumn("fingerprint", fingerprint(F.col(text_col)))
    keeper_ids = fp.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    # the exact-kept frame feeds both the LSH pair stage and the final
    # anti-join; eager localCheckpoint, not persist: the return is lazy
    # so a persist could never be unpersisted and would accumulate
    # CacheManager entries per call (blocks spill to disk and are
    # ContextCleaner-released when the frame is unreferenced)
    exact_kept = fp.join(
        keeper_ids, ["fingerprint", id_col], "left_semi"
    ).localCheckpoint(eager=True)

    pairs = minhash_lsh_pairs(
        exact_kept,
        text_col=text_col,
        id_col=id_col,
        k=k,
        num_hashes=num_hashes,
        bands=bands,
        verify_threshold=jaccard_threshold,
    )
    comp = connected_components(pairs)
    non_keepers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return exact_kept.drop("fingerprint").join(non_keepers, id_col, "left_anti")


def curation_audit(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_threshold: float = 0.5,
    jaccard_threshold: float = 0.5,
    k: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
) -> DataFrame:
    """Per-document curation PROVENANCE: one row per input doc with its
    quality score, its fate, and the keeper it collapsed into —
    ``fate ∈ {kept, dropped_quality, dropped_exact_dup,
    dropped_near_dup}`` with first-failing-stage precedence (a
    low-quality doc that is also a duplicate reports dropped_quality;
    it never reached the hash stages). ``keeper_id`` is the retained
    representative (itself when kept, NULL for quality drops — there
    is nothing it deduplicated into).

    The report every production pipeline owes its users: how much did
    each stage remove, and where did my document go. Same stages, same
    keeper rules, same plan shapes as :func:`curate_documents` — one
    extra broadcast-sized join per stage to carry the labels back to
    the full corpus; no new shuffles on the text itself.
    """
    scored = docs.withColumn("quality", quality_score(F.col(text_col)))
    fp = scored.filter(F.col("quality") >= quality_threshold).withColumn(
        "fingerprint", fingerprint(F.col(text_col))
    )
    ex = fp.join(
        fp.groupBy("fingerprint").agg(F.min(id_col).alias("ex_keeper")),
        "fingerprint",
    ).select(id_col, "ex_keeper")
    # eager localCheckpoint, not persist — see curate_documents above
    exact_kept = (
        fp.join(ex, id_col)
        .filter(F.col(id_col) == F.col("ex_keeper"))
        .localCheckpoint(eager=True)
    )
    pairs = minhash_lsh_pairs(
        exact_kept,
        text_col=text_col,
        id_col=id_col,
        k=k,
        num_hashes=num_hashes,
        bands=bands,
        verify_threshold=jaccard_threshold,
    )
    comp = connected_components(pairs).select(
        F.col("node").alias(id_col), F.col("component")
    )
    out = (
        scored.select(id_col, "quality")
        .join(ex, id_col, "left")
        .join(comp, id_col, "left")
    )
    is_q = F.col("quality") < quality_threshold
    is_ex = F.col("ex_keeper") != F.col(id_col)
    is_nd = F.col("component").isNotNull() & (
        F.col("component") != F.col(id_col)
    )
    fate = (
        F.when(is_q, F.lit("dropped_quality"))
        .when(is_ex, F.lit("dropped_exact_dup"))
        .when(is_nd, F.lit("dropped_near_dup"))
        .otherwise(F.lit("kept"))
    )
    keeper = (
        F.when(is_q, F.lit(None).cast("long"))
        .when(is_ex, F.col("ex_keeper").cast("long"))
        .when(is_nd, F.col("component").cast("long"))
        .otherwise(F.col(id_col).cast("long"))
    )
    return out.select(
        id_col, "quality", fate.alias("fate"), keeper.alias("keeper_id")
    )
