"""Incremental corpus ingestion: dedup each arriving batch against the
corpus-at-rest, append only genuinely new documents.

Production curation is not one batch — crawls arrive continuously, and
re-running whole-corpus dedup per delivery is O(corpus) work for an
O(batch) change. This operator keeps the exact-dedup invariant
incrementally:

1. fingerprint the batch (the same normalized-content md5 the batch
   dedup family uses — ``text.fingerprint``);
2. collapse WITHIN the batch (keep the min id per fingerprint — one
   window, one shuffle of the batch only);
3. anti-join against the fingerprints ALREADY AT REST (stored as a
   column, so the corpus text is never re-read or re-hashed);
4. ``VersionedTable.append`` the survivors — an atomic, time-travelable
   commit of just the delta.

Idempotence / crash story (inherited from the commit log): a crash
before publish leaves an invisible orphan, and re-running the SAME
batch converges — every fingerprint now at rest, zero survivors,
nothing appended twice. That makes at-least-once delivery of batches
safe without any coordinator state.

Scale: per-delivery cost is O(batch) for hashing + one anti-join whose
corpus side is the narrow ``(fingerprint)`` projection (16 bytes/doc —
column-pruned straight off the parquet scan); at 100 TB the join is
shuffle-on-fingerprint with AQE sizing, and the fingerprint column is
the only corpus data that moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sources.versioned import VersionedTable
from .text import fingerprint

__all__ = [
    "dedup_batch_against_corpus",
    "incremental_ingest",
    "near_dup_batch_against_corpus",
]

FP_COL = "content_fp"


def dedup_batch_against_corpus(
    batch: DataFrame,
    existing_fps: DataFrame | None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The batch's genuinely-new documents, fingerprinted: within-batch
    exact dedup (min id per fingerprint) then an anti-join against
    ``existing_fps`` (a 1-column ``content_fp`` frame, or None for a
    first delivery)."""
    fp = batch.withColumn(FP_COL, fingerprint(F.col(text_col)))
    w = Window.partitionBy(FP_COL).orderBy(F.asc(id_col))
    local = (
        fp.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    if existing_fps is None:
        return local
    return local.join(
        existing_fps.select(FP_COL).distinct(), FP_COL, "left_anti"
    )


def incremental_ingest(
    table: VersionedTable,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Dedup ``batch`` against ``table`` and append the survivors as
    one atomic commit. Returns an audit dict:
    ``{"batch_rows", "appended", "version"}`` (``version`` is None
    when the whole batch was already at rest — no empty commits)."""
    n_batch = batch.count()
    existing = None
    if table.latest_version() is not None:
        existing = table.read().select(FP_COL)
    fresh = dedup_batch_against_corpus(batch, existing, id_col, text_col)
    # the delta plan runs twice (count gate + append write) — both are
    # O(batch); the gate is what keeps already-delivered batches from
    # publishing empty commits
    n_new = fresh.count()
    version = None
    if n_new:
        version = table.append(fresh)
    return {"batch_rows": n_batch, "appended": n_new, "version": version}


def near_dup_batch_against_corpus(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    verify_threshold: float | None = 0.5,
) -> DataFrame:
    """NEAR-dup companion to :func:`dedup_batch_against_corpus`: which
    incoming batch documents are near-duplicates (MinHash-LSH
    candidates, exact-Jaccard verified) of documents already at rest —
    WITHOUT re-hashing the corpus per delivery.

    The corpus side of the candidate join is
    ``dedup.banded_signatures`` — the storable (id, band, bucket)
    index. In production it is persisted once and appended per batch
    (like the exact-dedup fingerprint column); here it is computed
    from ``corpus`` so the operator is self-contained. Per-delivery
    cost: hash the BATCH (O(batch)), one equi-join of the batch's band
    keys against the stored index, then exact-Jaccard verification
    that shingles only candidate docs on both sides (the
    ``candidates=`` prune in ``ngram_jaccard_pairs``) — so corpus text
    is re-read only for docs that actually collide with the batch.

    Ids must be disjoint across the two frames (they identify sides in
    the output: ``id_a`` = corpus, ``id_b`` = batch). Hot buckets
    (templated boilerplate) follow the minhash_lsh_pairs posture:
    exact-dedup first, AQE skew-join for the rest.
    """
    from .dedup import banded_signatures, ngram_jaccard_pairs

    corpus_idx = banded_signatures(
        corpus, text_col, id_col, k, num_hashes, bands
    )
    batch_idx = banded_signatures(
        batch, text_col, id_col, k, num_hashes, bands
    )
    cand = (
        corpus_idx.select(
            "band", "bucket", F.col(id_col).alias("id_a")
        )
        .join(
            batch_idx.select(
                "band", "bucket", F.col(id_col).alias("id_b")
            ),
            ["band", "bucket"],
        )
        .select("id_a", "id_b")
        .distinct()
    )
    if verify_threshold is None:
        return cand
    both = corpus.select(id_col, text_col).unionByName(
        batch.select(id_col, text_col)
    )
    jac = ngram_jaccard_pairs(
        both, text_col, id_col, k, min_jaccard=0.0, candidates=cand
    )
    return jac.filter(F.col("jaccard") >= verify_threshold)
