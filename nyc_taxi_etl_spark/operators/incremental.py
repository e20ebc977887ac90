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

__all__ = ["dedup_batch_against_corpus", "incremental_ingest"]

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
