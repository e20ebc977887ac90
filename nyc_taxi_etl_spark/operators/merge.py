"""Upsert / merge: apply a batch of updates over a base table, keeping
one row per key (updates win; ties broken by an optional version
column). The reference's only incrementality is manifest
skip-if-exists (`scripts/download_tlc_range_s3.py:104-111`); a
pipeline engine needs real keep-latest merge for late-arriving
corrections and CDC feeds.

Scale posture: ONE shuffle on the merge keys (window row_number),
versus the join-then-union formulation which shuffles base twice.
This is the full-recompute merge — at 100 TB you bound it by
partition pruning (merge only the partitions the updates touch) and
write back with dynamic partition overwrite; both compose with this
operator unchanged.

At-rest durability lives in ``sources/versioned.py``: a commit-log
versioned parquet layout that makes these merges atomic, restartable
(crash between merges leaves only an invisible orphan) and
time-travelable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["merge_upsert"]


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    version_col: str | None = None,
    op_col: str | None = None,
    delete_op: str = "D",
) -> DataFrame:
    """One row per key: the updates row if the key is updated, else the
    base row. With ``version_col``, the highest version wins and
    updates beat base only on equal versions. Update rows may omit
    columns (filled as null via unionByName).

    ``op_col`` (r7): CDC feeds (Debezium-style) carry an operation
    marker — when given, update rows whose ``op_col`` equals
    ``delete_op`` are TOMBSTONES: they win the per-key contest like
    any other change (so a later re-insert still resurrects the key)
    and then erase it from the output. Deletes ride the same single
    shuffle — no extra anti-join pass. The op column is consumed (not
    emitted); base rows need no marker."""
    clash = {"_src", "_rn"}.intersection(base.columns).union(
        {"_src", "_rn"}.intersection(updates.columns)
    )
    if clash:
        raise ValueError(
            f"merge_upsert reserves internal column names "
            f"{sorted(clash)}; rename them in the input frames"
        )
    tagged = base.withColumn("_src", F.lit(0)).unionByName(
        updates.withColumn("_src", F.lit(1)), allowMissingColumns=True
    )
    order: list[Column] = []
    if version_col is not None:
        order.append(F.col(version_col).desc_nulls_last())
    order.append(F.col("_src").desc())
    w = Window.partitionBy(*keys).orderBy(*order)
    out = (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_src", "_rn")
    )
    if op_col is not None:
        out = out.filter(
            ~F.col(op_col).eqNullSafe(F.lit(delete_op))
        ).drop(op_col)
    return out
