"""Snapshot diff: key-level reconciliation of two table versions.

``snapshot_diff(base, revised, keys, compare)`` full-outer-joins the
two snapshots on the key columns and classifies every key as
``added`` (only in revised), ``removed`` (only in base), ``changed``
(present in both, any compare column differs null-safely) or
``unchanged``. The data-engineering primitive behind migration
verification, CDC backfill audits, and "what did this batch actually
touch" reports — the at-rest companion to operators/merge.py (which
APPLIES changes; this one EXPLAINS them). Pairs with
sources/versioned.py time travel: diff any two committed versions.

Scale: one shuffle of each side on the key columns (a plain
full-outer sort-merge/hash join — AQE handles skewed keys); the
optional ``drop_unchanged`` filter happens before anything is
materialized, so the usual "two 100 TB snapshots, tiny delta" case
emits only the delta. Comparison is null-safe per column with no UDFs
— everything stays in whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["snapshot_diff"]


def snapshot_diff(
    base: DataFrame,
    revised: DataFrame,
    keys: Sequence[str],
    compare: Sequence[str],
    drop_unchanged: bool = True,
) -> DataFrame:
    """One row per key in either snapshot with its diff status.

    Output: ``keys``, ``status``, and ``old_<c>`` / ``new_<c>`` for
    every compare column (nulls on the absent side).
    """
    b = base.select(
        *keys,
        F.lit(1).alias("_in_base"),
        *[F.col(c).alias(f"old_{c}") for c in compare],
    )
    r = revised.select(
        *keys,
        F.lit(1).alias("_in_rev"),
        *[F.col(c).alias(f"new_{c}") for c in compare],
    )
    j = b.join(r, on=list(keys), how="full_outer")
    # F.lit(False) initializer: an empty compare list means no column
    # can differ, so every both-sides key is 'unchanged' (instead of
    # reduce() raising TypeError on an empty sequence)
    any_diff = reduce(
        lambda a, c: a | c,
        [
            ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
            for c in compare
        ],
        F.lit(False),
    )
    status = (
        F.when(F.col("_in_base").isNull(), F.lit("added"))
        .when(F.col("_in_rev").isNull(), F.lit("removed"))
        .when(any_diff, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.withColumn("status", status).drop("_in_base", "_in_rev")
    if drop_unchanged:
        out = out.filter(F.col("status") != "unchanged")
    return out.select(
        *keys,
        "status",
        *[c for c_ in compare for c in (f"old_{c_}", f"new_{c_}")],
    )
