"""Slowly-Changing-Dimension Type 2 history build (Kimball SCD2).

Given a change log — one row per observation of a key's attribute
values at a timestamp — produce the versioned dimension history: one
row per RUN of consecutive equal attribute values, with
``effective_from`` / ``effective_to`` validity bounds, a 1-based
``version`` number, and an ``is_current`` marker on each key's last
run. This is the warehouse primitive behind "what was this customer's
tier when the order shipped" point-in-time joins; the reference's
pandas notebooks have no dimension-history notion at all, so this is
an extension operator (SURVEY §2 'beyond-reference' family, same
category as the lakehouse/CDC ops in sources/versioned.py).

Plan shape — ONE exchange total: both windows partition by the key
columns, so Catalyst plans a single hash-partitioning that the second
window reuses (only an extra local sort). The classic formulation
(gaps-and-islands groupBy on (key, run_id)) costs a SECOND shuffle
because the group keys extend the partitioning; instead run STARTS are
kept after the first window (their attribute values ARE the run's
values) and ``lead``/``row_number`` over the same key partitioning
finish the job:

    w1 (key, ts-order):  flag rows where any attribute differs from
                         the previous observation (null-safe), or the
                         first observation of the key;
    filter flag = 1:     one row per run, carrying the run's attrs and
                         its start timestamp;
    w2 (key, ts-order):  version = row_number, effective_to =
                         lead(effective_from), is_current = last row.

Scale: state per key is nothing (pure windows); skew follows the
change-log key distribution — a hot key with millions of observations
serializes inside one partition like any per-key ordered scan, which
is inherent to the semantics (runs are defined by per-key order).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_history"]


def scd2_history(
    df: DataFrame,
    keys: Sequence[str],
    attrs: Sequence[str],
    ts_col: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Collapse a change log into SCD2 validity intervals.

    ``tiebreak`` columns break ordering ties when several observations
    of one key share ``ts_col`` (they must make the per-key order
    total, or run boundaries are nondeterministic).

    Returns ``keys + attrs`` plus ``version`` (1-based per key),
    ``effective_from`` (run-start ``ts_col``), ``effective_to`` (next
    run's start, null on the open run) and ``is_current`` (int 1/0 —
    int, not boolean, so cross-engine value hashes are stable).
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak]
    w1 = Window.partitionBy(*keys).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w1)
    # F.lit(False) initializer: empty attrs degenerates to "one run
    # per key" (only the first observation starts a run) instead of
    # reduce() raising TypeError on an empty sequence
    attr_changed: Column = reduce(
        lambda a, b: a | b,
        [~F.col(a).eqNullSafe(F.lag(a).over(w1)) for a in attrs],
        F.lit(False),
    )
    starts = (
        df.withColumn(
            "_new_run", prev_ts.isNull() | attr_changed
        )
        .filter(F.col("_new_run"))
        .drop("_new_run")
    )
    w2 = Window.partitionBy(*keys).orderBy(*order)
    nxt = F.lead(ts_col).over(w2)
    return starts.select(
        *keys,
        *attrs,
        F.row_number().over(w2).alias("version"),
        F.col(ts_col).alias("effective_from"),
        nxt.alias("effective_to"),
        F.when(nxt.isNull(), F.lit(1)).otherwise(F.lit(0)).alias(
            "is_current"
        ),
    )
