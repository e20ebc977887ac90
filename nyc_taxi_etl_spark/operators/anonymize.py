"""k-anonymity repair: full-domain generalization with suppression.

The audit (plans/queries_quality.py::customer_k_anonymity) names the
exposure; a release gate also wants the minimal fix. This module
implements the classic repair (Samarati 2001; Sweeney's Datafly,
2002): walk a DECLARED generalization ladder — each level coarsens one
or more quasi-identifier columns (nationkey→region, account-balance
bucket widening, finally full redaction '*') — and release at the
LOWEST level whose below-k remainder is within the suppression budget,
suppressing that remainder. The top of a well-formed ladder maps every
row to one group, so a feasible level always exists when n ≥ k.

Spark-first shape: all levels are evaluated in ONE pass — each row
explodes into (level, generalized-QI) records, one hash aggregation
builds every level's group table at once (bounded by the summed QI
domains — metadata scale), and a second tiny agg reduces it to the
per-level report. The chosen level is a 1-row scalar broadcast (the
catalog's standard bounded-build pattern), NOT a driver-side loop over
levels: no iterative jobs, no collects on the data path. The released
data then needs one more scan (generalize at the chosen level + an
entity-grain semi-join against the ≥k groups).

Both decisions (level choice, suppression set) are pure functions of
group counts, so a DuckDB oracle replays the whole report
value-for-value (UNION ALL of the levels + the same argmin).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["generalization_report", "generalize"]

# Internal working columns of generalize(); input/requested names may not
# collide with them (a df carrying e.g. `_ga_n` would otherwise fail deep
# in the plan with an opaque ambiguity error instead of a clear ValueError).
_RESERVED = frozenset({"_ga_s", "_ga_n", "_ga_l"})


def _validate(qi_levels: list[list[Column]]) -> int:
    if not qi_levels:
        raise ValueError("generalize: qi_levels must be non-empty")
    widths = {len(lvl) for lvl in qi_levels}
    if len(widths) != 1 or widths == {0}:
        raise ValueError(
            "generalize: every level must declare the same non-zero "
            "number of QI expressions"
        )
    return widths.pop()


def _level_groups(
    df: DataFrame,
    qi_levels: list[list[Column]],
    sensitive: Column | None = None,
) -> DataFrame:
    """(lvl, q0..qm, n[, l]) group table for EVERY ladder level in one
    scan + one hash agg. QI values are stringified so heterogeneous
    coarsenings (codes, buckets, '*') share one schema. With a
    ``sensitive`` expression, each group also carries its
    sensitive-value diversity ``l`` (exact distinct count)."""
    n_q = _validate(qi_levels)
    structs = [
        F.struct(
            F.lit(i).alias("lvl"),
            *[
                c.cast("string").alias(f"q{j}")
                for j, c in enumerate(lvl)
            ],
            *([sensitive.cast("string").alias("_s")] if sensitive is not None else []),
        )
        for i, lvl in enumerate(qi_levels)
    ]
    aggs = [F.count(F.lit(1)).alias("n")]
    if sensitive is not None:
        aggs.append(F.count_distinct(F.col("_s")).alias("l"))
    return (
        df.select(F.explode(F.array(*structs)).alias("g"))
        .select("g.*")
        .groupBy("lvl", *[f"q{j}" for j in range(n_q)])
        .agg(*aggs)
    )


def generalization_report(
    df: DataFrame,
    qi_levels: list[list[Column]],
    k: int,
    max_suppress_frac: float = 0.005,
    sensitive: Column | None = None,
    l: int = 1,
) -> DataFrame:
    """Per-level k-anonymity report with the chosen release level.

    One row per ladder level: ``level``, ``n_groups``,
    ``min_group_size``, ``rows_below_k`` (= rows suppressed if this
    level is released), ``pct_rows_below_k``, and ``chosen`` (1 on the
    lowest level whose suppression stays within
    ``max_suppress_frac``, falling back to the ladder top when none
    qualifies — release at the top still suppresses its remainder).

    With ``sensitive``/``l`` (distinct l-diversity, Machanavajjhala et
    al. 2006), a group violates when it is below k OR carries fewer
    than ``l`` distinct sensitive values (a k-anonymous group with one
    sensitive value still discloses it); the columns become
    ``rows_violating``/``pct_rows_violating`` plus
    ``min_l_diversity``. Note the ladder top only guarantees
    feasibility when the WHOLE column carries ≥ l distinct values.
    """
    if k < 1:
        raise ValueError("generalization_report: k must be >= 1")
    if sensitive is not None and l < 1:
        raise ValueError("generalization_report: l must be >= 1")
    with_l = sensitive is not None and l > 1
    below = F.col("n") < F.lit(k)
    if with_l:
        below = below | (F.col("l") < F.lit(l))
    viol = "rows_violating" if with_l else "rows_below_k"
    pct = "pct_rows_violating" if with_l else "pct_rows_below_k"
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("n").cast("long").alias("min_group_size"),
        F.sum(F.when(below, F.col("n")).otherwise(F.lit(0)))
        .cast("long")
        .alias(viol),
        F.sum("n").cast("long").alias("_n_rows"),
    ]
    if with_l:
        aggs.insert(2, F.min("l").cast("long").alias("min_l_diversity"))
    per_level = (
        _level_groups(df, qi_levels, sensitive if with_l else None)
        .groupBy("lvl")
        .agg(*aggs)
        .withColumn(
            pct,
            F.col(viol).cast("double") / F.col("_n_rows").cast("double"),
        )
    )
    ok = F.col(pct) <= F.lit(max_suppress_frac)
    # the chosen-level scalars (lowest qualifying level / ladder top)
    # are cross-row minima over the LADDER-LENGTH frame — take them
    # with an unbounded window over per_level instead of a separate
    # aggregate + self-join, which would re-execute the full-table
    # level-groups aggregation a second time (per_level is a lazy
    # subtree, not a materialized table). The window's "partition" is
    # the whole ladder: a handful of rows, one task.
    from pyspark.sql import Window

    w_all = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    out_cols = [
        F.col("lvl").cast("long").alias("level"),
        "n_groups",
        "min_group_size",
    ]
    if with_l:
        out_cols.append("min_l_diversity")
    out_cols += [viol, pct, "chosen"]
    return (
        per_level.withColumn(
            "chosen",
            (
                F.col("lvl")
                == F.coalesce(
                    F.min(F.when(ok, F.col("lvl"))).over(w_all),
                    F.max("lvl").over(w_all),
                )
            ).cast("long"),
        )
        .select(*out_cols)
    )


def generalize(
    df: DataFrame,
    qi_levels: list[list[Column]],
    k: int,
    max_suppress_frac: float = 0.005,
    qi_names: list[str] | None = None,
    drop_cols: list[str] | None = None,
    sensitive: Column | None = None,
    l: int = 1,
) -> DataFrame:
    """The released table: the chosen level's generalized QI columns
    (named ``qi_names``, default ``q0..qm``) plus ``df``'s other
    columns MINUS ``drop_cols`` (pass the raw QI source columns here —
    releasing them alongside their generalizations would undo the
    anonymization), with every row of a below-k group SUPPRESSED.

    The level choice is a bounded collect of the per-level report
    (ladder-length rows — metadata); the release itself is one scan
    joined against the chosen level's ≥k group table on the
    generalized key (co-partitioned hash join, no broadcast of data).
    """
    n_q = _validate(qi_levels)
    names = qi_names or [f"q{j}" for j in range(n_q)]
    if len(names) != n_q:
        raise ValueError("generalize: qi_names width mismatch")
    dropped = set(drop_cols or [])
    kept = [c for c in df.columns if c not in dropped]
    clash = set(names) & set(kept)
    if clash:
        raise ValueError(
            f"generalize: qi_names collide with released columns: "
            f"{sorted(clash)}"
        )
    reserved_clash = (set(names) | set(kept)) & _RESERVED
    if reserved_clash:
        raise ValueError(
            f"generalize: columns collide with reserved internal names "
            f"{sorted(_RESERVED)}: {sorted(reserved_clash)} (rename or "
            f"pass them via drop_cols)"
        )
    rep = generalization_report(
        df, qi_levels, k, max_suppress_frac, sensitive=sensitive, l=l
    )
    chosen = rep.filter(F.col("chosen") == 1).select("level").first()
    # empty input: no groups at any level -> release at the ladder top
    # (the output is empty either way; the plan must still build)
    lvl_idx = len(qi_levels) - 1 if chosen is None else int(chosen["level"])
    lvl_exprs = qi_levels[lvl_idx]
    with_l = sensitive is not None and l > 1
    gen = df.select(
        *[c.cast("string").alias(nm) for c, nm in zip(lvl_exprs, names)],
        *([sensitive.cast("string").alias("_ga_s")] if with_l else []),
        *[F.col(c) for c in kept],
    )
    ok_aggs = [F.count(F.lit(1)).alias("_ga_n")]
    keep_pred = F.col("_ga_n") >= k
    if with_l:
        ok_aggs.append(F.count_distinct(F.col("_ga_s")).alias("_ga_l"))
        keep_pred = keep_pred & (F.col("_ga_l") >= l)
    ok_groups = (
        gen.groupBy(*names)
        .agg(*ok_aggs)
        .filter(keep_pred)
        .select(*names)
    )
    return gen.join(ok_groups, names, "left_semi").drop("_ga_s")
