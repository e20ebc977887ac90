"""Declarative data-quality expectation suite (Deequ/Great-
Expectations shape, Spark-first execution).

North-star extension — the reference validates data with scattered
imperative guards (`spark_jobs/utils.py:60-76` drop-invalid filters,
`scripts/analytics_pandas.py:141-151` coercion counts) and has no
consolidated quality report. A pipeline engine wants DECLARED
constraints evaluated in as few passes as possible, producing an
auditable one-row-per-check table that gates promotion from raw to
curated.

Execution model:
  * all ROW-LEVEL checks (not-null / range / set / regex / custom
    predicate) fuse into ONE conditional-aggregation scan — adding a
    check adds a counter, not a pass;
  * UNIQUENESS checks ride the same single scan as
    ``count(*) − count(distinct struct(keys))`` (exact, map-side
    partial);
  * REFERENTIAL checks are one left-anti join each against the
    referenced key set (the only constraint class that inherently
    needs a second relation).

Each check yields ``(check_name, kind, n_rows, n_violations,
passed)`` — the contract table a scheduler inspects before
publishing.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "not_null",
    "in_range",
    "in_set",
    "matches",
    "satisfies",
    "unique",
    "referential",
    "run_checks",
    "fd_check",
]


@dataclass(frozen=True)
class _RowCheck:
    name: str
    kind: str
    violation: Column  # boolean: true ⇢ row violates


@dataclass(frozen=True)
class _UniqueCheck:
    name: str
    keys: tuple


@dataclass(frozen=True)
class _RefCheck:
    name: str
    col: str
    ref: DataFrame
    ref_col: str


def not_null(col: str) -> _RowCheck:
    return _RowCheck(f"not_null:{col}", "not_null", F.col(col).isNull())


def in_range(col: str, lo, hi) -> _RowCheck:
    c = F.col(col)
    return _RowCheck(
        f"in_range:{col}",
        "in_range",
        c.isNull() | (c < F.lit(lo)) | (c > F.lit(hi)),
    )


def in_set(col: str, values) -> _RowCheck:
    c = F.col(col)
    return _RowCheck(
        f"in_set:{col}", "in_set", c.isNull() | ~c.isin(*list(values))
    )


def matches(col: str, pattern: str) -> _RowCheck:
    c = F.col(col)
    return _RowCheck(
        f"matches:{col}", "matches", c.isNull() | ~c.rlike(pattern)
    )


def satisfies(name: str, predicate: Column) -> _RowCheck:
    """Custom row predicate that must hold; violation = NOT predicate
    (null-safe: a null predicate counts as a violation)."""
    return _RowCheck(
        f"satisfies:{name}",
        "satisfies",
        ~F.coalesce(predicate, F.lit(False)),
    )


def unique(*keys: str) -> _UniqueCheck:
    return _UniqueCheck("unique:" + ",".join(keys), tuple(keys))


def referential(col: str, ref: DataFrame, ref_col: str, name: str) -> _RefCheck:
    return _RefCheck(f"referential:{name}", col, ref, ref_col)


def run_checks(df: DataFrame, checks: list) -> DataFrame:
    """Evaluate the suite; returns one row per check.

    Scale: one full scan for every row-level + uniqueness check
    combined (conditional partial aggs — 100 checks cost one pass),
    plus one anti-join per referential check whose right side is the
    referenced key set (AQE picks broadcast when the dimension is
    small). Output is |checks| rows."""
    spark = df.sparkSession
    row_checks = [c for c in checks if isinstance(c, _RowCheck)]
    uni_checks = [c for c in checks if isinstance(c, _UniqueCheck)]
    ref_checks = [c for c in checks if isinstance(c, _RefCheck)]

    out = []
    if row_checks or uni_checks:
        aggs = [F.count("*").alias("__n")]
        for c in row_checks:
            # coalesce: an EMPTY table has zero violations (checks
            # pass vacuously), not a null report
            aggs.append(
                F.coalesce(
                    F.sum(c.violation.cast("long")), F.lit(0)
                ).alias(c.name)
            )
        for u in uni_checks:
            aggs.append(
                (
                    F.count("*")
                    - F.count_distinct(F.struct(*[F.col(k) for k in u.keys]))
                ).alias(u.name)
            )
        row = df.agg(*aggs)
        pieces = []
        for c in row_checks:
            pieces.append((c.name, c.kind, F.col(c.name)))
        for u in uni_checks:
            pieces.append((u.name, "unique", F.col(u.name)))
        stacked = row.select(
            F.col("__n"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(n).alias("check_name"),
                            F.lit(k).alias("kind"),
                            v.cast("long").alias("n_violations"),
                        )
                        for n, k, v in pieces
                    ]
                )
            ).alias("c"),
        ).select(
            F.col("c.check_name").alias("check_name"),
            F.col("c.kind").alias("kind"),
            F.col("__n").cast("long").alias("n_rows"),
            F.col("c.n_violations").alias("n_violations"),
        )
        out.append(stacked)

    for r in ref_checks:
        viol = (
            df.select(F.col(r.col))
            .join(
                r.ref.select(F.col(r.ref_col).alias(r.col)).distinct(),
                r.col,
                "left_anti",
            )
            .agg(F.count("*").alias("n_violations"))
        )
        n = df.agg(F.count("*").alias("n_rows"))
        out.append(
            n.crossJoin(viol).select(
                F.lit(r.name).alias("check_name"),
                F.lit("referential").alias("kind"),
                F.col("n_rows").cast("long"),
                F.col("n_violations").cast("long"),
            )
        )

    if not out:
        return spark.createDataFrame(
            [], "check_name string, kind string, n_rows long, "
            "n_violations long, passed long"
        )
    res = out[0]
    for other in out[1:]:
        res = res.unionByName(other)
    return res.withColumn(
        "passed", (F.col("n_violations") == 0).cast("long")
    )


def fd_check(
    df: DataFrame,
    fds: list[tuple[list[str], str]],
    one_pass: bool = False,
) -> DataFrame:
    """Functional-dependency audit: for each declared FD
    ``lhs_cols → rhs_col``, does every LHS group determine exactly one
    RHS value? The profiling primitive behind key discovery,
    denormalization safety ("can I collapse this dim?"), and
    dimensional-integrity monitoring — Deequ's uniqueness check is the
    special case where LHS is the key and RHS is the whole row.

    Returns one row per FD: ``(fd, n_groups, violating_groups,
    max_rhs_variants, passed)`` — ``violating_groups`` counts LHS
    groups seeing >1 distinct RHS value, ``max_rhs_variants`` the
    worst group's variant count (how badly the FD fails, not just
    whether), ``passed`` 1/0 with the vacuous-pass convention on
    empty input.

    Scale — two formulations, measured against each other (r10):

    * default (``one_pass=False``): one exact distinct-count
      aggregation per FD over a COLUMN-PRUNED scan of just that FD's
      2-3 columns, each reduced to a 1-row summary before the union.
      Each exchange carries partially-deduplicated native-typed rows.
      Measured at sf0.1 (5 interleaved noop passes): **2.45 s** for
      the 5-FD order/line audit.
    * ``one_pass=True``: all FDs in one table pass — a row-local
      explode emits ``(fd, lhs-as-strings, rhs-as-string)`` per FD
      per row, then one distinct-count agg keyed on ``(fd, lhs)``.
      Measured **5.03 s** on the same A/B: the |rows|·|fds| explode
      plus string casts cost more than the extra column-pruned scans
      saved, and its exchanges carry strings instead of native types.
      It remains available for genuinely scan-bound inputs (very wide
      tables with heavily-overlapping FD columns, object storage with
      high per-scan latency), which is the one regime where one pass
      over the table beats |fds| pruned passes.

    The string casts on the one-pass path are safe for
    distinct-counting: Spark's value→string rendering is injective
    per type (longs trivially; doubles via shortest-round-trip repr),
    and NULL rhs is ignored by count_distinct in both formulations.
    No windows, no collects.
    """
    if not fds:
        raise ValueError("fd_check: fds must be non-empty")
    fds = [(list(lhs), rhs) for lhs, rhs in fds]
    for lhs, _rhs in fds:
        if not lhs:
            raise ValueError("fd_check: FD lhs must be non-empty")
    if not one_pass:
        out = []
        for lhs, rhs in fds:
            label = f"{', '.join(lhs)} -> {rhs}"
            per = df.groupBy(*lhs).agg(
                F.count_distinct(F.col(rhs)).alias("_nd")
            )
            viol = F.coalesce(
                F.sum((F.col("_nd") > 1).cast("long")), F.lit(0)
            )
            out.append(
                per.agg(
                    F.lit(label).alias("fd"),
                    F.count("*").cast("long").alias("n_groups"),
                    viol.cast("long").alias("violating_groups"),
                    F.coalesce(F.max("_nd"), F.lit(0))
                    .cast("long")
                    .alias("max_rhs_variants"),
                    (viol == 0).cast("long").alias("passed"),
                )
            )
        res = out[0]
        for other in out[1:]:
            res = res.unionByName(other)
        return res
    packed = F.array(
        *[
            F.struct(
                F.lit(i).alias("_fd"),
                F.array(
                    *[F.col(c).cast("string") for c in lhs]
                ).alias("_key"),
                F.col(rhs).cast("string").alias("_rhs"),
            )
            for i, (lhs, rhs) in enumerate(fds)
        ]
    )
    per = (
        df.select(F.explode(packed).alias("p"))
        .select("p.*")
        .groupBy("_fd", "_key")
        .agg(F.count_distinct(F.col("_rhs")).alias("_nd"))
    )
    viol = F.coalesce(F.sum((F.col("_nd") > 1).cast("long")), F.lit(0))
    summary = per.groupBy("_fd").agg(
        F.count("*").cast("long").alias("n_groups"),
        viol.cast("long").alias("violating_groups"),
        F.coalesce(F.max("_nd"), F.lit(0))
        .cast("long")
        .alias("max_rhs_variants"),
    )
    # plan-time literal (fd index → label) frame; the left join keeps
    # the vacuous-pass row for FDs with no groups (empty input)
    labels = (
        df.sparkSession.range(1)
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("_fd"),
                            F.lit(
                                f"{', '.join(lhs)} -> {rhs}"
                            ).alias("fd"),
                        )
                        for i, (lhs, rhs) in enumerate(fds)
                    ]
                )
            ).alias("p")
        )
        .select("p.*")
    )
    return labels.join(F.broadcast(summary), "_fd", "left").select(
        "fd",
        F.coalesce(F.col("n_groups"), F.lit(0))
        .cast("long")
        .alias("n_groups"),
        F.coalesce(F.col("violating_groups"), F.lit(0))
        .cast("long")
        .alias("violating_groups"),
        F.coalesce(F.col("max_rhs_variants"), F.lit(0))
        .cast("long")
        .alias("max_rhs_variants"),
        (F.coalesce(F.col("violating_groups"), F.lit(0)) == 0)
        .cast("long")
        .alias("passed"),
    )
