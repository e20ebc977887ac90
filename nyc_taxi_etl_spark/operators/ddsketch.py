"""DDSketch: mergeable relative-error quantile sketch (Masson,
Lee & Law, VLDB 2019 — "DDSketch: a fast and fully-mergeable quantile
sketch with relative-error guarantees").

The fourth classical sketch beside the engine's HLL (distinct), CMS
(frequency) and KMV (set overlap): a STORABLE quantile pre-aggregate.
Bucket index of a positive value is ``ceil(ln(x)/ln(gamma))`` with
``gamma = (1+alpha)/(1-alpha)``; any value in bucket i lies within
relative error alpha of the bucket estimate ``2*gamma^i/(gamma+1)``.
The sketch is just (group, bucket) -> count:

* building it is ONE hash aggregation (map-side combinable);
* merging two sketches is adding counts per bucket — the same groupBy
  — so daily sketches roll up to monthly exactly like the HLL rollup;
* unlike GK/t-digest (order-dependent, engine-internal), every step is
  closed-form arithmetic, so a DuckDB oracle reproduces the sketch AND
  its quantile read-out bit-for-bit (ln/exp cross-engine agreement is
  the same 1-ulp class the LM-score oracles have relied on for five
  rounds, absorbed by the catalog's 4-decimal rounding convention).

Zero/negative values have no logarithm: callers filter or count them
separately (``ddsketch_buckets`` drops them and reports the kept count
via the sketch mass itself — the catalog entry carries explicit
``n_nonpositive`` companions).

Scale: bucket domain per group is ~ln(max/min)/ln(gamma) — a few
hundred buckets for any realistic value range at alpha=0.01 — so the
post-agg quantile walk (a cumulative window over the bounded bucket
table) is the bounded-domain window posture, never a sort of raw rows.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ddsketch_buckets", "ddsketch_quantiles", "gamma_for"]


def gamma_for(alpha: float) -> float:
    return (1 + alpha) / (1 - alpha)


def ddsketch_buckets(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    alpha: float = 0.01,
) -> DataFrame:
    """(group_cols..., bucket, c): the storable/mergeable sketch over
    the POSITIVE values of ``value_col``. Merge = groupBy sum."""
    gamma = gamma_for(alpha)
    bucket = F.ceil(F.log(F.col(value_col)) / F.lit(math.log(gamma)))
    return (
        df.filter(F.col(value_col) > 0)
        .groupBy(*group_cols, bucket.cast("long").alias("bucket"))
        .agg(F.count("*").cast("long").alias("c"))
    )


def ddsketch_quantiles(
    sketch: DataFrame,
    qs: Sequence[float],
    group_cols: Sequence[str] = (),
    alpha: float = 0.01,
) -> DataFrame:
    """Read quantile estimates out of a DDSketch bucket table.

    Convention (mirrored exactly by the SQL oracle): the q-quantile is
    the value estimate of the first bucket whose cumulative count
    reaches rank ``floor(q*(n-1)) + 1``; the estimate is the bucket
    midpoint ``2*gamma^i/(gamma+1)``, within relative error alpha of
    every value the bucket holds.

    Plan: one cumulative window over the bounded per-group bucket
    table + one agg — the raw data never re-enters.
    """
    gamma = gamma_for(alpha)
    gcols = list(group_cols)
    w = Window.partitionBy(*gcols).orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wn = Window.partitionBy(*gcols)
    cum = sketch.select(
        *gcols,
        "bucket",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(wn).alias("n"),
    )
    aggs = [F.max("n").cast("long").alias("n_values")]
    out_names = []
    picked = cum
    for q in qs:
        rank = F.floor(F.lit(q) * (F.col("n") - 1)) + 1
        name = "p" + f"{q * 100:g}".replace(".", "_")
        out_names.append(name)
        picked = picked.withColumn(
            f"_b_{name}",
            F.when(F.col("cum") >= rank, F.col("bucket")),
        )
        aggs.append(F.min(f"_b_{name}").alias(f"_qb_{name}"))
    agg = picked.groupBy(*gcols).agg(*aggs)
    for name in out_names:
        agg = agg.withColumn(
            name,
            F.round(
                F.lit(2.0)
                * F.pow(F.lit(gamma), F.col(f"_qb_{name}"))
                / F.lit(gamma + 1),
                4,
            ),
        ).drop(f"_qb_{name}")
    return agg
