"""Sketch-based catalog queries: mergeable HLL distinct counts.

Rows-only by design: the estimates come from Apache DataSketches HLL
inside Spark — DuckDB's approx_distinct is a different HLL
implementation, so a value-level oracle cannot exist. The error
envelope and the merge-vs-whole consistency are pinned in
tests/test_hll_sketches.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketches import keyed_sketches, trailing_union, union_estimate
from .queries import query, t


@query("distinct_users_hll_rollup", None, extra=True)
def distinct_users_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day and trailing-7-day distinct-user estimates from ONE
    pass over events: daily HLL sketches (the storable pre-aggregate)
    are estimated per day and union-merged per trailing window. The
    trailing-distinct column is the query additive counts cannot
    answer — distinct users over a week ≠ sum of daily distincts —
    and the sketch table answers it WITHOUT rescanning raw events.

    Scale: raw data is touched exactly once (daily sketch agg,
    map-side partial); everything downstream operates on |days| rows
    × 16 KiB sketches. Appending a new day produces one new sketch
    row and every historical rollup stays valid — the incremental-
    analytics pattern for 100 TB event streams."""
    ev = t(spark, sf_dir, "events")
    daily = keyed_sketches(
        ev.withColumn("d", F.to_date("ts")), ["d"], "user_id"
    )
    daily = daily.persist()  # shared by the per-day and trailing paths
    per_day = union_estimate(daily, ["d"], out_col="distinct_users")
    trailing = trailing_union(daily, "d", days=7, out_col="distinct_users_7d")
    out = (
        per_day.join(
            trailing, per_day["d"] == trailing["target_date"]
        )
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "distinct_users",
            "distinct_users_7d",
            "days_merged",
        )
        .orderBy("day")
    )
    return out
