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


@query(
    "heavy_hitter_users",
    """
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1
    ORDER BY n_events DESC, user_id ASC LIMIT 6
    """,
    extra=True,
)
def heavy_hitter_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based heavy hitters (``approx_top_k``): the streaming-
    friendly frequent-items aggregate, run with capacity (10 000) far
    above the distinct-user count so every tracked count is EXACT and
    the entry hash-matches the exact top-k oracle.

    k=6 deliberately: it is the longest tie-free prefix of this
    dataset's frequency table — a sketch returns an arbitrary member
    subset at a count tie (ranks 7-13 here all sit at 80-81 events),
    and unlike the exact top-k entries there is no in-sketch tiebreak
    to pin membership. That boundary behavior is the documented
    trade-off of frequency sketches, not a bug.

    Scale: one pass, mergeable map-side partials, O(capacity) space —
    at real cardinalities pick capacity ≫ k for bounded error and
    re-rank the candidate set exactly (same posture as the ANN
    re-rank stages)."""
    ev = t(spark, sf_dir, "events")
    top = ev.agg(
        F.expr("approx_top_k(user_id, 6, 10000)").alias("tk")
    )
    return (
        top.select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").cast("long").alias("user_id"),
            F.col("e.count").cast("long").alias("n_events"),
        )
        .orderBy(F.col("n_events").desc(), F.col("user_id").asc())
    )
