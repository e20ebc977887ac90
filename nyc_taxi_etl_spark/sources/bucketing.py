"""Bucketed tables: shuffle-free co-located joins and aggregations.

At 100 TB the dominant cost of `lineitem ⋈ orders`-shaped joins is the
exchange of both sides on the key. Writing both tables bucketed by that
key (`bucketBy(n, key)` + `sortBy`) lets Spark plan a sort-merge join
with NO Exchange on either side — each bucket pair joins locally. The
reference had nothing like this (its one join was a pandas merge); this
is the engine's deliberate scale posture (SURVEY.md §4: "optimizations
the rebuild adds").

Usage pattern (write once, join many):

    bucket_table(li, "lineitem_b", ["l_orderkey"], 64)
    bucket_table(o, "orders_b", ["o_orderkey"], 64)
    j = spark.table("lineitem_b").join(
        spark.table("orders_b"),
        F.col("l_orderkey") == F.col("o_orderkey"))
    # plan: SortMergeJoin over two bucketed scans, zero Exchange

Notes:
  * bucket counts must match (or be multiples, with
    ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``);
  * bucketing requires ``saveAsTable`` (metastore-backed) — Spark's
    file-only writer cannot record bucket metadata;
  * AQE leaves bucketed plans alone (no runtime re-shuffle), so the
    static bucket count should match target parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["bucket_table", "is_exchange_free"]


def bucket_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.format("parquet").saveAsTable(table_name)


def is_exchange_free(df: DataFrame) -> bool:
    """True when the physical plan contains no shuffle Exchange —
    the assertion that a bucketed join/agg stayed co-located.
    (BroadcastExchange is not a shuffle and is ignored.)"""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return not any(
        line.strip().startswith(("Exchange", "+- Exchange", ":- Exchange"))
        or "Exchange hashpartitioning" in line
        for line in plan.splitlines()
        if "BroadcastExchange" not in line
    )


# Bucket pruning caveat (tests/test_bucketed.py): an equality
# predicate on the bucket key scans ONE bucket's files
# (SelectedBucketsCount in the scan) — but autoBucketedScan disables
# the bucketed layout for plans where no operator needs the
# distribution (a bare filter), which also disables pruning. Pin
# spark.sql.sources.bucketing.autoBucketedScan.enabled=false for
# point-lookup workloads. Mismatched bucket counts re-shuffle exactly
# one side (the other keeps its layout).
