"""Bucketed-table behaviors beyond the exchange-free joins already
pinned in test_scale_patterns.py: bucket-pruned point lookups and the
mismatched-bucket-count re-shuffle shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_taxi_etl_spark.sources.bucketing import bucket_table
from nyc_taxi_etl_spark.sources.catalog import load_table

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed(spark):
    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    bucket_table(orders, "bp_orders", ["o_orderkey"], 8)
    bucket_table(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "bp_lineitem",
        ["o_orderkey"],
        8,
    )
    bucket_table(orders, "bp_orders4", ["o_orderkey"], 4)
    yield
    for t in ["bp_orders", "bp_lineitem", "bp_orders4"]:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_mismatched_bucket_counts_shuffle_one_side(spark, bucketed):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o4 = spark.table("bp_orders4")
        li8 = spark.table("bp_lineitem")
        plan = _plan(
            o4.join(li8, "o_orderkey").select("o_orderkey", "l_quantity")
        )
        # exactly one side re-distributes to the other's bucket count
        assert plan.count("Exchange") == 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucket_pruning_on_point_lookup(spark, bucketed):
    o = spark.table("bp_orders")
    key = o.select("o_orderkey").first().o_orderkey
    got = o.filter(F.col("o_orderkey") == key)
    prev = spark.conf.get("spark.sql.maxMetadataStringLength")
    prev_auto = spark.conf.get(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    )
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    # autoBucketedScan turns the bucketed layout OFF for plans where no
    # operator needs the distribution (a bare filter) — but pruning
    # needs the bucketed scan, so pin it on for point lookups
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
    )
    try:
        plan = _plan(got)
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", prev)
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", prev_auto
        )
    # 1 of 8 buckets selected at scan time
    assert "SelectedBucketsCount: 1 out of 8" in plan, plan
    expect = (
        load_table(spark, SF_DIR, "orders")
        .filter(F.col("o_orderkey") == key)
        .count()
    )
    assert got.count() == expect > 0
