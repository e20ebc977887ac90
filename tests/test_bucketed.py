"""Bucketed-table co-location: the join/agg plans must show NO
exchange on the bucketed key, results must equal the plain-parquet
join, and mismatched bucket counts must re-shuffle only one side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_taxi_etl_spark.sources.bucketed import read_bucketed, write_bucketed
from nyc_taxi_etl_spark.sources.catalog import load_table

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed(spark):
    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ["o_orderkey"],
        8,
    )
    write_bucketed(orders, "b_orders4", ["o_orderkey"], 4)
    yield
    for t in ["b_orders", "b_lineitem", "b_orders4"]:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    return prev


def test_bucketed_join_has_no_exchange(spark, bucketed):
    prev = _no_broadcast(spark)
    try:
        o = read_bucketed(spark, "b_orders")
        li = read_bucketed(spark, "b_lineitem")
        j = o.join(li, "o_orderkey").select("o_orderkey", "l_quantity")
        plan = _plan(j)
        assert "Exchange" not in plan, plan
        # within-bucket sortBy also removes the sort-merge Sort
        assert "SortMergeJoin" in plan
        # and the result is the same as the plain-parquet join
        raw = load_table(spark, SF_DIR, "orders").join(
            load_table(spark, SF_DIR, "lineitem").withColumnRenamed(
                "l_orderkey", "o_orderkey"
            ),
            "o_orderkey",
        )
        assert j.count() == raw.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_groupby_has_no_exchange(spark, bucketed):
    o = read_bucketed(spark, "b_orders")
    agg = o.groupBy("o_orderkey").agg(F.sum("o_totalprice"))
    assert "Exchange" not in _plan(agg)


def test_mismatched_bucket_counts_shuffle_one_side(spark, bucketed):
    prev = _no_broadcast(spark)
    try:
        o4 = read_bucketed(spark, "b_orders4")
        li8 = read_bucketed(spark, "b_lineitem")
        plan = _plan(
            o4.join(li8, "o_orderkey").select("o_orderkey", "l_quantity")
        )
        # exactly one side re-distributes to the other's bucket count
        assert plan.count("Exchange") == 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucket_pruning_on_point_lookup(spark, bucketed):
    o = read_bucketed(spark, "b_orders")
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
