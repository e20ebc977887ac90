"""Scale-pattern tests: bucketed co-located joins plan with zero
shuffle Exchanges; salted aggregation/join match their plain
equivalents exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_taxi_etl_spark.functions.skew import salted_agg, salted_broadcast_join
from nyc_taxi_etl_spark.sources.bucketing import bucket_table, is_exchange_free

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    # warehouse dir is a static conf — managed tables land in the
    # session default; DROP TABLE in teardown removes the files
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    bucket_table(li, "lineitem_b", ["l_orderkey"], 8)
    bucket_table(o, "orders_b", ["o_orderkey"], 8)
    yield spark
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")


def test_bucketed_join_is_exchange_free(bucketed):
    spark = bucketed
    # disable AQE broadcast conversion so the sort-merge path is planned
    with_amj = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("lineitem_b").join(
            spark.table("orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        assert is_exchange_free(j), j._jdf.queryExecution().executedPlan().toString()
        # and it computes the right thing
        expect = (
            spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
            .join(
                spark.read.parquet(f"{SF_DIR}/orders.parquet"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert j.count() == expect
    finally:
        if with_amj is not None:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", with_amj)


def test_bucketed_agg_is_exchange_free(bucketed):
    spark = bucketed
    g = spark.table("lineitem_b").groupBy("l_orderkey").agg(F.sum("l_quantity"))
    assert is_exchange_free(g), g._jdf.queryExecution().executedPlan().toString()


def test_unbucketed_join_has_exchange(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        assert not is_exchange_free(j)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_salted_agg_matches_plain(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    salted = salted_agg(
        li,
        ["l_returnflag"],
        {
            "n": ("count", F.count("*")),
            "qty": ("sum", F.sum("l_quantity")),
            "hi": ("max", F.max("l_extendedprice")),
            "lo": ("min", F.min("l_extendedprice")),
        },
        salt_buckets=7,
    ).toPandas().set_index("l_returnflag").sort_index()
    plain = (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum("l_quantity").alias("qty"),
            F.max("l_extendedprice").alias("hi"),
            F.min("l_extendedprice").alias("lo"),
        )
        .toPandas()
        .set_index("l_returnflag")
        .sort_index()
    )
    assert (salted["n"] == plain["n"]).all()
    assert (abs(salted["qty"] - plain["qty"]) < 1e-6).all()
    assert (salted["hi"] == plain["hi"]).all() and (salted["lo"] == plain["lo"]).all()


def test_salted_agg_rejects_unknown_merge(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    with pytest.raises(ValueError, match="unsupported"):
        salted_agg(li, ["l_returnflag"], {"a": ("avg", F.avg("l_quantity"))})


def test_salted_join_matches_plain(spark):
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet").select("c_custkey", "c_name")
    salted = salted_broadcast_join(o, c, "o_custkey", "c_custkey", salt_buckets=5)
    plain = o.join(c, F.col("o_custkey") == F.col("c_custkey"))
    assert salted.count() == plain.count()
    s_rev = salted.agg(F.sum("o_totalprice")).collect()[0][0]
    p_rev = plain.agg(F.sum("o_totalprice")).collect()[0][0]
    assert abs(s_rev - p_rev) < 1e-4
