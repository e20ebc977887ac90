"""Custom Python Data Source (tlc_synthetic): partition-parallel
generation, source-level filter pushdown (fewer planned partitions),
determinism, and integration with the taxi analytics plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_etl_spark.sources.tripsource import register


def _load(spark, **opts):
    register(spark)
    r = spark.read.format("tlc_synthetic")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_partitions_and_counts(spark):
    df = _load(spark, months=2, rows_per_month=100)
    assert df.count() == 4 * 2 * 100  # cabs × months × rows
    assert df.rdd.getNumPartitions() == 8


def test_filter_pushdown_prunes_partitions(spark):
    df = _load(spark, months=3, rows_per_month=50)
    y = df.filter(F.col("cab_type") == "yellow")
    assert y.rdd.getNumPartitions() == 3  # 1 cab × 3 months
    assert y.count() == 150
    two = df.filter(F.col("cab_type").isin("yellow", "green"))
    assert two.rdd.getNumPartitions() == 6
    # non-partition filters still evaluate correctly post-scan
    far = df.filter((F.col("cab_type") == "green") & (F.col("trip_distance") > 10))
    assert far.count() == far.filter(F.col("trip_distance") > 10).count()


def test_deterministic_reads(spark):
    a = _load(spark, months=1, rows_per_month=200).collect()
    b = _load(spark, months=1, rows_per_month=200).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_rows_are_wellformed(spark):
    df = _load(spark, months=1, rows_per_month=300)
    bad = df.filter(
        (F.col("dropoff_datetime") <= F.col("pickup_datetime"))
        | (F.col("trip_distance") <= 0)
        | (F.col("total_amount") < F.col("fare_amount"))
        | (F.month("pickup_datetime") != 1)
    ).count()
    assert bad == 0


def test_feeds_taxi_analytics(spark):
    from nyc_taxi_etl_spark.plans.taxi_analytics import per_cab_summary

    df = _load(spark, months=2, rows_per_month=200)
    out = {r.cab_type: r for r in per_cab_summary(df).collect()}
    assert set(out) == {"yellow", "green", "fhv", "fhvhv"}
    for r in out.values():
        assert r.trip_count == 400
        assert r.total_fare > 0
