"""Sketch-based approximate aggregates: the documented 100 TB swaps
for exact distinct-count and exact percentile. The engine's catalog
keeps EXACT variants (they hash-match oracles); these tests pin the
approximate counterparts' error envelopes so the swap is a measured,
not hoped-for, trade."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_etl_spark.sources.catalog import load_table

from .conftest import SF_DIR


def test_approx_count_distinct_within_rsd(spark):
    ev = load_table(spark, SF_DIR, "events")
    exact = ev.select(F.count_distinct("user_id")).first()[0]
    approx = ev.select(F.approx_count_distinct("user_id", rsd=0.02)).first()[0]
    # HLL++ at rsd=0.02: generous 3-sigma-ish envelope
    assert abs(approx - exact) <= max(3, 0.06 * exact)


def test_approx_percentile_within_accuracy(spark):
    ev = load_table(spark, SF_DIR, "events")
    exact = ev.select(F.percentile("value", 0.5)).first()[0]
    approx = ev.select(
        F.percentile_approx("value", 0.5, accuracy=10_000)
    ).first()[0]
    spread = ev.select(F.max("value") - F.min("value")).first()[0]
    assert abs(approx - exact) <= 0.01 * spread
