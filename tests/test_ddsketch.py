"""DDSketch invariants the catalog oracle can't express:

* mergeability — sketches of two disjoint halves, merged by per-bucket
  count addition, equal the whole-corpus sketch exactly (the property
  that makes it a storable pre-aggregate);
* the relative-error guarantee — every estimated quantile is within
  alpha (1%) of the EXACT percentile of the kept (positive) values.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_etl_spark.operators.ddsketch import (
    ddsketch_buckets,
    ddsketch_quantiles,
)
from nyc_taxi_etl_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.01"
ALPHA = 0.01


def test_merge_of_halves_equals_whole(spark):
    ev = load_table(spark, SF_DIR, "events")
    whole = ddsketch_buckets(ev, "value", ["event_type"], ALPHA)
    h1 = ddsketch_buckets(
        ev.filter(F.col("event_id") % 2 == 0), "value", ["event_type"], ALPHA
    )
    h2 = ddsketch_buckets(
        ev.filter(F.col("event_id") % 2 == 1), "value", ["event_type"], ALPHA
    )
    merged = (
        h1.unionByName(h2)
        .groupBy("event_type", "bucket")
        .agg(F.sum("c").alias("c"))
    )
    key = lambda rows: {(r["event_type"], r["bucket"]): r["c"] for r in rows}
    assert key(merged.collect()) == key(whole.collect())


def test_quantiles_within_relative_error(spark):
    ev = load_table(spark, SF_DIR, "events").filter(F.col("value") > 0)
    sk = ddsketch_buckets(ev, "value", ["event_type"], ALPHA)
    qs = [0.5, 0.9, 0.99]
    est = {
        r["event_type"]: (r["p50"], r["p90"], r["p99"])
        for r in ddsketch_quantiles(sk, qs, ["event_type"], ALPHA).collect()
    }
    exact = {
        r["event_type"]: (r["e50"], r["e90"], r["e99"])
        for r in ev.groupBy("event_type")
        .agg(
            *[
                F.expr(f"percentile(value, {q})").alias(f"e{int(q * 100)}")
                for q in qs
            ]
        )
        .collect()
    }
    assert set(est) == set(exact) and est
    for etype, vals in est.items():
        for got, true in zip(vals, exact[etype]):
            # bucket midpoint is within alpha of every member; the
            # rank convention (floor(q*(n-1))+1 vs interpolated exact
            # percentile) adds at most one bucket of slack
            assert abs(got - true) <= 3 * ALPHA * true, (
                etype,
                got,
                true,
            )
