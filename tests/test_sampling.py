"""Stratified hash sampling: rates land near targets, absent strata
drop, and the subset is identical across runs (no RNG)."""

from __future__ import annotations

from nyc_taxi_etl_spark.operators.sampling import stratified_hash_sample
from nyc_taxi_etl_spark.sources.catalog import load_table

from .conftest import SF_DIR


def test_rates_and_determinism(spark):
    orders = load_table(spark, SF_DIR, "orders")
    totals = {r["o_orderstatus"]: r["n"] for r in
              orders.groupBy("o_orderstatus").count().withColumnRenamed("count", "n").collect()}
    sampled = stratified_hash_sample(
        orders, "o_orderkey", "o_orderstatus", {"F": 100, "O": 100}
    )
    got = {r["o_orderstatus"]: r["n"] for r in
           sampled.groupBy("o_orderstatus").count().withColumnRenamed("count", "n").collect()}
    assert "P" not in got  # default rate 0 drops absent strata
    for s in ("F", "O"):
        frac = got[s] / totals[s]
        assert 0.05 < frac < 0.16, (s, frac)  # ~10% +/- sampling noise
    # determinism: exact same keys both times
    a = sorted(r["o_orderkey"] for r in sampled.select("o_orderkey").collect())
    b = sorted(r["o_orderkey"] for r in sampled.select("o_orderkey").collect())
    assert a == b and len(a) == sum(got.values())
