"""PageRank invariants on closed-form graphs plus probability-mass
conservation on the catalog graph."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_taxi_etl_spark.operators.graph import pagerank


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {r.node: r.rank for r in pagerank(df, **kw).collect()}


def test_two_node_cycle_is_uniform(spark):
    r = _ranks(spark, [("a", "b"), ("b", "a")])
    assert r["a"] == pytest.approx(0.5)
    assert r["b"] == pytest.approx(0.5)
    assert sum(r.values()) == pytest.approx(1.0)


def test_star_sink_ranks_highest_and_mass_conserved(spark):
    # a,b,c all point at hub; hub is dangling
    r = _ranks(spark, [("a", "hub"), ("b", "hub"), ("c", "hub")])
    assert r["hub"] > r["a"]
    assert r["a"] == pytest.approx(r["b"]) == pytest.approx(r["c"])
    # dangling redistribution keeps total mass at 1 every iteration
    assert sum(r.values()) == pytest.approx(1.0)


def test_chain_orders_by_depth(spark):
    r = _ranks(spark, [("a", "b"), ("b", "c")])
    assert r["c"] > r["b"] > r["a"]
    assert sum(r.values()) == pytest.approx(1.0)
