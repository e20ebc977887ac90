"""Operator-level semantics for sorted_neighborhood_pairs and
skyline_2d, pinned against brute-force references on adversarial
small inputs (ties, duplicates, empty, collision guards) — the oracle
suite covers the catalog entries; these cover the operators' contracts
under inputs the test tables don't exercise."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from nyc_taxi_etl_spark.operators.neighborhood import (
    sorted_neighborhood_pairs,
)
from nyc_taxi_etl_spark.operators.skyline import skyline_2d

from .conftest import spark  # noqa: F401  (fixture re-export)


def _brute_skyline(rows):
    """NOT EXISTS dominance, straight from the ICDE'01 definition."""
    out = []
    for p in rows:
        dominated = any(
            q[0] <= p[0] and q[1] >= p[1] and (q[0] < p[0] or q[1] > p[1])
            for q in rows
        )
        if not dominated:
            out.append(p)
    return sorted(out)


@pytest.mark.parametrize("bucket_width", [1, 3, 1000])
def test_skyline_matches_bruteforce_with_ties(spark, bucket_width):
    # duplicates on both dims, ties on one dim, a dominated duplicate
    rows = [
        (10, 5), (10, 5),   # exact duplicates: both survive
        (10, 3),            # same price, smaller: dominated
        (12, 5),            # pricier, same size: dominated
        (8, 4), (9, 9), (9, 9), (15, 10), (15, 9), (7, 1),
    ]
    df = spark.createDataFrame(rows, "mn: long, mx: long")
    got = sorted(
        (r["mn"], r["mx"])
        for r in skyline_2d(df, "mn", "mx", bucket_width).collect()
    )
    assert got == _brute_skyline(rows)


def test_skyline_single_row_and_empty(spark):
    one = spark.createDataFrame([(5, 5)], "mn: long, mx: long")
    assert skyline_2d(one, "mn", "mx").count() == 1
    empty = one.filter(F.lit(False))
    assert skyline_2d(empty, "mn", "mx").count() == 0


def test_skyline_rejects_bad_inputs(spark):
    df = spark.createDataFrame([(1.5, 2)], "mn: double, mx: long")
    with pytest.raises(ValueError, match="integer-typed"):
        skyline_2d(df, "mn", "mx")
    good = spark.createDataFrame([(1, 2)], "mn: long, mx: long")
    with pytest.raises(ValueError, match="bucket_width"):
        skyline_2d(good, "mn", "mx", bucket_width=0)
    clash = good.withColumn("_sky_prev", F.lit(1))
    with pytest.raises(ValueError, match="_sky_prev"):
        skyline_2d(clash, "mn", "mx")


def test_skyline_auto_width_bounds_buckets_on_sparse_domain(spark):
    """ADVICE r7: bucket_width=None must derive a width from the
    observed span so a sparse 64-bit domain (epoch-micros-like values)
    yields a bounded bucket table — and the same frontier."""
    rows = [
        (1_600_000_000_000_000 + i * 37_000_000_000, (i * 7919) % 101)
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "mn: long, mx: long")
    got = sorted(
        (r["mn"], r["mx"])
        for r in skyline_2d(
            df, "mn", "mx", bucket_width=None, target_buckets=16
        ).collect()
    )
    assert got == _brute_skyline(rows)
    # empty input with auto width must not divide by zero / probe-crash
    empty = df.filter(F.lit(False))
    assert skyline_2d(empty, "mn", "mx", bucket_width=None).count() == 0


@pytest.mark.parametrize("window", [1, 3, 7])
def test_sorted_neighborhood_matches_sequential_window(spark, window):
    """The banded equi-join must emit EXACTLY the pairs a sequential
    sliding window over the sorted list would emit — verified for
    window sizes that do and don't divide the row count."""
    vals = ["kiwi", "kiwj", "apple", "appla", "apple", "banana",
            "bananna", "kivi", "pear", "peer", "pearl"]
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "rid: long, name: string")
    got = {
        (r["a_rid"], r["b_rid"])
        for r in sorted_neighborhood_pairs(
            df, ["name", "rid"], window=window
        ).collect()
    }
    ordered = [rid for _, rid in sorted((v, i) for i, v in rows)]
    want = {
        (ordered[i], ordered[j])
        for i, j in itertools.combinations(range(len(ordered)), 2)
        if j - i <= window
    }
    assert got == want


def test_sorted_neighborhood_guards(spark):
    df = spark.createDataFrame([(1, "a")], "rid: long, name: string")
    with pytest.raises(ValueError, match="window"):
        sorted_neighborhood_pairs(df, ["name"], window=0)
    clash = df.withColumn("_snb_seq", F.lit(1))
    with pytest.raises(ValueError, match="_snb_seq"):
        sorted_neighborhood_pairs(clash, ["name"], window=2)
    # ADVICE r7: equal prefixes (ambiguous output) must be rejected
    with pytest.raises(ValueError, match="prefix"):
        sorted_neighborhood_pairs(df, ["name"], window=2, a_prefix="x_", b_prefix="x_")
    # prefixed-name collision across sides: 'x' vs 'a_x' under defaults
    tricky = spark.createDataFrame([(1, 2)], "x: long, a_x: long")
    with pytest.raises(ValueError, match="collide"):
        sorted_neighborhood_pairs(tricky, ["x"], window=2, a_prefix="a_", b_prefix="a_a_")
