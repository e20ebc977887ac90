"""KMV bottom-k sketch invariants (operators/kmv.py) beyond the
bit-exact DuckDB oracle (tests/test_oracle.py covers
source_shingle_overlap_kmv end-to-end)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_taxi_etl_spark.operators.kmv import (
    HASH_SPACE,
    kmv_estimate,
    kmv_pair_overlap,
    kmv_sketches,
)


def _members(spark, group_sizes, overlap=0):
    """Frame with |group_sizes| groups; group g holds values
    g*100000..g*100000+n, plus the first ``overlap`` values of group 0
    mixed into every group."""
    rows = []
    for g, n in enumerate(group_sizes):
        for v in range(n):
            rows.append((f"g{g}", g * 100_000 + v))
        if g > 0:
            for v in range(overlap):
                rows.append((f"g{g}", v))
    return spark.createDataFrame(rows, "grp string, val long")


def test_below_k_is_exact(spark):
    df = _members(spark, [10, 37])
    sk = kmv_sketches(df, ["grp"], "val", k=64, salt_mod=8)
    out = {
        r["grp"]: r
        for r in sk.select(
            "grp",
            F.size("sketch").alias("n"),
            kmv_estimate(F.col("sketch"), 64).alias("est"),
        ).collect()
    }
    assert out["g0"]["n"] == 10 and out["g0"]["est"] == 10.0
    assert out["g1"]["n"] == 37 and out["g1"]["est"] == 37.0


def test_sketch_sorted_capped_and_duplicate_insensitive(spark):
    df = _members(spark, [500])
    doubled = df.union(df)  # duplicates must not change a distinct sketch
    sk1 = kmv_sketches(df, ["grp"], "val", k=32).collect()[0]["sketch"]
    sk2 = kmv_sketches(doubled, ["grp"], "val", k=32).collect()[0]["sketch"]
    assert sk1 == sk2
    assert len(sk1) == 32
    assert sk1 == sorted(sk1)
    assert all(0 <= h < HASH_SPACE for h in sk1)


def test_estimate_envelope(spark):
    # k=256 -> rse ~ 1/sqrt(254) ~ 6.3%; assert a loose 4-sigma band
    df = _members(spark, [5000])
    sk = kmv_sketches(df, ["grp"], "val", k=256)
    est = sk.select(kmv_estimate(F.col("sketch"), 256)).collect()[0][0]
    assert 5000 * 0.75 <= est <= 5000 * 1.25


def test_pair_overlap_exact_mode_and_jaccard(spark):
    # 30 + 30 values with 10 shared; k far above union size -> every
    # column is exact: jaccard = 10/50, common = 10
    df = _members(spark, [30, 20], overlap=10)
    sk = kmv_sketches(df, ["grp"], "val", k=256)
    row = kmv_pair_overlap(sk, "grp", k=256).collect()[0]
    assert (row["key_a"], row["key_b"]) == ("g0", "g1")
    assert row["est_a"] == 30.0 and row["est_b"] == 30.0
    assert row["est_union"] == 50.0
    assert row["est_jaccard"] == pytest.approx(10 / 50)
    assert row["est_common"] == pytest.approx(10.0)


def test_pair_overlap_estimator_tracks_truth(spark):
    # 4000-value groups sharing 2000 -> true union 6000, J = 1/3;
    # k=256 Jaccard rse ~ sqrt(J(1-J)/k) ~ 3pp; assert generous bands
    df = _members(spark, [4000, 2000], overlap=2000)
    sk = kmv_sketches(df, ["grp"], "val", k=256)
    row = kmv_pair_overlap(sk, "grp", k=256).collect()[0]
    assert 6000 * 0.8 <= row["est_union"] <= 6000 * 1.2
    assert 1 / 3 - 0.15 <= row["est_jaccard"] <= 1 / 3 + 0.15
    assert 2000 * 0.55 <= row["est_common"] <= 2000 * 1.45


def test_sketch_col_collision_raises(spark):
    df = _members(spark, [5]).withColumn("sketch", F.lit(1))
    with pytest.raises(ValueError):
        kmv_sketches(df, ["grp"], "val", k=8)
