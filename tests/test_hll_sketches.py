"""Error-envelope and mergeability pins for the HLL sketch operators
(no DuckDB oracle can exist: DataSketches HLL ≠ DuckDB's HLL)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_etl_spark.operators.sketches import (
    keyed_sketches,
    trailing_union,
    union_estimate,
)
from nyc_taxi_etl_spark.plans.queries_sketches import distinct_users_hll_rollup
from nyc_taxi_etl_spark.sources.catalog import load_table

from .conftest import SF_DIR

# lgK=14 → relative standard error ≈ 1.04/sqrt(2^14) ≈ 0.8%; allow 4σ
_REL_TOL = 0.033


def _events_daily(spark):
    ev = load_table(spark, SF_DIR, "events").withColumn("d", F.to_date("ts"))
    return ev


def test_daily_estimates_within_envelope(spark):
    ev = _events_daily(spark)
    exact = {
        r.d: r.n
        for r in ev.groupBy("d")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    daily = keyed_sketches(ev, ["d"], "user_id")
    est = union_estimate(daily, ["d"], out_col="est").collect()
    assert len(est) == len(exact)
    for r in est:
        e = exact[r.d]
        assert abs(r.est - e) <= max(3, _REL_TOL * e), (r.d, r.est, e)


def test_union_of_daily_matches_whole_table_envelope(spark):
    """Merging per-day sketches must estimate the same population as
    one sketch over the whole table — the property that makes stored
    sketches answer arbitrary-range rollups without rescanning."""
    ev = _events_daily(spark)
    exact = ev.select(F.count_distinct("user_id")).first()[0]
    daily = keyed_sketches(ev, ["d"], "user_id")
    merged = union_estimate(daily, [], out_col="est").first().est
    whole = (
        ev.agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(14))))
        .first()[0]
    )
    assert abs(merged - exact) <= max(3, _REL_TOL * exact)
    # merge of partitions vs single pass: same sketch algorithm on the
    # same values — estimates agree to within the envelope of each other
    assert abs(merged - whole) <= max(3, _REL_TOL * exact)


def test_trailing_union_beats_additive_counts(spark):
    """Trailing-7d distinct ≤ sum of the 7 daily distincts (users
    repeat across days) and matches the exact trailing distinct."""
    ev = _events_daily(spark)
    daily = keyed_sketches(ev, ["d"], "user_id")
    t7 = {
        r.target_date: (r.est, r.days_merged)
        for r in trailing_union(daily, "d", days=7, out_col="est").collect()
    }
    # exact trailing-7d via self-join replay
    a, b = ev.alias("a"), ev.select("d").distinct().alias("b")
    exact = {
        r.target_d: r.n
        for r in a.join(
            b,
            (F.col("a.d") <= F.col("b.d"))
            & (F.col("a.d") >= F.date_sub(F.col("b.d"), 6)),
        )
        .select(F.col("b.d").alias("target_d"), F.col("a.user_id"))
        .groupBy("target_d")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(t7) == set(exact)
    for d, (est, days_merged) in t7.items():
        assert 1 <= days_merged <= 7
        assert abs(est - exact[d]) <= max(3, _REL_TOL * exact[d]), (
            d,
            est,
            exact[d],
        )


def test_catalog_entry_shape(spark):
    out = distinct_users_hll_rollup(spark, SF_DIR)
    rows = out.collect()
    assert len(rows) == 30  # 30 days in the sf events table
    for r in rows:
        # a trailing window can never be smaller than its own day
        assert r.distinct_users_7d >= 0.9 * r.distinct_users


# ---------------------------------------------------------------------------
# Count-Min sketch (operators/sketches.py::cms_table / cms_estimate)
# ---------------------------------------------------------------------------


def test_cms_merge_of_halves_equals_whole(spark):
    """Mergeability — the pre-aggregate contract: summing the counter
    tables of two disjoint halves reproduces the whole-corpus sketch
    exactly."""
    from pyspark.sql import functions as F

    from nyc_taxi_etl_spark.operators.sketches import cms_table

    df = spark.range(0, 5000).select((F.col("id") % 97).alias("k"), "id")
    whole = {
        (r["j"], r["bucket"]): r["c"]
        for r in cms_table(df, "k", depth=3, width=32).collect()
    }
    h1 = cms_table(df.filter(F.col("id") % 2 == 0), "k", depth=3, width=32)
    h2 = cms_table(df.filter(F.col("id") % 2 == 1), "k", depth=3, width=32)
    merged = {
        (r["j"], r["bucket"]): r["c"]
        for r in h1.unionAll(h2)
        .groupBy("j", "bucket")
        .agg(F.sum("c").alias("c"))
        .collect()
    }
    assert merged == whole


def test_cms_estimate_one_sided(spark):
    """est >= exact for every key (CMS never undercounts), and with a
    width far above the cardinality every estimate is exact."""
    from pyspark.sql import functions as F

    from nyc_taxi_etl_spark.operators.sketches import cms_estimate, cms_table

    df = spark.range(0, 3000).select((F.col("id") % 11).alias("k"))
    exact = df.groupBy("k").agg(F.count("*").alias("exact_n"))
    for width, must_be_exact in [(8, False), (4096, True)]:
        sk = cms_table(df, "k", depth=4, width=width)
        est = cms_estimate(sk, exact, "k", depth=4, width=width).collect()
        assert all(r["cms_est"] >= r["exact_n"] for r in est)
        if must_be_exact:
            assert all(r["cms_est"] == r["exact_n"] for r in est)


def test_cms_estimate_unseen_key_is_zero(spark):
    """A key the sketch never saw must estimate 0 (empty bucket =
    counter 0) — not vanish from the output, not inherit a colliding
    bucket's count via an inner join."""
    from pyspark.sql import functions as F

    from nyc_taxi_etl_spark.operators.sketches import cms_estimate, cms_table

    df = spark.range(0, 100).select((F.col("id") % 5).alias("k"))
    sk = cms_table(df, "k", depth=4, width=4096)
    cand = spark.createDataFrame([(1,), (999,)], ["k"])
    est = {r["k"]: r["cms_est"] for r in cms_estimate(sk, cand, "k", depth=4, width=4096).collect()}
    assert est == {1: 20, 999: 0}


def test_cms_estimate_rejects_out_col_collision(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from nyc_taxi_etl_spark.operators.sketches import cms_estimate, cms_table

    df = spark.range(0, 10).select((F.col("id") % 2).alias("k"))
    sk = cms_table(df, "k")
    cand = df.groupBy("k").agg(F.count("*").alias("cms_est"))
    with _pytest.raises(ValueError):
        cms_estimate(sk, cand, "k")


def test_cms_estimate_candidate_frame_with_sketch_columns(spark):
    """Candidates carrying j/bucket/c columns (sketch-shaped frames)
    must not collide with the estimator's internals."""
    from pyspark.sql import functions as F

    from nyc_taxi_etl_spark.operators.sketches import cms_estimate, cms_table

    df = spark.range(0, 60).select((F.col("id") % 3).alias("k"))
    sk = cms_table(df, "k", depth=3, width=512)
    cand = df.groupBy("k").agg(
        F.count("*").alias("c"),
        F.lit(0).alias("j"),
        F.lit(0).alias("bucket"),
    )
    est = cms_estimate(sk, cand, "k", depth=3, width=512).collect()
    assert all(r["cms_est"] == r["c"] == 20 for r in est)
