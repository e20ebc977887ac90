"""ML operator tests: KMeans cluster profiles and the numpy Isolation
Forest (semantics pinned by seed-determinism and planted-outlier recall
— no SQL oracle exists for iterative/randomized algorithms)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from nyc_taxi_etl_spark.ml import (
    isolation_forest_by_group,
    isolation_forest_scores,
    kmeans_assign,
    kmeans_cluster_profile,
)


def test_kmeans_assign_partitions_all_rows(spark):
    df = spark.range(1000).select(
        (F.col("id") % 4 * 100 + F.rand(seed=1) * 5).alias("x"),
        (F.col("id") % 4 * 100 + F.rand(seed=2) * 5).alias("y"),
    )
    out = kmeans_assign(df, ["x", "y"], k=4, seed=42, log_features=False)
    assert out.count() == 1000
    clusters = [r["cluster"] for r in out.select("cluster").distinct().collect()]
    assert len(clusters) == 4
    # well-separated blobs: each cluster is pure wrt x//100 band
    bands = (
        out.groupBy("cluster")
        .agg(F.countDistinct(F.floor(F.col("x") / 50).cast("int")).alias("b"))
        .collect()
    )
    assert all(r["b"] == 1 for r in bands)


def test_kmeans_profile_shape_and_determinism(spark, sf_dir="/root/testdata/sf0.001"):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_quantity", "l_extendedprice", "l_discount"
    )
    p1 = kmeans_cluster_profile(li, ["l_quantity", "l_extendedprice", "l_discount"], k=4, seed=42).toPandas()
    p2 = kmeans_cluster_profile(li, ["l_quantity", "l_extendedprice", "l_discount"], k=4, seed=42).toPandas()
    assert len(p1) == 4
    assert p1["n"].sum() == li.count()
    pd.testing.assert_frame_equal(p1, p2)


def test_iforest_scores_flag_planted_outlier():
    rng = np.random.default_rng(0)
    pdf = pd.DataFrame(
        {
            "a": np.concatenate([rng.normal(10, 1, 500), [1000.0]]),
            "b": np.concatenate([rng.normal(5, 1, 500), [-900.0]]),
        }
    )
    scores = isolation_forest_scores(pdf, ["a", "b"], n_trees=50, seed=42)
    assert scores.shape == (501,)
    assert (scores >= 0).all() and (scores <= 1).all()
    # the planted extreme point must be the top-scored anomaly
    assert scores[-1] == scores.max()
    assert scores[-1] > np.median(scores) + 0.1


def test_iforest_scores_deterministic():
    rng = np.random.default_rng(1)
    pdf = pd.DataFrame({"a": rng.normal(0, 1, 300), "b": rng.normal(0, 1, 300)})
    s1 = isolation_forest_scores(pdf, ["a", "b"], n_trees=30, seed=7)
    s2 = isolation_forest_scores(pdf, ["a", "b"], n_trees=30, seed=7)
    np.testing.assert_array_equal(s1, s2)


def test_iforest_by_group_contamination(spark):
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame(
        {
            "g": ["x"] * 500 + ["y"] * 500,
            "v1": rng.normal(0, 1, 1000),
            "v2": rng.normal(0, 1, 1000),
        }
    )
    df = spark.createDataFrame(pdf)
    out = isolation_forest_by_group(
        df, "g", ["v1", "v2"], contamination=0.02, n_trees=30, seed=42
    )
    agg = {
        r["g"]: (r["n"], r["o"])
        for r in out.groupBy("g")
        .agg(F.count("*").alias("n"), F.sum("is_outlier").alias("o"))
        .collect()
    }
    for g, (n, o) in agg.items():
        assert n == 500, g
        # quantile threshold → ~2% flagged (ties can add a few)
        assert 5 <= o <= 25, (g, o)


def test_iforest_tiny_group_degrades_gracefully(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"g": ["solo"], "v1": [1.0], "v2": [2.0]})
    )
    row = isolation_forest_by_group(df, "g", ["v1", "v2"]).collect()[0]
    assert row["anomaly_score"] == 0.0 and row["is_outlier"] == 0.0


def test_lda_topics_shape_and_determinism(spark):
    from nyc_taxi_etl_spark.ml import lda_topics
    from nyc_taxi_etl_spark.sources.catalog import load_table
    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    a = lda_topics(docs, "text", k=5, seed=42, vocab_size=200,
                   max_iter=10, top_n=8)
    rows = a.collect()
    assert len(rows) == 5 * 8
    by_topic = {}
    for r in rows:
        assert r.weight > 0
        by_topic.setdefault(r.topic, []).append((r.term_rank, r.weight, r.term))
    for t, terms in by_topic.items():
        ws = [w for _, w, _ in sorted(terms)]
        assert ws == sorted(ws, reverse=True)  # describeTopics rank order
    b = lda_topics(docs, "text", k=5, seed=42, vocab_size=200,
                   max_iter=10, top_n=8)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, b.collect()))


def test_lda_empty_input(spark):
    from nyc_taxi_etl_spark.ml import lda_topics

    empty = spark.createDataFrame([], "text string")
    out = lda_topics(empty, "text")
    assert out.count() == 0
    assert out.columns == ["topic", "term_rank", "term", "weight"]


def test_iforest_presample_caps_group_before_grouped_map(spark):
    """The scale contract: groups larger than max_rows_per_group are cut
    down by a Catalyst-side hash filter BEFORE applyInPandas (the grouped
    map materializes the whole group as one Arrow batch, so an in-UDF cap
    alone bounds nothing)."""
    from nyc_taxi_etl_spark.ml import presample_per_group

    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {
            "g": ["big"] * 5000 + ["small"] * 50,
            "v1": rng.normal(0, 1, 5050),
            "v2": rng.normal(0, 1, 5050),
        }
    )
    df = spark.createDataFrame(pdf)
    cap = 500
    sampled = presample_per_group(df, "g", cap, seed=42)
    counts = {
        r["g"]: r["n"]
        for r in sampled.groupBy("g").agg(F.count("*").alias("n")).collect()
    }
    # small group passes through whole; big group lands near the cap
    # (ppm gate keeps ~1.25x cap; never the full group)
    assert counts["small"] == 50
    assert cap * 0.7 <= counts["big"] <= cap * 1.6, counts["big"]
    # determinism: the same call keeps the same rows
    again = {
        r["g"]: r["n"]
        for r in presample_per_group(df, "g", cap, seed=42)
        .groupBy("g")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert counts == again

    # plan shape: the sampling filter sits BELOW the grouped map
    scored = isolation_forest_by_group(
        df, "g", ["v1", "v2"], max_rows_per_group=cap, n_trees=10
    )
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
    # the pre-sample gate appears as a filter on the hash bucket column
    assert "_sample_ppm" in plan and "_keep_ppm" in plan
    # and the map sees at most ~cap rows per group: final count reflects it
    n_big = scored.where(F.col("g") == "big").count()
    assert n_big <= cap
    n_small = scored.where(F.col("g") == "small").count()
    assert n_small == 50


def test_presample_sample_col_is_full_hash(spark):
    """The retained sample column carries the FULL 64-bit xxhash64 (not
    the mod-1e6 gate bucket), so the caller's exact-cap trim sorts on an
    effectively tie-free key — the cut cannot depend on Arrow batch row
    order."""
    from nyc_taxi_etl_spark.ml import presample_per_group

    pdf = pd.DataFrame({"g": ["a"] * 2000, "v": np.arange(2000.0)})
    df = spark.createDataFrame(pdf)
    sampled = presample_per_group(df, "g", 100, seed=42).collect()
    vals = [r["_sample_ppm"] for r in sampled]
    # full 64-bit hashes on distinct rows: all distinct, and far outside
    # the [0, 1e6) bucket range a mod-valued column would be confined to
    assert len(set(vals)) == len(vals)
    assert any(abs(v) >= 1_000_000 for v in vals)


def test_presample_max_groups_guard(spark):
    """Broadcast contract (mirrors pq.py max_queries): the per-group
    counts frame is force-broadcast only when its cardinality is known
    <= max_groups; above the cap the gate join degrades to a plain
    equi-join (AQE/sort-merge), never an unbounded forced broadcast."""
    from nyc_taxi_etl_spark.ml import presample_per_group

    pdf = pd.DataFrame({"g": [f"g{i % 3}" for i in range(300)], "v": np.arange(300.0)})
    df = spark.createDataFrame(pdf)
    conf = spark.conf
    old_thr = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # under the cap: hint forces a broadcast join even with
        # auto-broadcast disabled
        under = presample_per_group(df, "g", 50, seed=1, max_groups=10)
        plan_under = under._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan_under
        # over the cap: no forced hint -> sort-merge under threshold=-1
        over = presample_per_group(df, "g", 50, seed=1, max_groups=2)
        plan_over = over._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan_over
        # and the result set is identical either way (the guard changes
        # only the join strategy, never the kept rows)
        assert sorted(map(tuple, under.collect())) == sorted(
            map(tuple, over.collect())
        )
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)


def test_presample_leaves_no_cached_frames(spark):
    """presample_per_group must not leak cache-manager entries: the
    cardinality probe collects its bounded rows instead of persisting
    the gate frame, so repeated calls (bench loops, multi-param
    isolation_forest_by_group runs) leave storage empty."""
    from nyc_taxi_etl_spark.ml import presample_per_group

    sc = spark.sparkContext
    before = len(sc._jsc.sc().getRDDStorageInfo())
    pdf = pd.DataFrame({"g": [f"g{i % 3}" for i in range(300)], "v": np.arange(300.0)})
    df = spark.createDataFrame(pdf)
    for seed in (1, 2, 3):
        presample_per_group(df, "g", 50, seed=seed).count()
    # leak-directional: a presample leak ADDS one entry per call; in a
    # full-suite session the ContextCleaner may concurrently GC OTHER
    # tests' checkpoint RDDs, so exact equality of the global count is
    # order-sensitive (observed 19 -> 16 with zero presample entries)
    assert len(sc._jsc.sc().getRDDStorageInfo()) <= before
