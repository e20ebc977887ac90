"""Stratified hash sampling: rates land near targets, absent strata
drop, and the subset is identical across runs (no RNG)."""

from __future__ import annotations

from pyspark.sql import functions as F

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


def test_weighted_sample_deterministic_and_sized(spark):
    from nyc_taxi_etl_spark.operators.sampling import weighted_sample
    from nyc_taxi_etl_spark.sources.catalog import load_table
    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("double").alias("w")
    )
    a = weighted_sample(docs, "doc_id", "w", k=10, seed=7,
                        group_cols=["lang"])
    b = weighted_sample(docs, "doc_id", "w", k=10, seed=7,
                        group_cols=["lang"])
    ra = sorted((r.lang, r.doc_id) for r in a.collect())
    assert ra == sorted((r.lang, r.doc_id) for r in b.collect())
    per_lang = {}
    for lang, _ in ra:
        per_lang[lang] = per_lang.get(lang, 0) + 1
    assert all(v == 10 for v in per_lang.values())
    # a different seed draws a different sample
    c = weighted_sample(docs, "doc_id", "w", k=10, seed=8,
                        group_cols=["lang"])
    assert ra != sorted((r.lang, r.doc_id) for r in c.collect())


def test_weighted_sample_inclusion_tracks_weights(spark):
    """k=1 A-ES inclusion probability is exactly w_i/Σw; replay 600
    seeds in ONE job (seed × item grid) and check the frequencies."""
    from pyspark.sql import Window

    items = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("c", 4.0)], "item string, w double"
    )
    seeds = spark.range(600).select(F.col("id").alias("seed"))
    grid = seeds.crossJoin(items)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("seed").cast("string"), F.lit("|"),
                               F.col("item"))), 1, 13), 16, 10
        ).cast("double") + 0.5
    ) / float(16 ** 13)
    keyed = grid.withColumn("key", F.log(u) / F.col("w"))
    w = Window.partitionBy("seed").orderBy(F.col("key").desc())
    winners = (
        keyed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .groupBy("item")
        .count()
    )
    got = {r.item: r["count"] for r in winners.collect()}
    # expected 600 * w/7 = (85.7, 171.4, 342.9); allow ~4σ
    assert abs(got.get("a", 0) - 85.7) < 45, got
    assert abs(got.get("b", 0) - 171.4) < 55, got
    assert abs(got.get("c", 0) - 342.9) < 60, got


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from nyc_taxi_etl_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 1.0), (2, 0.0), (3, -1.0), (4, None), (5, 2.0)],
        "id long, w double",
    )
    out = weighted_sample(df, "id", "w", k=10)
    assert sorted(r.id for r in out.collect()) == [1, 5]


def test_temperature_rates_realize_alpha_profile(spark):
    """α=0.5 temperature rates: the smallest source keeps 1000‰, and
    every rate equals floor(1000·sqrt(n_min/n_i)) — which realizes the
    n^α share profile (expected kept ∝ sqrt(n_i))."""
    import math

    from nyc_taxi_etl_spark.operators.sampling import (
        temperature_rates,
        temperature_resample,
    )

    rows = (
        [("web", i) for i in range(1600)]
        + [("books", i + 10_000) for i in range(400)]
        + [("code", i + 20_000) for i in range(100)]
    )
    df = spark.createDataFrame(rows, "source string, doc_id long")
    got = {
        r["source"]: (r["n_src"], r["rate_pm"])
        for r in temperature_rates(df, "source").collect()
    }
    assert got == {
        "web": (1600, math.floor(1000 * math.sqrt(100 / 1600))),
        "books": (400, math.floor(1000 * math.sqrt(100 / 400))),
        "code": (100, 1000),
    }
    # rate ∝ 1/sqrt(n) ⇒ expected kept ∝ sqrt(n): web keeps 250‰ of
    # 1600 (~400), books 500‰ of 400 (~200), code all 100 — 4:2:1,
    # exactly the sqrt(16):sqrt(4):sqrt(1) profile
    kept = (
        temperature_resample(df, "doc_id", "source")
        .groupBy("source")
        .count()
        .collect()
    )
    counts = {r["source"]: r["count"] for r in kept}
    assert counts["code"] == 100  # smallest source kept whole
    # hash noise is ~±3% at these sizes; the profile must still order
    assert counts["web"] > counts["books"] > counts["code"]


def test_temperature_resample_is_deterministic(spark):
    from nyc_taxi_etl_spark.operators.sampling import temperature_resample

    df = spark.createDataFrame(
        [("a", i) for i in range(300)] + [("b", i + 1000) for i in range(75)],
        "source string, doc_id long",
    )
    one = sorted(r["doc_id"] for r in temperature_resample(df, "doc_id", "source").collect())
    two = sorted(
        r["doc_id"]
        for r in temperature_resample(df.repartition(7), "doc_id", "source").collect()
    )
    assert one == two  # layout-independent (hash, not RNG)


def test_temperature_rates_general_alpha_pow_path(spark):
    """alpha != 0.5 goes through pow(n_min/n_i, 1-alpha) — production
    path, no oracle guarantee; pin the arithmetic on a simple case."""
    import math

    from nyc_taxi_etl_spark.operators.sampling import temperature_rates

    df = spark.createDataFrame(
        [("big", i) for i in range(1000)] + [("small", i + 10_000) for i in range(10)],
        "source string, doc_id long",
    )
    got = {
        r["source"]: r["rate_pm"]
        for r in temperature_rates(df, "source", alpha=0.7).collect()
    }
    assert got["small"] == 1000
    assert got["big"] == math.floor(1000 * (10 / 1000) ** 0.3)
