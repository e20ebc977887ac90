"""Token-budget selection: exact greedy semantics and the scalable
histogram-cutoff variant's invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_etl_spark.operators.selection import (
    budget_quality_cutoff,
    select_top_quality_within_budget,
)


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, quality double, n_tokens long"
    )


def test_exact_greedy_admission_and_blocking(spark):
    df = _frame(
        spark,
        [
            (1, "a", 0.9, 50),
            (2, "a", 0.8, 40),
            (3, "a", 0.7, 100),  # overflows the 120 budget -> blocks
            (4, "a", 0.6, 10),  # ...even though this one would fit
            (5, "b", 0.5, 120),  # exactly the budget
            (6, "b", 0.4, 1),
        ],
    )
    kept = select_top_quality_within_budget(df, 120).toPandas()
    assert sorted(kept[kept.source == "a"].doc_id) == [1, 2]
    assert sorted(kept[kept.source == "b"].doc_id) == [5]
    a = kept[kept.source == "a"].set_index("doc_id")
    assert a.loc[1, "cum_tokens"] == 50 and a.loc[2, "cum_tokens"] == 90
    assert list(a.sort_index().sel_rank) == [1, 2]


def test_exact_tiebreak_on_id(spark):
    df = _frame(
        spark, [(7, "a", 0.5, 60), (3, "a", 0.5, 60), (9, "a", 0.5, 60)]
    )
    kept = select_top_quality_within_budget(df, 120).toPandas()
    assert sorted(kept.doc_id) == [3, 7]  # equal quality -> lowest ids


def test_cutoff_matches_admitted_mass(spark):
    """Filtering by the emitted cutoff admits exactly tokens_admitted
    (bucket-aligned), which never exceeds the budget."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from nyc_taxi_etl_spark.operators.text import quality_score, tokens

    staged = docs.select(
        "doc_id",
        "source",
        F.size(tokens(F.lower(F.col("text")))).cast("long").alias("n_tokens"),
        quality_score(F.col("text"), tokens(F.lower(F.col("text")))).alias(
            "quality"
        ),
    )
    budget = 800
    cut = budget_quality_cutoff(staged, budget).toPandas().set_index("source")
    assert (cut.tokens_admitted <= budget).all()
    admitted = (
        staged.join(
            spark.createDataFrame(cut.reset_index()), "source"
        )
        .filter(F.col("quality") >= F.col("cutoff"))
        .groupBy("source")
        .agg(F.sum("n_tokens").cast("long").alias("toks"))
        .toPandas()
        .set_index("source")
    )
    for src in cut.index:
        assert int(admitted.loc[src, "toks"]) == int(
            cut.loc[src, "tokens_admitted"]
        ), src


def test_cutoff_no_source_fits_empty(spark):
    df = _frame(spark, [(1, "a", 0.9, 500)])
    assert budget_quality_cutoff(df, 100).count() == 0
