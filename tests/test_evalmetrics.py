"""Analytic pins for binary_rank_metrics (operators/evalmetrics.py).
The catalog entry classifier_lang_auc exercises the no-signal case
end-to-end against DuckDB; these pin known-signal and tie arithmetic."""

from __future__ import annotations

import pytest

from nyc_taxi_etl_spark.operators.evalmetrics import binary_rank_metrics


def _run(spark, rows):
    df = spark.createDataFrame(rows, "score double, y int")
    return binary_rank_metrics(df, "score", "y").collect()[0]


def test_perfect_separation(spark):
    rows = [(0.1, 0)] * 5 + [(0.9, 1)] * 5
    r = _run(spark, rows)
    assert (r["n_pos"], r["n_neg"], r["n_scores"]) == (5, 5, 2)
    assert r["auc"] == 1.0
    assert r["ks"] == 1.0


def test_perfectly_wrong_ranker(spark):
    rows = [(0.9, 0)] * 4 + [(0.1, 1)] * 6
    r = _run(spark, rows)
    assert r["auc"] == 0.0
    assert r["ks"] == 1.0


def test_all_tied_scores_give_half(spark):
    # single score value: every pos/neg pair ties -> AUC exactly 1/2,
    # KS 0 (identical distributions)
    rows = [(0.5, 1)] * 3 + [(0.5, 0)] * 7
    r = _run(spark, rows)
    assert r["auc"] == 0.5
    assert r["ks"] == 0.0
    assert r["n_scores"] == 1


def test_hand_computed_mixed_case(spark):
    # scores: pos at {0.2, 0.6, 0.6}, neg at {0.2, 0.4}
    # pairs (pos, neg): (0.2 vs 0.2) tie=0.5, (0.2 vs 0.4) lose=0,
    # (0.6 vs 0.2) win, (0.6 vs 0.4) win, (0.6 vs 0.2) win,
    # (0.6 vs 0.4) win  -> U = 4.5 of 6 -> AUC = 0.75
    rows = [(0.2, 1), (0.6, 1), (0.6, 1), (0.2, 0), (0.4, 0)]
    r = _run(spark, rows)
    assert r["auc"] == pytest.approx(4.5 / 6)
    # cum fractions at 0.2: pos 1/3 neg 1/2 -> |d|=1/6; at 0.4:
    # pos 1/3 neg 1 -> 2/3 ; at 0.6: 1,1 -> 0  => KS = 2/3
    assert r["ks"] == pytest.approx(2 / 3)


def test_single_class_yields_null(spark):
    r = _run(spark, [(0.3, 1), (0.7, 1)])
    assert r["auc"] is None and r["ks"] is None
    assert (r["n_pos"], r["n_neg"]) == (2, 0)


def test_null_scores_and_labels_are_dropped(spark):
    # ADVICE r6: a null score would order nulls-first in Spark's
    # windows but nulls-last in the DuckDB oracle — the operator now
    # drops null scores/labels so both engines see the same histogram
    clean = [(0.2, 1), (0.6, 1), (0.6, 1), (0.2, 0), (0.4, 0)]
    noisy = clean + [(None, 1), (None, 0), (0.9, None)]
    df = spark.createDataFrame(noisy, "score double, y int")
    r = binary_rank_metrics(df, "score", "y").collect()[0]
    ref = _run(spark, clean)
    assert (r["n_pos"], r["n_neg"], r["n_scores"]) == (
        ref["n_pos"],
        ref["n_neg"],
        ref["n_scores"],
    )
    assert r["auc"] == ref["auc"] and r["ks"] == ref["ks"]
