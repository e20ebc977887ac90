"""Exact binary-classifier ranking metrics (AUC, KS) at
score-histogram grain — the model-evaluation pass of a curation
pipeline, computed the scale-correct way.

The textbook AUC ranks every row (a global O(n log n) sort — the
anti-pattern ``global_sequence`` exists to avoid); but when scores
are quantized (every classifier entry here emits 4-decimal
probabilities), the Mann-Whitney U statistic only needs per-SCORE
positive/negative counts:

    U·2 = Σ_g pos_g · (2·neg_below_g + neg_g)        (ties count ½)
    AUC = U·2 / (2·P·N)

so the plan is: one hash-agg to the ≤10k-row score histogram
(map-side partial, the only pass over the data), then windows over
the tiny bounded histogram. Kolmogorov-Smirnov falls out of the same
cumulative counts: KS = max_g |cum_pos_g·N − cum_neg_g·P| / (P·N).

Every intermediate is INTEGER (decimal(38,0) so P·N-scale products
cannot overflow BIGINT at 10^10+ rows per class); the only float ops
are two final divisions of exactly-represented integers — so a DuckDB
oracle (HUGEINT arithmetic) reproduces the metrics bit-for-bit, with
no float-order sensitivity anywhere.

Reference intent: the reference's notebooks eyeball model quality
from plots (comprehensive_trip_analysis_part2.ipynb correlation/
cluster sections); this is the measurable, distributable form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["binary_rank_metrics"]


def _dec(c: Column) -> Column:
    return c.cast("decimal(38,0)")


def binary_rank_metrics(
    df: DataFrame, score_col: str, label_col: str
) -> DataFrame:
    """One-row frame ``(n_pos, n_neg, n_scores, auc, ks)`` for a
    binary ``label_col`` (boolean/0-1) ranked by ``score_col``.

    ``score_col`` must be quantized (e.g. 4-decimal probabilities):
    the unpartitioned cumulative windows run over the score HISTOGRAM,
    whose size is bounded by the quantization grid (≤ 10 001 rows for
    4-decimal probs), never over raw rows — same bounded-domain
    posture as the daily-rolling entries. AUC uses the tie-aware
    Mann-Whitney formulation (ties contribute ½); degenerate inputs
    (a single class) yield null auc/ks rather than a misleading 0.

    Null scores and null labels are dropped up front (an unscored or
    unlabeled row carries no ranking information): Spark's window
    default is nulls-FIRST while DuckDB's is nulls-LAST, so a null
    score reaching the cumulative windows would silently diverge the
    two engines' AUC/KS — the filter pins one semantics for both."""
    df = df.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    )
    lab = F.col(label_col).cast("long")
    g = df.groupBy(score_col).agg(
        F.sum(lab).alias("pos"),
        F.sum(F.lit(1) - lab).alias("neg"),
    )
    w_below = Window.orderBy(score_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_cum = Window.orderBy(score_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    e = g.select(
        "pos",
        "neg",
        F.coalesce(F.sum("neg").over(w_below), F.lit(0)).alias(
            "neg_below"
        ),
        F.sum("pos").over(w_cum).alias("cum_pos"),
        F.sum("neg").over(w_cum).alias("cum_neg"),
    )
    tot = g.agg(
        F.sum("pos").alias("p_tot"), F.sum("neg").alias("n_tot")
    )
    u2 = F.sum(
        _dec(F.col("pos"))
        * (F.lit(2) * _dec(F.col("neg_below")) + _dec(F.col("neg")))
    )
    ks_num = F.max(
        F.abs(
            _dec(F.col("cum_pos")) * _dec(F.col("n_tot"))
            - _dec(F.col("cum_neg")) * _dec(F.col("p_tot"))
        )
    )
    agg = (
        e.crossJoin(F.broadcast(tot))
        .agg(
            F.first("p_tot").alias("n_pos"),
            F.first("n_tot").alias("n_neg"),
            F.count(F.lit(1)).alias("n_scores"),
            u2.alias("_u2"),
            ks_num.alias("_ksn"),
        )
    )
    pd_ = F.col("n_pos").cast("double")
    nd_ = F.col("n_neg").cast("double")
    nonzero = (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
    return agg.select(
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        F.col("n_scores").cast("long").alias("n_scores"),
        F.when(
            nonzero,
            F.col("_u2").cast("double") / (F.lit(2.0) * pd_ * nd_),
        ).alias("auc"),
        F.when(
            nonzero, F.col("_ksn").cast("double") / (pd_ * nd_)
        ).alias("ks"),
    )
