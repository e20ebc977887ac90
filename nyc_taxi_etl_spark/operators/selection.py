"""Quality-ranked corpus selection under a token budget.

The step between scoring and export in a training-data pipeline: "take
the best N billion tokens per source". Two implementations with the
same contract (keep the highest-quality documents of each source until
the budget fills; deterministic tiebreak on id):

* :func:`select_top_quality_within_budget` — EXACT: per-source window,
  running token total, keep while ``cum_tokens ≤ budget``. The window
  puts each source in one task, so this is for per-source cardinalities
  a single executor can sort (the reference-style analytics scale, or
  post-sampled corpora).
* :func:`budget_quality_cutoff` — SCALE PATH: bucket quality into a
  fixed-width histogram, aggregate token mass per (source, bucket),
  cumulate top-down over the ≤``n_buckets`` rows per source (bounded
  window — never the data), emit each source's admission cutoff. The
  corpus is then filtered by ``quality ≥ cutoff`` — one hash-agg + one
  narrow filter, no per-source sort, overshoot bounded by one bucket's
  token mass. This is how you'd do it at 100 TB; the exact variant is
  its spec and both are cross-checked in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["select_top_quality_within_budget", "budget_quality_cutoff"]


def select_top_quality_within_budget(
    df: DataFrame,
    budget_tokens: int,
    quality_col: str = "quality",
    token_col: str = "n_tokens",
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact greedy selection: per source, admit documents in
    (quality DESC, id ASC) order while the running token total stays
    within ``budget_tokens``. Adds ``sel_rank`` and ``cum_tokens``.

    A document larger than the remaining budget is skipped AND blocks
    everyone after it (running-total semantics, not best-fit packing —
    the deterministic, oracle-expressible contract; bin-packing
    variants belong to ``chunking.pack_sequences``)."""
    w = (
        Window.partitionBy(source_col)
        .orderBy(F.desc(quality_col), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = df.select(
        "*",
        F.row_number()
        .over(
            Window.partitionBy(source_col).orderBy(
                F.desc(quality_col), F.asc(id_col)
            )
        )
        .cast("long")
        .alias("sel_rank"),
        F.sum(token_col).over(w).cast("long").alias("cum_tokens"),
    )
    return ranked.filter(F.col("cum_tokens") <= budget_tokens)


def budget_quality_cutoff(
    df: DataFrame,
    budget_tokens: int,
    quality_col: str = "quality",
    token_col: str = "n_tokens",
    source_col: str = "source",
    n_buckets: int = 1000,
) -> DataFrame:
    """Per-source quality admission threshold for ``budget_tokens``:
    the lowest histogram bucket whose top-down cumulative token mass
    still fits the budget. Returns ``(source_col, cutoff)`` where
    ``cutoff`` is the bucket's lower quality bound; filtering the
    corpus with ``quality ≥ cutoff`` admits at most one bucket's mass
    beyond the exact selection.

    Quality is assumed in [0, 1] (clamped). Shuffles: ONE hash-agg on
    (source, bucket); the cumulative window runs over ≤ ``n_buckets``
    rows per source — bounded metadata, never the corpus."""
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.greatest(
            F.lit(0), F.floor(F.col(quality_col) * n_buckets).cast("int")
        ),
    )
    hist = (
        df.select(bucket.alias("qb"), F.col(token_col), F.col(source_col))
        .groupBy(source_col, "qb")
        .agg(F.sum(token_col).cast("long").alias("bucket_tokens"))
    )
    w = (
        Window.partitionBy(source_col)
        .orderBy(F.desc("qb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        source_col, "qb", F.sum("bucket_tokens").over(w).alias("cum_tokens")
    )
    return (
        cum.filter(F.col("cum_tokens") <= budget_tokens)
        .groupBy(source_col)
        .agg(
            (F.min("qb").cast("double") / n_buckets).alias("cutoff"),
            F.max("cum_tokens").cast("long").alias("tokens_admitted"),
        )
    )
