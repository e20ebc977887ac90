"""DSIR-style importance resampling for domain-targeted data selection.

Data Selection via Importance Resampling (Xie et al., NeurIPS 2023,
arXiv:2302.03169): estimate importance weights for a raw corpus as the
likelihood ratio between a *target*-domain language model and a
*raw*-corpus language model over cheap n-gram features, then sample
raw documents in proportion to those weights. This is the standard
"make my 100 TB crawl look like Wikipedia" selection step that sits
between quality scoring (``lm.py``, ``classifier.py``) and budget
selection (``selection.py``) in a training-data pipeline. The
reference repo has no counterpart (it stops at trip analytics); this
module is part of the charter's LLM-pipeline extension family.

Two deliberate departures from the paper, both documented:

* **Features are raw unigram counts, not hashed n-grams.** The paper
  hashes n-grams into 10k buckets purely to bound model size; on a
  Spark engine the model is a DataFrame keyed by token, so the bound
  comes from the vocabulary aggregation itself and feature hashing
  would only obscure the oracle. (A production deployment targeting
  hash-parity with the paper would swap ``tokens`` for a hashed
  bucket column — one expression.)
* **Selection offers a deterministic mode.** ``dsir_select`` ranks by
  the importance weight itself (reproducible, SQL-expressible — the
  catalog/oracle path); ``dsir_resample`` implements the paper's
  Gumbel-top-k sampling, seeded from ``xxhash64`` so resampling is
  still replay-deterministic, verified by pytest statistics instead
  of a SQL oracle.

Scale design (100 TB posture):

* Both LMs train in ONE hash aggregation: tokens explode once, and
  target/raw counts are conditional sums in the same ``groupBy(token)``
  — not two corpus scans. The shuffle key is the token, the same
  shape as ``lm.train_unigram`` / ``corpus_vocabulary``.
* Corpus totals (target mass, raw mass, vocabulary size) ride the
  1-row broadcast scalar-join pattern.
* Scoring joins exploded tokens to the per-token log-ratio table on
  the token key; the join strategy is left to AQE — broadcast when
  the vocabulary fits, sort-merge for billion-type corpora.
* The per-document reduce is one hash agg keyed by doc id. The
  ranked top-k goes through ``_global_ranked_topn`` — per-partition
  truncation BEFORE the single-partition rank window, because (r5,
  verified) Spark's InferWindowGroupLimit rewrite does NOT fire for
  unpartitioned windows, so a bare global ``row_number ≤ n`` would
  sort the whole corpus in one task.
* No Python anywhere on the dataflow path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens

__all__ = [
    "dsir_log_ratios",
    "dsir_scores",
    "dsir_select",
    "dsir_resample",
]


def _exploded(df: DataFrame, target: Column, text_col: str, id_col: str):
    # The explicit isnotnull keeps the model subtree CANONICALLY
    # IDENTICAL under both its consumers (per-token ratios and the
    # 1-row totals): without it the optimizer infers the filter from
    # the downstream join key into one copy only, which defeats
    # exchange reuse and re-tokenizes the corpus for the totals pass.
    return (
        df.select(
            F.col(id_col),
            target.alias("_tgt"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("token"),
        )
        .where(F.col("token").isNotNull())
    )


def dsir_log_ratios(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
) -> DataFrame:
    """Per-token importance log-ratio ``ln P_target(t) - ln P_raw(t)``.

    Both unigram LMs use add-``k`` smoothing over the JOINT vocabulary
    plus one shared out-of-vocabulary bucket (the ``lm.py`` smoothing
    convention), so a token common in the target but absent from the
    raw side gets a large positive ratio rather than a division by
    zero. Returns ``(token, target_count, raw_count, log_ratio)``.
    """
    tok = _exploded(df, target, text_col, id_col)
    model = tok.groupBy("token").agg(
        F.sum(F.when(F.col("_tgt"), 1).otherwise(0))
        .cast("long")
        .alias("target_count"),
        F.sum(F.when(F.col("_tgt"), 0).otherwise(1))
        .cast("long")
        .alias("raw_count"),
    )
    totals = model.agg(
        F.sum("target_count").cast("double").alias("_tt"),
        F.sum("raw_count").cast("double").alias("_tr"),
        F.count("*").cast("double").alias("_v"),
    )
    oov = F.lit(k) * (F.col("_v") + 1)
    lr = F.log((F.col("target_count") + F.lit(k)) / (F.col("_tt") + oov)) - F.log(
        (F.col("raw_count") + F.lit(k)) / (F.col("_tr") + oov)
    )
    return model.crossJoin(F.broadcast(totals)).select(
        "token", "target_count", "raw_count", lr.alias("log_ratio")
    )


def dsir_scores(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-RAW-document importance log-weight: the sum of its tokens'
    log-ratios (the log of the paper's likelihood-ratio weight).

    Target documents are excluded — they define the target LM, they
    are not selection candidates. Documents with zero tokens have no
    weight and are dropped (nothing to resample by). ``carry_cols``
    ride the per-document aggregation key (metadata columns that are
    functionally dependent on the id — e.g. lang/source — so the
    caller doesn't pay a join back to the corpus).

    Returns ``(id_col, *carry_cols, n_tokens, log_weight)``; the
    weight is rounded to 4 decimals (catalog hash convention).
    """
    tok = df.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        target.alias("_tgt"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("token"),
    )
    ratios = dsir_log_ratios(df, target, text_col, id_col, k).select(
        "token", "log_ratio"
    )
    return (
        tok.filter(~F.col("_tgt"))
        .join(ratios, "token")
        .groupBy(id_col, *carry_cols)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(F.sum("log_ratio"), 4).alias("log_weight"),
        )
    )


def dsir_select(
    scores: DataFrame,
    n: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic top-``n`` raw documents by importance weight
    (``log_weight`` DESC, id ASC) with a 1-based ``rank``. The
    reproducible, oracle-checkable selection mode; the paper's
    stochastic variant is :func:`dsir_resample`."""
    return _global_ranked_topn(scores, n, "log_weight", id_col)


def _global_ranked_topn(
    scores: DataFrame, n: int, metric_col: str, id_col: str
) -> DataFrame:
    """Global top-``n`` by (``metric_col`` DESC, id ASC) WITH a rank
    column, bounded at every stage.

    A bare unpartitioned ``row_number`` window is a corpus-wide
    single-partition sort — and (r5, verified empirically) Spark's
    InferWindowGroupLimit rewrite only fires for windows WITH a
    partition spec, so the ``rank <= n`` filter does NOT save the
    global case. Phase 1 therefore truncates per input partition
    (``skew.two_phase_topk`` with no group columns: a
    sort_array+slice aggregate keyed by partition id, exchange
    carries ≤ n·partitions rows); phase 2 ranks the bounded
    survivor set. Identical output to the direct window."""
    from ..functions.skew import two_phase_topk

    top = two_phase_topk(scores, [], metric_col, id_col, n)
    w = Window.orderBy(F.desc(metric_col), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def dsir_resample(
    scores: DataFrame,
    n: int,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Gumbel-top-k importance resampling — the paper's sampling step.

    Sampling ``n`` items without replacement with probability
    proportional to ``exp(log_weight)`` is exactly taking the top
    ``n`` by ``log_weight + Gumbel(0,1)`` (Gumbel-max trick). The
    Gumbel draw is derived from ``xxhash64(id, seed)`` so the sample
    is deterministic under replay and shuffle-order independent —
    same posture as ``sampling.py``'s seeded operators.
    """
    u = (
        (F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1 << 40)))
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << 40))
    gumbel = -F.log(-F.log(u))
    keyed = scores.withColumn("_gkey", F.col("log_weight") + gumbel)
    return _global_ranked_topn(keyed, n, "_gkey", id_col).drop("_gkey")
