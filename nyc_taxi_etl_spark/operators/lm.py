"""Unigram language-model quality scoring — corpus-trained perplexity.

A standard curation signal the heuristic scorers in ``text.py`` can't
give: how typical is this document of the corpus it sits in? Train a
unigram LM (token → count) over the corpus, then score each document's
mean token log-probability with add-k smoothing; low probability =
boilerplate-free information or garbage, high = templated/common text —
either tail is a useful filter axis alongside ``quality_score``.

Scale design: training is ONE hash aggregation on token (explode →
groupBy token — the same shape as ``corpus_vocabulary``). Scoring joins
exploded tokens against the model on the token key; the model can be
arbitrarily large (100 TB corpora have billions of types) so the join
strategy is left to AQE — broadcast when the vocabulary fits, sort-merge
when it doesn't. Corpus totals (total token count, vocabulary size) ride
the 1-row broadcast scalar-join pattern. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens

__all__ = ["train_unigram", "score_documents"]


def train_unigram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token frequency model: ``(token, token_count)`` over the corpus,
    lowercased whitespace tokens (matching ``text.tokens``)."""
    return (
        df.select(
            F.explode(tokens(F.lower(F.col(text_col)))).alias("token")
        )
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("token_count"))
    )


def score_documents(
    df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
) -> DataFrame:
    """Per-document mean log-probability and perplexity under ``model``.

    Add-k smoothing over the model vocabulary with one shared
    out-of-vocabulary bucket: ``P(t) = (count(t) + k) / (total + k*(V+1))``.
    Empty documents get NULL scores (no tokens to average).

    Returns ``(id_col, n_tokens, avg_logprob, perplexity)`` with floats
    rounded to 4 decimals (cross-engine hash convention).
    """
    totals = model.agg(
        F.sum("token_count").cast("double").alias("_total"),
        F.count("*").cast("double").alias("_vocab"),
    )
    exploded = df.select(
        F.col(id_col),
        F.explode_outer(tokens(F.lower(F.col(text_col)))).alias("token"),
    )
    denom = F.col("_total") + F.lit(k) * (F.col("_vocab") + 1)
    logp = F.log(
        (F.coalesce(F.col("token_count"), F.lit(0)) + F.lit(k)) / denom
    )
    scored = (
        exploded.join(model, "token", "left")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.count("token").cast("long").alias("n_tokens"),
            F.avg(F.when(F.col("token").isNotNull(), logp)).alias("_avg"),
        )
    )
    return scored.select(
        id_col,
        "n_tokens",
        F.round(F.col("_avg"), 4).alias("avg_logprob"),
        F.round(F.exp(-F.col("_avg")), 4).alias("perplexity"),
    )
