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

__all__ = [
    "train_unigram",
    "score_documents",
    "train_bigram",
    "score_documents_bigram",
]


def train_unigram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token frequency model: ``(token, token_count)`` over the corpus,
    lowercased whitespace tokens (matching ``text.tokens``)."""
    # The explicit isnotnull is semantically a no-op (split never
    # yields null tokens) but keeps this subtree CANONICALLY IDENTICAL
    # under both of score_documents' consumers (the token join infers
    # isnotnull into its copy, the totals agg doesn't) — with it,
    # exchange reuse computes the model once instead of re-tokenizing
    # the corpus for the totals pass. Same pattern as dsir._exploded.
    return (
        df.select(
            F.explode(tokens(F.lower(F.col(text_col)))).alias("token")
        )
        .where(F.col("token").isNotNull())
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


def train_bigram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Bigram model ``(prev, token, pair_count)``.

    Pair extraction is ROW-LOCAL — ``zip_with`` over the token array
    and its shift (no positional self-join; the naive formulation
    shuffles every token twice to reunite neighbors that were already
    adjacent in the row). One explode + one hash-agg on (prev, token),
    the same shape as :func:`train_unigram`.
    """
    toks = tokens(F.lower(F.col(text_col)))
    n = F.size(toks)
    # n=0 would make the slice length negative (runtime error): guard.
    pairs = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda p, c: F.struct(p.alias("prev"), c.alias("token")),
        ),
    ).otherwise(F.array().cast("array<struct<prev:string,token:string>>"))
    # isnotnull: same canonical-identity trick as train_unigram, so
    # the bigram join and any totals consumer share one computation.
    return (
        df.select(F.explode(pairs).alias("pc"))
        .select("pc.prev", "pc.token")
        .where(F.col("prev").isNotNull() & F.col("token").isNotNull())
        .groupBy("prev", "token")
        .agg(F.count("*").cast("long").alias("pair_count"))
    )


def score_documents_bigram(
    df: DataFrame,
    unigram: DataFrame,
    bigram: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
    lam: float = 0.7,
) -> DataFrame:
    """Jelinek-Mercer interpolated bigram scoring:

      ``P(w|v) = λ·c(v,w)/c(v·) + (1-λ)·P_uni(w)``

    with ``c(v·)`` the bigram-context total and ``P_uni`` the add-k
    unigram (one shared OOV bucket) — the classic backoff smoothing, so
    unseen pairs degrade to the unigram floor instead of -inf. The
    first token of each document has no context and scores ``P_uni``
    alone. Returns ``(id, n_tokens, avg_logprob, perplexity)``, floats
    r4-rounded (cross-engine hash convention).

    Scale: scoring explodes (prev, cur) pairs once (row-local zip, as
    in training) and joins them against pair counts, context totals,
    and the unigram model on their natural keys — all AQE-sized
    (broadcast while the models fit, sort-merge for billion-type
    corpora); corpus totals ride the 1-row broadcast scalar join.
    """
    totals = unigram.agg(
        F.sum("token_count").cast("double").alias("_total"),
        F.count("*").cast("double").alias("_vocab"),
    )
    context = bigram.groupBy("prev").agg(
        F.sum("pair_count").cast("long").alias("ctx_count")
    )
    toks = tokens(F.lower(F.col(text_col)))
    n = F.size(toks)
    pairs = F.when(
        n >= 1,
        F.zip_with(
            F.concat(
                F.array(F.lit(None).cast("string")), F.slice(toks, 1, n - 1)
            ),
            toks,
            lambda p, c: F.struct(p.alias("prev"), c.alias("cur")),
        ),
    ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))
    exploded = df.select(
        F.col(id_col), F.explode_outer(pairs).alias("pc")
    ).select(F.col(id_col), F.col("pc.prev").alias("prev"), F.col("pc.cur").alias("cur"))

    uni = unigram.select(
        F.col("token").alias("cur"), F.col("token_count")
    )
    big = bigram.select(
        F.col("prev"), F.col("token").alias("cur"), F.col("pair_count")
    )
    denom = F.col("_total") + F.lit(k) * (F.col("_vocab") + 1)
    p_uni = (F.coalesce(F.col("token_count"), F.lit(0)) + F.lit(k)) / denom
    ml = F.when(
        F.col("prev").isNotNull() & (F.coalesce(F.col("ctx_count"), F.lit(0)) > 0),
        F.coalesce(F.col("pair_count"), F.lit(0)).cast("double")
        / F.col("ctx_count"),
    ).otherwise(F.lit(0.0))
    p = F.when(
        F.col("prev").isNull(), p_uni
    ).otherwise(F.lit(lam) * ml + F.lit(1.0 - lam) * p_uni)
    scored = (
        exploded.join(uni, "cur", "left")
        .join(big, ["prev", "cur"], "left")
        .join(context, "prev", "left")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.count("cur").cast("long").alias("n_tokens"),
            F.avg(F.when(F.col("cur").isNotNull(), F.log(p))).alias("_avg"),
        )
    )
    return scored.select(
        id_col,
        "n_tokens",
        F.round(F.col("_avg"), 4).alias("avg_logprob"),
        F.round(F.exp(-F.col("_avg")), 4).alias("perplexity"),
    )
