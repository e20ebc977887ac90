"""Corpus-level boilerplate removal (CCNet/RefinedWeb-style curation).

Templated fragments — headers, footers, cookie banners, newsletter
prompts — repeat across many documents and poison LLM training data
even after near-dup removal drops whole-document copies. This operator
finds word k-grams whose DOCUMENT frequency exceeds a corpus fraction
and masks every token covered by one, leaving the unique prose.

Scale design (the reason this survives 100 TB):

* The boilerplate set is **bounded independent of corpus size**: a
  k-gram must appear in ≥ ``min_doc_frac·N`` docs, and a doc holds at
  most ``L`` distinct k-grams, so at most ``L / min_doc_frac`` k-grams
  can qualify no matter how large N grows (pigeonhole on the df mass).
  That makes the set a legitimate broadcast — same pattern as the
  1-row corpus-size scalars, NOT a data-sized build side.
* Detection is one hash aggregation on the shingle key (the exact
  shape of ``shingle_doc_frequency``); masking is then row-local
  higher-order-function work against the broadcast array — zero
  additional shuffles, no Python.
* Masking cost is O(tokens · k) per row (each position checks ≤ k
  covering windows) — linear in data for fixed k.

Matching is on whitespace-normalized, lowercased tokens (the same
normalization the dedup family uses), and the cleaned text is emitted
in that normalized form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import _norm, tokens

__all__ = ["boilerplate_shingles", "remove_boilerplate"]


def _positional_shingles(toks, k: int):
    """Overlapping k-gram at every start position (duplicates kept —
    position-aligned, unlike ``text.shingles``'s distinct set)."""
    n = F.size(toks)
    idx = F.when(n >= k, F.sequence(F.lit(0), n - k)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " ")
    )


def boilerplate_shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_doc_frac: float = 0.05,
) -> DataFrame:
    """k-grams present in ≥ ``min_doc_frac`` of documents:
    ``(shingle, doc_freq)``. One explode + one hash-agg; the result is
    bounded by ``avg_shingles_per_doc / min_doc_frac`` rows (see module
    docstring), so downstream consumers may broadcast it."""
    toks = tokens(_norm(F.col(text_col)))
    per_doc = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(_positional_shingles(toks, k))).alias(
            "shingle"
        ),
    )
    n_docs = df.select(F.count("*").alias("_n"))
    return (
        per_doc.groupBy("shingle")
        .agg(F.count("*").cast("long").alias("doc_freq"))
        .crossJoin(F.broadcast(n_docs))
        .filter(F.col("doc_freq") >= F.ceil(F.lit(min_doc_frac) * F.col("_n")))
        .select("shingle", "doc_freq")
    )


def remove_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_doc_frac: float = 0.05,
) -> DataFrame:
    """Mask every token covered by a high-document-frequency k-gram.

    A token at position ``i`` is covered when ANY of the ≤ k windows
    containing it (starts ``max(0, i-k+1) … min(i, n-k)``) is a
    boilerplate k-gram; covered tokens are dropped, the rest are
    rejoined with single spaces.

    Returns ``(id_col, clean_text, n_tokens, removed_tokens)``.
    """
    boiler = (
        boilerplate_shingles(df, text_col, id_col, k, min_doc_frac)
        .agg(F.collect_list("shingle").alias("_boiler"))
    )
    toks = tokens(_norm(F.col(text_col)))
    base = df.select(F.col(id_col), toks.alias("_toks")).crossJoin(
        F.broadcast(boiler)
    )
    n = F.size(F.col("_toks"))
    sh = _positional_shingles(F.col("_toks"), k)

    def covered(i):
        lo = F.greatest(F.lit(0), i - (k - 1))
        hi = F.least(i, n - k)
        return (n >= k) & F.exists(
            F.sequence(lo, hi),
            lambda j: F.array_contains(F.col("_boiler"), F.element_at(sh, j + 1)),
        )

    kept = F.filter(
        F.col("_toks"), lambda x, i: ~covered(i)
    )
    return base.select(
        id_col,
        F.array_join(kept, " ").alias("clean_text"),
        n.cast("long").alias("n_tokens"),
        (n - F.size(kept)).cast("long").alias("removed_tokens"),
    )
