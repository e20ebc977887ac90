"""Edit-distance (Levenshtein) near-duplicate pairs.

The dedup family's missing metric: MinHash/Jaccard/SimHash measure SET
overlap of shingles and miss small in-place character edits' true cost
(or over-count them); embedding cosine needs vectors. Edit distance is
the standard metric for near-identical records — titles, OCR variants,
lightly-edited copies — and both engines ship a native implementation
(Spark ``levenshtein`` with a banded threshold variant, DuckDB
``levenshtein``), so the verify stage is exact and cross-checkable.

Blocking (the scale story): a pair is verified only if it shares at
least one word k-shingle — the same inverted-index equi-join as
``ngram_jaccard_pairs``. Pigeonhole recall argument: ``d`` character
edits touch at most ``d`` words, destroying at most ``d·k`` of a
document's shingles, so any document with more than ``d·k`` shingles
still shares one with its within-``d`` neighbor — exact recall for
documents longer than ``d·k + k`` words, which is the regime edit
distance is used in.

``max_doc_freq`` drops hot postings (stop-shingles) before the
self-join — the prefix-filtering practice for web-scale corpora. It
trades the recall guarantee (a pair may share ONLY hot shingles) for
bounded posting lists; leave ``None`` where the guarantee matters.

The verify uses Spark's THRESHOLD form of levenshtein — the banded
O(d·n) dynamic program, not the full O(n²) table — so cost per
candidate scales with the threshold, not document length squared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _ensure_parallelism
from .text import _norm, shingles

__all__ = ["fuzzy_candidates", "fuzzy_near_pairs"]


def fuzzy_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Distinct ``(id_a, id_b)`` pairs (``id_a < id_b``) sharing ≥1
    word k-shingle — one explode + one self-equi-join on the posting
    key, cost driven by posting-list sizes, never n²."""
    base = _ensure_parallelism(df)
    post = base.select(
        F.col(id_col).alias("doc"),
        F.explode(shingles(F.col(text_col), k)).alias("s"),
    )
    if max_doc_freq is not None:
        hot = (
            post.groupBy("s")
            .agg(F.count("*").alias("_df"))
            .where(F.col("_df") > max_doc_freq)
            .select("s")
        )
        post = post.join(hot, "s", "left_anti")
    return (
        post.select(F.col("doc").alias("id_a"), "s")
        .join(post.select(F.col("doc").alias("id_b"), "s"), "s")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def fuzzy_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_distance: int = 50,
    k: int = 3,
    max_doc_freq: int | None = None,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Document pairs within ``max_distance`` character edits of each
    other (on whitespace-normalized lowercased text):
    ``(id_a, id_b, distance)``. Pass ``candidates`` to reuse an
    existing blocking stage (e.g. LSH) instead of the shingle index."""
    if candidates is None:
        candidates = fuzzy_candidates(df, text_col, id_col, k, max_doc_freq)
    txt = df.select(
        F.col(id_col).alias("_id"), _norm(F.col(text_col)).alias("_t")
    )
    a = txt.select(F.col("_id").alias("id_a"), F.col("_t").alias("_ta"))
    b = txt.select(F.col("_id").alias("id_b"), F.col("_t").alias("_tb"))
    dist = F.levenshtein(F.col("_ta"), F.col("_tb"), max_distance)
    return (
        candidates.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a", "id_b", dist.cast("long").alias("distance")
        )
        .where((F.col("distance") >= 0) & (F.col("distance") <= max_distance))
    )
