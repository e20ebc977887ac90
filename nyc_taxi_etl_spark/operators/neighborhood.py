"""Sorted-neighborhood record linkage (the merge/purge blocking of
Hernández & Stolfo, SIGMOD 1995).

Blocking by windowed adjacency in a GLOBAL sort order: records are
totally ordered by a blocking key and only pairs within ``window``
positions of each other are compared. This complements the engine's
content-hash blockers (shingle LSH in dedup.py, q-gram blocking in
fuzzy.py): those need enough shared n-grams to collide in a bucket,
which degrades on SHORT strings (names, codes, titles) where a single
typo perturbs most shingles. The sorted neighborhood instead exploits
lexicographic locality — near-identical short strings sort adjacently
— at a GUARANTEED O(n·w) pair budget regardless of how pathological
the value distribution is (LSH's worst case is a saturated bucket;
this operator's worst case is the same as its best case).

Scale design:

* the global order comes from :func:`global_sequence` — a range
  exchange plus a driver prefix-sum of per-partition counts, never a
  single-partition ``row_number`` window;
* the band predicate ``0 < b.seq − a.seq <= w`` becomes an EQUI-join
  via the standard band trick: ``floor(seq/w)`` of the right row
  equals ``floor(seq/w)`` of the left row or that value + 1, so the
  left side explodes to exactly TWO join keys and the band rides a
  shuffled (AQE-eligible) equi-join — never a cross join, never a
  broadcast of the data;
* output is exactly the pairs a sequential sliding window would
  emit, so the result is deterministic given a total order (callers
  append a unique id to the order key, as with global_sequence).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sequence import global_sequence

__all__ = ["sorted_neighborhood_pairs"]

_RESERVED = ("_snb_seq", "_snb_g")


def sorted_neighborhood_pairs(
    df: DataFrame,
    order_cols: list[str | Column],
    window: int,
    a_prefix: str = "a_",
    b_prefix: str = "b_",
) -> DataFrame:
    """All row pairs (a, b) of ``df`` with ``b`` at most ``window``
    positions after ``a`` in the total order ``order_cols``.

    Returns every column of ``df`` twice, prefixed ``a_`` / ``b_``
    (the caller applies the match predicate — edit distance, field
    agreement — and projects). Make the order key unique (append an
    id column) for a deterministic pair set.
    """
    if window < 1:
        raise ValueError("sorted_neighborhood_pairs: window must be >= 1")
    for reserved in _RESERVED:
        if reserved in df.columns:
            raise ValueError(
                f"sorted_neighborhood_pairs: df column {reserved!r} "
                f"collides with an internal column"
            )
    if a_prefix == b_prefix:
        raise ValueError(
            "sorted_neighborhood_pairs: a_prefix and b_prefix must differ"
        )
    a_names = {f"{a_prefix}{c}" for c in df.columns}
    b_names = {f"{b_prefix}{c}" for c in df.columns}
    clash = sorted((a_names & b_names) | ((a_names | b_names) & {"_a_seq", "_b_seq", *_RESERVED}))
    if clash:
        raise ValueError(
            f"sorted_neighborhood_pairs: prefixed output columns collide: {clash}"
        )
    seq = global_sequence(df, order_cols, out_col="_snb_seq")
    # long/int division promotes to DOUBLE; exact while seq < 2^53,
    # comfortably above any real row count (and global_sequence's own
    # 2^33-per-partition contract trips long before the mantissa does)
    g = F.floor(F.col("_snb_seq") / F.lit(window))
    # left side: each row joins buckets g and g+1 (covers every b with
    # seq in (a.seq, a.seq + window])
    left = seq.select(
        *[F.col(c).alias(f"{a_prefix}{c}") for c in df.columns],
        F.col("_snb_seq").alias("_a_seq"),
        F.explode(F.array(g, g + 1)).alias("_snb_g"),
    )
    right = seq.select(
        *[F.col(c).alias(f"{b_prefix}{c}") for c in df.columns],
        F.col("_snb_seq").alias("_b_seq"),
        g.alias("_snb_g"),
    )
    return (
        left.join(right, "_snb_g")
        .filter(
            (F.col("_b_seq") > F.col("_a_seq"))
            & (F.col("_b_seq") <= F.col("_a_seq") + window)
        )
        .drop("_snb_g", "_a_seq", "_b_seq")
    )
