"""Z-order (Morton) clustering expression for multi-column data
skipping.

A linear sort clusters ONE column's values into contiguous files;
predicates on any other column then hit every file. Interleaving the
bits of per-column rank buckets (the Morton curve) gives every
clustered column locality at once — the layout trick behind Delta's
``OPTIMIZE ZORDER BY`` and Iceberg's sort-order z-transform, paired
here with ``VersionedTable.read_where`` footer pruning.

Scale design:

* Per-column bucketing uses ``2^bits``-quantile boundaries from ONE
  ``percentile_approx`` aggregation — a bounded (≤255 doubles/column)
  driver-side literal, the same bounded-sample pattern as the IVF
  quantizer. Rank buckets, not min/max scaling, so skewed columns
  still spread across the curve.
* The z-value itself is a pure Catalyst bit-fold (``shiftleft`` /
  ``bitwiseOR`` over ``bits × |cols|`` terms) — codegen'd, row-local.
* Laying out by z-value is one ``repartitionByRange`` (sampled range
  partitioner — scales to any cluster) + an in-partition sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["column_boundaries", "bucket_expr", "z_value", "zorder_layout"]


def column_boundaries(
    df: DataFrame, cols: Sequence[str], bits: int = 8
) -> dict[str, list[float]]:
    """Interior ``2^bits - 1`` quantile boundaries per column, from a
    single pass of ``percentile_approx`` (bounded driver result)."""
    n = (1 << bits) - 1
    probs = [i / (n + 1) for i in range(1, n + 1)]
    aggs = [
        F.percentile_approx(F.col(c).cast("double"), probs, 10_000).alias(c)
        for c in cols
    ]
    row = df.agg(*aggs).first()
    out: dict[str, list[float]] = {}
    for c in cols:
        bs = [b for b in (row[c] or []) if b is not None]
        # strictly increasing boundaries (constant columns collapse)
        uniq: list[float] = []
        for b in bs:
            if not uniq or b > uniq[-1]:
                uniq.append(b)
        out[c] = uniq
    return out


def bucket_expr(col: Column, boundaries: list[float]) -> Column:
    """Rank bucket of ``col``: number of boundaries ≤ value (nulls →
    bucket 0). Pure expression against the literal boundary array."""
    if not boundaries:
        return F.lit(0)
    arr = F.lit([float(b) for b in boundaries])
    v = col.cast("double")
    return F.when(
        v.isNull(), F.lit(0)
    ).otherwise(F.size(F.filter(arr, lambda b: b <= v)))


def z_value(
    buckets: Sequence[Column], bits: int = 8
) -> Column:
    """Morton interleave of per-column bucket ids: bit ``i`` of column
    ``j`` lands at position ``i·|cols| + j``. Static ``bits × cols``
    shiftleft/OR fold — whole-stage-codegen'd."""
    c = len(buckets)
    z = F.lit(0).cast("long")
    for j, b in enumerate(buckets):
        bl = b.cast("long")
        for i in range(bits):
            bit = F.shiftright(bl, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * c + j))
    return z


def zorder_layout(
    df: DataFrame,
    cols: Sequence[str],
    target_files: int,
    bits: int = 8,
) -> DataFrame:
    """Return ``df`` laid out along the Morton curve of ``cols`` in
    ``target_files`` range partitions (one shuffle), sorted within
    each — the write-side half of multi-column data skipping."""
    bounds = column_boundaries(df, cols, bits)
    z = z_value([bucket_expr(F.col(c), bounds[c]) for c in cols], bits)
    return (
        df.withColumn("_z", z)
        .repartitionByRange(target_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
