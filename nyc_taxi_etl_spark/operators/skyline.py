"""2-D Pareto frontier (the skyline operator) without a self-join or a
single-reducer sort.

Published operator: Börzsönyi, Kossmann, Stocker — "The Skyline
Operator", ICDE 2001. A row p is on the skyline iff no row q
*dominates* it: ``q.minimize <= p.minimize AND q.maximize >=
p.maximize`` with at least one strict. The textbook use is
price/quality shopping ("no part is both cheaper and bigger"); in a
training-data pipeline the same shape picks the quality/cost frontier
of candidate corpora or the recall/latency frontier of ANN configs.

In two dimensions the NOT EXISTS formulation collapses to a windowed
identity — p survives iff

  1. ``p.maximize == max(maximize)`` over rows with the SAME minimize
     value (same price, strictly bigger → dominated), and
  2. ``p.maximize  > max(maximize)`` over rows with STRICTLY SMALLER
     minimize values (cheaper and at-least-as-big → dominated; note a
     cheaper q with EQUAL maximize already dominates, hence strict >).

Scale: the naive Spark plans are an O(n²) self-join or an
unpartitioned ``RANGE`` window (Catalyst funnels the whole relation
through ONE reducer to satisfy the empty partitioning — the classic
trap global_sequence exists to avoid). This operator buckets the
minimized column by a FIXED width so the strict-prefix max decomposes
into:

  (a) the same RANGE window WITHIN each bucket — partitioned, fully
      parallel (equal minimize values always share a bucket because
      bucketing is by value, not by rank); and
  (b) a prefix max ACROSS buckets, computed on the bucket-grain
      totals table (#buckets rows — bounded metadata, the same
      broadcastable scalar-table pattern as pack_sequences' phase 2)
      and broadcast-joined back. Every row in an earlier bucket has a
      strictly smaller minimize value by construction, so the
      cross-bucket term needs no tie handling.

One wide exchange (the bucket hash partition), one bounded
bucket-grain job, no Python, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["skyline_2d"]

#: sentinel below any realistic maximize value; used only when a row
#: has NO strictly-cheaper predecessor (both prefix maxes null)
_NEG_INF = -(1 << 62)

_RESERVED = ("_sky_bucket", "_sky_prev", "_sky_same", "_sky_earlier")


def skyline_2d(
    df: DataFrame,
    minimize_col: str,
    maximize_col: str,
    bucket_width: int | None = 1 << 16,
    target_buckets: int = 4096,
) -> DataFrame:
    """Rows of ``df`` on the (minimize ↓, maximize ↑) Pareto frontier.

    ``minimize_col`` must be integer-typed (use exact scaled units —
    cents, not float dollars — which the catalog convention requires
    anyway for cross-engine determinism); the RANGE frame's value
    offset and the fixed-width bucketing both need exact arithmetic.
    Ties on BOTH dimensions survive together (neither dominates).

    ``bucket_width`` trades bucket-table size against per-partition
    window width; any positive value is CORRECT, but the bucket-grain
    table it induces has ``value_range / bucket_width`` rows and is
    broadcast, so size the width to keep that count broadcastable
    (≲10⁵): the 2¹⁶ default suits cents-scale domains, NOT sparse
    64-bit domains like epoch-micros timestamps. Pass
    ``bucket_width=None`` to derive a width from the observed
    min/max (one scalar-row probe — the bounded-collect contract) so
    the bucket count is ≤ ``target_buckets`` by construction
    regardless of the domain.
    """
    for reserved in _RESERVED:
        if reserved in df.columns:
            raise ValueError(
                f"skyline_2d: df column {reserved!r} collides with an "
                f"internal column"
            )
    mn_type = dict(df.dtypes)[minimize_col]
    if mn_type not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"skyline_2d: minimize_col must be integer-typed for the "
            f"RANGE frame and fixed-width buckets, got {mn_type}"
        )
    if bucket_width is None:
        if target_buckets <= 0:
            raise ValueError("skyline_2d: target_buckets must be positive")
        # bounded probe: ONE row of two longs — same contract as the
        # #partitions collect in global_sequence
        span = df.select(
            F.min(minimize_col).alias("lo"), F.max(minimize_col).alias("hi")
        ).first()
        if span is None or span["lo"] is None:
            bucket_width = 1  # empty/all-null input: width is moot
        else:
            bucket_width = max(
                1, (int(span["hi"]) - int(span["lo"])) // target_buckets + 1
            )
    if bucket_width <= 0:
        raise ValueError("skyline_2d: bucket_width must be positive")
    mx = F.col(maximize_col)
    b = df.withColumn(
        "_sky_bucket", F.floor(F.col(minimize_col) / F.lit(bucket_width))
    )
    w_prev = (
        Window.partitionBy("_sky_bucket")
        .orderBy(minimize_col)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    # same-minimize peers via a RANGE (0, 0) frame on the SAME window
    # spec: the frame is exactly the rows with equal minimize value
    # (which always share a bucket), so both maxima come out of ONE
    # Window operator over one exchange — a partitionBy(minimize_col)
    # formulation would add a second hash exchange for nothing
    w_same = (
        Window.partitionBy("_sky_bucket")
        .orderBy(minimize_col)
        .rangeBetween(0, 0)
    )
    e = b.withColumn("_sky_prev", F.max(mx).over(w_prev)).withColumn(
        "_sky_same", F.max(mx).over(w_same)
    )
    # bucket-grain prefix max: #buckets = value-range / bucket_width
    # rows — metadata scale; the unpartitioned window is bounded by
    # construction (scalar-table pattern), never data-sized
    w_buckets = Window.orderBy("_sky_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    earlier = (
        b.groupBy("_sky_bucket")
        .agg(F.max(mx).alias("_sky_bmax"))
        .select(
            "_sky_bucket",
            F.max("_sky_bmax").over(w_buckets).alias("_sky_earlier"),
        )
    )
    cheaper_max = F.coalesce(
        F.greatest("_sky_prev", "_sky_earlier"), F.lit(_NEG_INF)
    )
    return (
        e.join(F.broadcast(earlier), "_sky_bucket")
        .filter((mx == F.col("_sky_same")) & (mx > cheaper_max))
        .drop(*_RESERVED)
    )
