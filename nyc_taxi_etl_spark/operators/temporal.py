"""Temporal operators Spark lacks as built-ins: backward as-of join
and gap-based sessionization.

North-star extension (BASELINE.json): the reference repo is batch
rollups only; event pipelines at 100 TB need "latest state as of each
event" (as-of join) and "activity sessions" (gap sessionize). Both are
expressed as ONE shuffle on the partition key:

* ``asof_join`` uses the union-marker formulation — tag left/right,
  union, and window ``last(ignorenulls=True)`` ordered by (ts, side,
  tiebreak). That is a single hash-partition by key + per-partition
  sort, versus the naive range-join (``r.ts <= l.ts``) which explodes
  to O(|L|·|R|) per key. Equal timestamps match (right sorts before
  left), and the tiebreak column makes the winner among duplicate
  right timestamps deterministic — required for oracle hash-parity.
* ``sessionize`` is lag + running sum over the same (key, ts) window:
  the standard sub-linear-memory sessionizer — no state beyond the
  sort, so a skewed user degrades to one big sorted partition, never
  to driver memory.

All timestamp arithmetic is integer microseconds (``unix_micros``), so
gap/tolerance comparisons are exact and engine-portable (DuckDB
``epoch_us``) — no float-epoch edge cases.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "epoch_us", "interval_join", "sessionize"]


def epoch_us(col: Column | str) -> Column:
    """Integer microseconds since epoch (DuckDB ``epoch_us`` parity).
    Accepts TIMESTAMP or TIMESTAMP_NTZ; the catalog pins the session
    to UTC (sources/catalog.py), so the NTZ→TZ cast is a no-op shift."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    ts_col: str,
    right_cols: Sequence[str],
    prefix: str = "asof_",
    tiebreak_col: str | None = None,
    tolerance_us: int | None = None,
) -> DataFrame:
    """Backward as-of join: for every left row, attach ``right_cols``
    from the latest right row with the same key and ``right.ts <=
    left.ts`` (inclusive). Unmatched left rows keep nulls (left-outer
    semantics). ``tiebreak_col`` (a right column, e.g. an event id)
    picks the max among right rows sharing the winning timestamp;
    ``tolerance_us`` nulls matches older than the given microseconds.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if "_side" in left.columns or "_side" in right.columns:
        raise ValueError(
            "asof_join reserves the internal column name '_side'; "
            "rename it in the input frames"
        )
    payload = [c for c in right_cols if c not in keys]
    out_names = {c: f"{prefix}{c}" for c in payload}

    rpart = right.select(
        *keys,
        F.col(ts_col),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(out_names[c]) for c in payload],
    )
    lpart = left.withColumn("_side", F.lit(1))
    unioned = lpart.unionByName(rpart, allowMissingColumns=True)

    order: list[Column] = [F.col(ts_col).asc(), F.col("_side").asc()]
    if tiebreak_col is not None:
        order.append(F.col(out_names.get(tiebreak_col, tiebreak_col)).asc_nulls_last())
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    filled = unioned
    for c in payload:
        filled = filled.withColumn(
            out_names[c], F.last(out_names[c], ignorenulls=True).over(w)
        )
    out = filled.filter(F.col("_side") == 1).drop("_side")

    if tolerance_us is not None:
        if ts_col not in payload:
            raise ValueError("tolerance_us requires ts_col in right_cols")
        stale = epoch_us(ts_col) - epoch_us(out_names[ts_col]) > F.lit(tolerance_us)
        for c in payload:
            out = out.withColumn(
                out_names[c], F.when(stale, F.lit(None)).otherwise(F.col(out_names[c]))
            )
    return out


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_us: int,
    tiebreak_col: str | None = None,
    session_col: str = "session_seq",
) -> DataFrame:
    """Assign a per-key session index (1-based): a new session starts
    when the gap to the previous event of the same key exceeds
    ``gap_us`` microseconds (strict >). Adds ``session_col``."""
    order: list[Column] = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(epoch_us(ts_col)).over(w)
    is_new = (
        prev.isNull() | ((epoch_us(ts_col) - prev) > F.lit(gap_us))
    ).cast("long")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(session_col, F.sum(is_new).over(running))


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | Sequence[str],
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_us: int = 3600 * 1_000_000,
) -> DataFrame:
    """Range join: each point row paired with every interval row of the
    same key whose ``[start, end]`` contains its timestamp (inclusive
    both ends).

    Scale: a naive ``p.ts BETWEEN i.start AND i.end`` non-equi join
    degenerates to a per-key nested loop (O(|P|·|I|) comparisons —
    Spark plans it as BroadcastNestedLoop/cartesian). Instead both
    sides are bucketed on fixed ``bucket_us`` windows — intervals
    explode to the buckets they cover (span/bucket_us + 1 rows, ~2-3
    for well-chosen widths), points map to exactly one bucket — so the
    join is a plain equi-join on (key, bucket) followed by the exact
    range filter. Each qualifying pair matches exactly once because a
    point owns a single bucket. Pick ``bucket_us`` near the typical
    interval span: much smaller explodes intervals, much larger
    degrades to per-key nested loops within buckets.
    """
    keys = [on] if isinstance(on, str) else list(on)
    pb = points.withColumn(
        "_bkt", F.floor(epoch_us(ts_col) / F.lit(bucket_us)).cast("long")
    )
    ib = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(epoch_us(start_col) / F.lit(bucket_us)).cast("long"),
                F.floor(epoch_us(end_col) / F.lit(bucket_us)).cast("long"),
            )
        ),
    )
    return (
        pb.join(ib, [*keys, "_bkt"])
        .filter(
            (epoch_us(ts_col) >= epoch_us(start_col))
            & (epoch_us(ts_col) <= epoch_us(end_col))
        )
        .drop("_bkt")
    )


def point_in_time_join(
    facts: DataFrame,
    dim_history: DataFrame,
    on: str | Sequence[str],
    fact_ts: str,
    attrs: Sequence[str],
    dim_from: str = "effective_from",
    version_col: str | None = "version",
    prefix: str = "pit_",
) -> DataFrame:
    """Point-in-time join: attach to every fact row the dimension
    attributes that were VALID at the fact's timestamp, from an SCD2
    history (``operators/scd.py``) — the consumer side of slowly
    changing dimensions ("what tier was this customer on when the
    order shipped"). Joining the CURRENT dimension instead is the
    classic silent-leakage bug in both BI and training-data pipelines
    (features computed with future attribute values).

    Semantics: the version with the greatest ``dim_from <= fact_ts``
    wins (ties on ``dim_from`` — several versions starting the same
    instant — resolved to the highest ``version_col``, i.e. the
    last-written one); facts before the key's first version keep
    nulls. Because SCD2 intervals are contiguous, checking
    ``effective_to`` is redundant — backward as-of on the interval
    START is the whole join.

    Scale: delegates to ``asof_join`` — one union + one key-partition
    window, no interval range-join expansion (the naive
    from<=ts<to join expands every fact by its key's version count
    before filtering).
    """
    keys = [on] if isinstance(on, str) else list(on)
    renamed = dim_history.select(
        *keys,
        F.col(dim_from).alias(fact_ts),
        *[F.col(c) for c in attrs],
        *( [F.col(version_col)] if version_col and version_col not in attrs else [] ),
    )
    return asof_join(
        facts,
        renamed,
        on=keys,
        ts_col=fact_ts,
        right_cols=list(attrs)
        + (
            [version_col]
            if version_col and version_col not in attrs
            else []
        ),
        prefix=prefix,
        tiebreak_col=version_col,
    )
