"""Calendar RANGE-frame rolling windows that stay partitioned at scale.

A trailing-k-day RANGE window ``ORDER BY day`` with no PARTITION BY is
correct but collapses the series into ONE partition — fine for a
bounded post-agg daily table (a few thousand rows), a scale trap the
moment the series grows (multi-decade spans, or per-entity series
fanned out later). The standard distributed idiom (documented in the
r4/r5 docstrings of the rolling catalog entries, implemented here per
VERDICT r5 task #5) is:

1. partition the series by CALENDAR YEAR;
2. prepend to each year the previous year's last ``tail_days`` rows as
   GHOST rows — they participate in frames (a January 2nd window must
   see late December) but are dropped from the output;
3. run the same RANGE frame partitioned by year.

Every frame then sees exactly the rows it would have seen in the
single-partition form — the ghost tail covers the only frames that
cross the year boundary — so results are IDENTICAL (pinned by
``tests/test_rolling.py`` equality tests), while the physical plan
holds one hash exchange on year and no SinglePartition window.

Cost: ghosts duplicate ``tail_days`` rows per year (7–14 rows/year
here) — noise against the partitioning win.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rolling_calendar_frame"]


def rolling_calendar_frame(
    daily: DataFrame,
    aggs: dict[str, Column],
    date_col: str = "d",
    tail_days: int = 6,
    partition_years: bool = True,
) -> DataFrame:
    """Append trailing-``tail_days``-calendar-day windowed aggregates
    to a daily table.

    ``aggs`` maps output column name → UNBOUND aggregate expression
    (e.g. ``F.sum("revenue")``); this function binds each with
    ``.over(w)`` so every aggregate runs over the same frame.

    ``partition_years=False`` gives the classic single-partition form
    (correct for bounded daily tables); ``True`` (default) the
    year-partitioned + ghost-tail form with identical results.
    """
    reserved = {"_day_num", "_pyear", "_ghost", "_keep"}
    clash = reserved.intersection(daily.columns)
    if clash:
        raise ValueError(
            "rolling_calendar_frame reserves internal column names "
            f"{sorted(clash)}; rename them in the input frame"
        )
    day_num = F.datediff(F.col(date_col), F.lit("1970-01-01"))
    base = daily.withColumn("_day_num", day_num)
    if not partition_years:
        w = Window.orderBy("_day_num").rangeBetween(
            -tail_days, Window.currentRow
        )
        out = base
        keep_filter = None
    else:
        year = F.year(F.col(date_col))
        real = base.withColumn("_pyear", year).withColumn(
            "_ghost", F.lit(False)
        )
        # a day within tail_days before the NEXT year's Jan 1 is also
        # visible (as a frame member only) to that year's early frames
        nxt = (year + 1).cast("int")
        ghosts = (
            base.where(
                F.datediff(
                    F.make_date(nxt, F.lit(1), F.lit(1)), F.col(date_col)
                )
                <= tail_days
            )
            .withColumn("_pyear", nxt)
            .withColumn("_ghost", F.lit(True))
        )
        out = real.unionByName(ghosts)
        w = (
            Window.partitionBy("_pyear")
            .orderBy("_day_num")
            .rangeBetween(-tail_days, Window.currentRow)
        )
        keep_filter = ~F.col("_ghost")
    cols = [out[c] for c in daily.columns]
    cols += [expr.over(w).alias(name) for name, expr in aggs.items()]
    res = out.select(*cols) if keep_filter is None else (
        out.withColumn("_keep", keep_filter)
        .select(*cols, "_keep")
        .where(F.col("_keep"))
        .drop("_keep")
    )
    return res
