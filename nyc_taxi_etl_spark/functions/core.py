"""Reusable column-expression helpers (SURVEY.md §2.9).

Each helper re-expresses a scalar pattern from the reference as a pure
Catalyst expression — JVM-side, codegen'd, no Python UDFs — so every
consumer stays inside WholeStageCodegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "season",
    "safe_div",
    "safe_cast_double",
    "month_period",
    "fare_from_components",
    "histogram_bucket",
    "topk",
    "zscore_over_all",
    "r4",
]

_NUMERIC_RE = r"^-?\d+(\.\d+)?$"


def season(month: Column) -> Column:
    """Month → season label.

    Reference: ``scripts/analytics_summary.py:13-14`` dict mapping
    {12,1,2:Winter, 3-5:Spring, 6-8:Summer, 9-11:Fall}.
    """
    return (
        F.when(month.isin(12, 1, 2), F.lit("Winter"))
        .when(month.isin(3, 4, 5), F.lit("Spring"))
        .when(month.isin(6, 7, 8), F.lit("Summer"))
        .otherwise(F.lit("Fall"))
    )


def safe_div(num: Column, den: Column) -> Column:
    """Guarded division: null when the denominator is not positive.

    Reference: ``spark_jobs/utils.py:75-76`` —
    ``when(dist > 0, fare/dist).otherwise(None)``.
    """
    return F.when(den > 0, num / den).otherwise(F.lit(None))


def safe_cast_double(c: Column) -> Column:
    """Regex-validated string→double cast (null unless fully numeric).

    Reference: ``spark_jobs/utils.py:30-32``.
    """
    return F.when(c.rlike(_NUMERIC_RE), c.cast("double")).otherwise(F.lit(None))


def month_period(ts: Column) -> Column:
    """'yyyy-MM' month period label (pandas ``dt.to_period("M")``,
    ``scripts/analytics_pandas.py:160``)."""
    return F.date_format(ts, "yyyy-MM")


def fare_from_components(*cols: Column) -> Column:
    """Total cost as null-safe component sum (fhvhv fare reconstruction,
    ``scripts/analytics_pandas.py:139-153``)."""
    out = F.coalesce(cols[0], F.lit(0.0))
    for c in cols[1:]:
        out = out + F.coalesce(c, F.lit(0.0))
    return out


def histogram_bucket(c: Column, width: float) -> Column:
    """Fixed-width histogram bucket index (floor(c/width)).

    Reference: ``plt.hist(dur, bins=60)`` — the engine exposes the
    aggregation-side histogram (A18) instead of a plotting call.
    """
    return F.floor(c / F.lit(width)).cast("long")


def topk(df: DataFrame, key_cols: list[str], order_col: str, k: int) -> DataFrame:
    """Deterministic top-k: order by metric desc then keys asc so ties
    cannot flip membership between engines (A3/A10/O1/O3)."""
    return df.orderBy(F.desc(order_col), *[F.asc(c) for c in key_cols]).limit(k)


def zscore_over_all(c: Column) -> Column:
    """z-score against the whole frame via an unpartitioned window
    (A15: ``scipy.stats.zscore`` over daily counts)."""
    from pyspark.sql import Window

    w = Window.partitionBy()
    return (c - F.avg(c).over(w)) / F.stddev_samp(c).over(w)


def r4(c: Column) -> Column:
    """Round to 4 decimals — applied to every float the oracle hashes so
    last-ulp aggregation-order noise between Spark and DuckDB vanishes."""
    return F.round(c, 4)


def normal_two_sided_p(z: Column) -> Column:
    """Two-sided normal tail 2(1−Φ(|z|)) = erfc(|z|/√2) via the
    Abramowitz & Stegun 7.1.26 polynomial (|error| < 1.5e-7) — shared
    by every entry that reports a z-based p-value (Mann-Whitney,
    Mann-Kendall). Neither Spark nor DuckDB ships a builtin erf, so
    BOTH engines evaluate this same closed form; callers round the
    result (r4) because exp() is the one libm call whose last ulp may
    differ between the JVM and a C runtime. The SQL oracles embed the
    identical expression via ``NORMAL_P_SQL``."""
    x = F.abs(z) / F.sqrt(F.lit(2.0))
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * x)
    poly = t * (
        F.lit(0.254829592)
        + t
        * (
            F.lit(-0.284496736)
            + t
            * (
                F.lit(1.421413741)
                + t * (F.lit(-1.453152027) + t * F.lit(1.061405429))
            )
        )
    )
    return poly * F.exp(-(x * x))


def normal_p_sql(z_expr: str) -> str:
    """The oracle-side twin of ``normal_two_sided_p``: the same A&S
    7.1.26 erfc as a SQL expression over ``z_expr`` (which must be a
    plain column reference — it is substituted textually several
    times)."""
    x = f"(abs({z_expr}) / sqrt(2.0))"
    t = f"(1.0 / (1.0 + 0.3275911 * {x}))"
    return (
        f"(({t} * (0.254829592 + {t} * (-0.284496736 + {t} * (1.421413741"
        f" + {t} * (-1.453152027 + {t} * 1.061405429)))))"
        f" * exp(-({x} * {x})))"
    )
