"""Cleaning + feature derivation over the unified trip schema.

Re-expresses ``spark_jobs/utils.py:35-83`` (clean_yellow_data v2
pipeline) and ``spark_jobs/etl_yellow_s3.py:51`` (v1 validity filter)
as parameterized, schema-tolerant operators on the unified frame.

Every step is a Catalyst filter/projection — pushdown-friendly, no
shuffles, codegen'd. Thresholds are keyword args with the reference's
defaults.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import safe_div

__all__ = ["CleanConfig", "validity_filter", "order_filter", "outlier_filter",
           "derive_features", "clean"]


@dataclass(frozen=True)
class CleanConfig:
    """Thresholds per reference ``spark_jobs/utils.py:67-72`` /
    ``etl_yellow_s3_v2.py:57-61``."""

    min_duration_min: float = 0.5
    max_duration_min: float = 1440.0
    min_distance: float = 0.0
    max_distance: float = 500.0
    min_fare: float = 0.0


def validity_filter(df: DataFrame) -> DataFrame:
    """v1 validity: fare > 0 AND distance > 0
    (``spark_jobs/etl_yellow_s3.py:51``) — applied only when the
    columns are non-null-capable for the cab type (fhv rows, whose
    fare/distance are all null, would vanish; the reference's pandas
    path guards on column presence, we guard on null)."""
    return df.filter(
        (F.col("fare_amount").isNull() | (F.col("fare_amount") > 0))
        & (F.col("trip_distance").isNull() | (F.col("trip_distance") > 0))
    )


def order_filter(df: DataFrame) -> DataFrame:
    """Null/ordering sanity: pickup & dropoff present and
    dropoff > pickup (``spark_jobs/utils.py:54-58``)."""
    return df.filter(
        F.col("pickup_datetime").isNotNull()
        & F.col("dropoff_datetime").isNotNull()
        & (F.col("dropoff_datetime") > F.col("pickup_datetime"))
    )


def outlier_filter(df: DataFrame, cfg: CleanConfig = CleanConfig()) -> DataFrame:
    """Range/outlier bounds on duration/distance/fare
    (``spark_jobs/utils.py:67-72``); null-tolerant for fhv."""
    dur = (
        F.col("dropoff_datetime").cast("long")
        - F.col("pickup_datetime").cast("long")
    ) / 60.0
    return df.filter(
        (dur > cfg.min_duration_min)
        & (dur < cfg.max_duration_min)
        & (
            F.col("trip_distance").isNull()
            | (
                (F.col("trip_distance") > cfg.min_distance)
                & (F.col("trip_distance") < cfg.max_distance)
            )
        )
        & (F.col("fare_amount").isNull() | (F.col("fare_amount") >= cfg.min_fare))
    )


def derive_features(df: DataFrame) -> DataFrame:
    """Derived columns per ``spark_jobs/utils.py:61-81`` /
    ``etl_yellow_s3_v2.py:50-77``: duration, fare_per_mile (guarded
    division), avg_speed_mph, time features. All null-safe."""
    dur_min = (
        (
            F.col("dropoff_datetime").cast("long")
            - F.col("pickup_datetime").cast("long")
        )
        / 60.0
    ).alias("trip_duration_min")
    return df.select(
        "*",
        dur_min,
    ).select(
        "*",
        safe_div(F.col("fare_amount"), F.col("trip_distance")).alias("fare_per_mile"),
        safe_div(
            F.col("trip_distance") * 60.0, F.col("trip_duration_min")
        ).alias("avg_speed_mph"),
        F.to_date("pickup_datetime").alias("pickup_date"),
        F.hour("pickup_datetime").alias("pickup_hour"),
        (F.weekday("pickup_datetime") + 1).alias("pickup_dow"),
        F.year("pickup_datetime").alias("year"),
        F.month("pickup_datetime").alias("month"),
    )


def clean(df: DataFrame, cfg: CleanConfig = CleanConfig()) -> DataFrame:
    """Full v2 pipeline: validity → order → outliers → features
    (``spark_jobs/etl_yellow_s3_v2.py:32-79``). One scan, one codegen
    stage — Catalyst collapses the chained filters."""
    return derive_features(outlier_filter(order_filter(validity_filter(df)), cfg))
