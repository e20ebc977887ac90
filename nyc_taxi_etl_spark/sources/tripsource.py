"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource``):
``tlc_synthetic`` — a deterministic TLC-trip generator with
partition-parallel reads and source-level filter pushdown.

Why it exists: the reference's ingestion is a driver-side month loop
downloading files (`scripts/download_tlc_range_s3.py`); the engine's
equivalent extension surface is a REGISTERED SOURCE — any consumer
says ``spark.read.format("tlc_synthetic")`` and gets a distributed,
pruned scan, no driver loop. This is also the test rig for arbitrary
volumes of trip data without network or disk: rows are synthesized
per (cab, month) partition by pure integer arithmetic (no RNG state),
so every read of the same options is bit-identical.

Scale posture baked into the API usage:
  * one ``InputPartition`` per (cab, month) — Spark schedules them
    across executors; generation is embarrassingly parallel;
  * ``pushFilters`` consumes EqualTo/In filters on ``cab_type`` so a
    filtered read PLANS fewer partitions (observable as fewer RDD
    partitions — partition pruning at the source, the custom-source
    analogue of Hive-partition pruning); all other filters are
    returned to Spark for post-scan evaluation;
  * rows stream from a generator — no per-partition materialization.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    In,
    InputPartition,
)

__all__ = ["TlcSyntheticDataSource", "register"]

_CABS = ("yellow", "green", "fhv", "fhvhv")

_SCHEMA = (
    "cab_type string, pickup_datetime timestamp, "
    "dropoff_datetime timestamp, pickup_zone int, dropoff_zone int, "
    "trip_distance double, fare_amount double, tip_amount double, "
    "total_amount double"
)


class _MonthPartition(InputPartition):
    def __init__(self, cab: str, year: int, month: int, rows: int):
        self.cab = cab
        self.year = year
        self.month = month
        self.rows = rows


class _TlcReader(DataSourceReader):
    def __init__(self, options):
        self.cabs = list(_CABS)
        self.year = int(options.get("year", 2023))
        self.months = int(options.get("months", 3))
        self.rows_per_month = int(options.get("rows_per_month", 1000))

    def pushFilters(self, filters):
        # consume cab_type equality/membership (partition pruning);
        # hand everything else back to Spark
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("cab_type",):
                self.cabs = [c for c in self.cabs if c == f.value]
            elif isinstance(f, In) and f.attribute == ("cab_type",):
                allowed = set(f.value)
                self.cabs = [c for c in self.cabs if c in allowed]
            else:
                yield f

    def partitions(self):
        return [
            _MonthPartition(cab, self.year, m, self.rows_per_month)
            for cab in self.cabs
            for m in range(1, self.months + 1)
        ]

    def read(self, part: _MonthPartition):
        cab_id = _CABS.index(part.cab)
        base = datetime(part.year, part.month, 1, tzinfo=timezone.utc)
        # minutes in month without calendar math edge cases: derive
        # from the next month's first day
        nxt = (
            datetime(part.year + 1, 1, 1, tzinfo=timezone.utc)
            if part.month == 12
            else datetime(part.year, part.month + 1, 1, tzinfo=timezone.utc)
        )
        span_min = int((nxt - base).total_seconds() // 60)
        for i in range(part.rows):
            # pure integer arithmetic — deterministic, seedless
            h = (i * 7919 + cab_id * 104729 + part.month * 1299721) % 2**31
            pickup = base + timedelta(minutes=h % span_min)
            dur_min = 3 + (h >> 5) % 55
            dist = round(0.3 + ((h >> 7) % 2000) / 100.0, 2)
            fare = round(2.5 + dist * 2.1 + dur_min * 0.35, 2)
            tip = round(fare * ((h >> 11) % 30) / 100.0, 2)
            yield (
                part.cab,
                pickup.replace(tzinfo=None),
                (pickup + timedelta(minutes=dur_min)).replace(tzinfo=None),
                1 + h % 263,
                1 + (h >> 3) % 263,
                dist,
                fare,
                tip,
                round(fare + tip, 2),
            )


class TlcSyntheticDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "tlc_synthetic"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _TlcReader(self.options)


def register(spark) -> None:
    """Register the source on a session:
    ``spark.read.format('tlc_synthetic').option('months', 6).load()``

    Python-source filter pushdown ships behind a flag in Spark 4 —
    a reader implementing ``pushFilters`` is an ERROR with the flag
    off, so registration turns it on for the session."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(TlcSyntheticDataSource)
