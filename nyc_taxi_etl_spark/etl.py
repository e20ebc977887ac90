"""ETL driver: raw cab parquet → normalize → clean → partitioned
curated table.

Replaces the reference's per-month spark-submit jobs
(``spark_jobs/etl_yellow_s3.py:35-66``, ``etl_yellow_s3_v2.py``) and
the orchestration loop (``scripts/batch_etl_simple.py:45-56``) with a
single idempotent job over whatever months exist: Spark's partition
discovery + ``partitionBy`` writes replace manual path construction
(``tlc/curated/{cab}/year=YYYY/month=MM`` — ``etl_yellow_s3.py:43-44``).

Scale posture:
  * curated layout ``cab_type=*/year=*/month=*`` → partition pruning
    for every time/cab-sliced query;
  * no ``coalesce(1)`` (the reference's laptop-ism): AQE sizes output
    tasks; callers can set ``target_files`` per partition if needed;
  * metrics via a count aggregate, not repeated ``df.count()`` scans
    (the reference double-counted the scan, ``etl_yellow_s3.py:48,52``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from .operators.clean import CleanConfig, clean
from .operators.normalize import unify
from .sources.taxi import CAB_TYPES

__all__ = ["EtlResult", "run_etl", "read_curated"]


@dataclass
class EtlResult:
    rows_in: int
    rows_out: int
    curated_path: str
    metrics: dict = field(default_factory=dict)


def run_etl(
    spark: SparkSession,
    raw_paths: dict[str, str],
    curated_path: str,
    cfg: CleanConfig = CleanConfig(),
    target_files: int | None = None,
    collect_metrics: bool = True,
) -> EtlResult:
    """Read raw per-cab parquet dirs → unified clean table →
    ``partitionBy(cab_type, year, month)`` parquet.

    ``raw_paths`` maps cab_type → parquet path (file, dir, or glob).
    """
    raw = {cab: spark.read.parquet(path) for cab, path in raw_paths.items()}
    unified = unify(raw)

    # Metrics PIGGYBACK ON THE WRITE via df.observe: the in/out counts
    # and quality tallies are computed by the same job that writes the
    # curated table — zero extra scans (the previous form re-read the
    # curated output for rows_out and counted each raw input
    # separately: three additional jobs at 100 TB).
    obs_in = obs_out = None
    if collect_metrics:
        obs_in, obs_out = Observation("etl_in"), Observation("etl_out")
        unified = unified.observe(
            obs_in, F.count(F.lit(1)).alias("rows_in")
        )
    cleaned = clean(unified, cfg)
    if collect_metrics:
        cleaned = cleaned.observe(
            obs_out,
            F.count(F.lit(1)).alias("rows_out"),
            F.sum(F.col("fare_amount").isNull().cast("long")).alias(
                "null_fares"
            ),
            # DISTINCT aggregates are rejected in observed metrics;
            # the HLL estimate is exact at this cardinality (≤4 cabs)
            F.approx_count_distinct("cab_type").alias("cab_types_out"),
        )

    writer = cleaned
    if target_files is not None:
        writer = cleaned.coalesce(target_files)
    (
        writer.write.mode("overwrite")
        .partitionBy("cab_type", "year", "month")
        .parquet(curated_path)
    )
    if not collect_metrics:
        return EtlResult(rows_in=-1, rows_out=-1, curated_path=curated_path)
    m_out = obs_out.get
    return EtlResult(
        rows_in=int(obs_in.get["rows_in"]),
        rows_out=int(m_out["rows_out"]),
        curated_path=curated_path,
        metrics={k: int(v) for k, v in m_out.items()},
    )


def read_curated(spark: SparkSession, curated_path: str, cabs: tuple[str, ...] = CAB_TYPES) -> DataFrame:
    """Partition-discovering read of the curated table. Filters on
    cab_type/year/month prune partitions (the reference's 'drastically
    reduced scan times', Report.pdf §12 — here for free)."""
    df = spark.read.parquet(curated_path)
    if set(cabs) != set(CAB_TYPES):
        from pyspark.sql import functions as F

        df = df.filter(F.col("cab_type").isin(*cabs))
    return df
