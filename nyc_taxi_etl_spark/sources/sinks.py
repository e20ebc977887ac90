"""Sink helpers (SURVEY.md §2.1 S10–S13).

The reference controls output file counts with ``coalesce(1)`` /
``coalesce(10)`` before every write (``spark_jobs/etl_yellow_s3.py:56``,
``etl_yellow_s3_v2.py:86``) and hand-builds Hive paths
(``year={y}/month={m:02d}`` — ``etl_simple.py:45``). The engine keeps
the file-count knob but replaces path interpolation with
``partitionBy`` so partition pruning works without convention.

Scale: ``coalesce`` narrows without a shuffle (right for shrinking to
few files); ``repartition`` is used instead when GROWING the file count
or when combined with partitioning, where per-partition file control
needs a hash exchange on the partition keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["write_parquet", "write_csv", "write_jsonl", "write_orc"]


def _with_file_count(df: DataFrame, target_files: int | None, partition_by) -> DataFrame:
    if target_files is None:
        return df
    if partition_by:
        # spread within partitions: hash exchange on the partition keys
        # so each Hive partition writes ~target_files files
        return df.repartition(target_files, *[F.col(c) for c in partition_by])
    if target_files <= df.rdd.getNumPartitions():
        return df.coalesce(target_files)  # narrow, no shuffle
    return df.repartition(target_files)


def _write(
    df: DataFrame,
    path: str,
    fmt: str,
    mode: str,
    partition_by: list[str] | None,
    target_files: int | None,
    options: dict | None = None,
) -> None:
    """Shared sink scaffolding: file-count control → mode →
    partitioning → format dispatch. One copy, so the
    ``_with_file_count`` / ``partitionBy`` interaction is fixed in one
    place for every format."""
    out = _with_file_count(df, target_files, partition_by)
    writer = out.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for key, val in (options or {}).items():
        writer = writer.option(key, val)
    writer.save(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    target_files: int | None = None,
) -> None:
    """Parquet sink with optional Hive partitioning and file-count
    control (S10/S11/S13)."""
    _write(df, path, "parquet", mode, partition_by, target_files)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    target_files: int | None = 1,
) -> None:
    """CSV sink (S12 — the reference's aggregate→CSV exports,
    ``scripts/analytics_summary.py:63-75``). Defaults to one file, the
    shape those small result tables want."""
    out = _with_file_count(df, target_files, None)
    out.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    target_files: int | None = None,
    compression: str | None = None,
) -> None:
    """JSON-Lines sink — the lingua franca of text-corpus interchange
    (one JSON object per line; what most open-data document dumps and
    tokenizer pipelines consume). Spark's json writer IS jsonl: one
    object per line per file. Same partitioning/file-count knobs as
    the parquet sink; ``compression='gzip'`` for shipping."""
    opts = {"compression": compression} if compression else None
    _write(df, path, "json", mode, partition_by, target_files, opts)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    target_files: int | None = None,
) -> None:
    """ORC sink — the other columnar interchange format (Hive/Trino
    estates). Identical knob surface to ``write_parquet``; Spark ships
    the ORC reader/writer built in, so round-trips need no extra
    packages."""
    _write(df, path, "orc", mode, partition_by, target_files)
