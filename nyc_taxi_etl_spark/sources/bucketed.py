"""Bucketed tables: pre-shuffled storage layouts for co-located joins.

The 100 TB join problem: orders ⋈ lineitem shuffles BOTH fact tables
on every run. If the tables are WRITTEN bucketed by the join key
(hash-partitioned into a fixed bucket count at write time, Hive
bucketing), Spark's scan reports the bucket distribution and the join
planner drops the Exchange entirely — the shuffle is paid once at
write, amortized over every subsequent join/aggregate on that key.
This is the storage-side complement to ``broadcast`` (small dims) and
AQE (runtime re-planning): the tool for LARGE⋈LARGE repeated joins.

Rules that make it work (all asserted in tests/test_bucketed.py):
  * both sides bucketed by the SAME key into the SAME bucket count
    (mismatched counts re-shuffle one side);
  * ``sortBy`` within buckets lets sort-merge join skip its sort too;
  * bucket pruning: an equality predicate on the bucket key scans ONE
    bucket's files — point lookups touch 1/N of the data with zero
    index structures. Caveat: ``autoBucketedScan`` disables the
    bucketed layout for plans where no operator needs the
    distribution (a bare filter), which also disables pruning — pin
    ``spark.sql.sources.bucketing.autoBucketedScan.enabled=false``
    for point-lookup workloads.

Bucketed tables require the session catalog (``saveAsTable``); plain
``parquet(path)`` writes cannot record bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_bucketed"]


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed catalog table: hash-distributed
    into ``buckets`` files per partition by ``keys``, sorted within
    buckets when ``sort`` (enables exchange-free AND sort-free
    sort-merge joins).

    Bucket count is a layout commitment — pick it once per subject
    area (co-joining tables must match) and size it so a single
    bucket's data fits an executor core's working set at target
    scale."""
    w = df.write.format("parquet").mode(mode).bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table THROUGH THE CATALOG — ``spark.table``
    carries the bucket spec into planning; reading the files by path
    would silently lose it (and the join would shuffle again)."""
    return spark.table(table)
