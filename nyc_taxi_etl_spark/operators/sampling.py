"""Deterministic stratified sampling: per-stratum rates applied via a
portable key hash, so the same subset materializes on every engine,
every run, and every retry — the reproducibility the reference chased
with seeded ``.sample(n=5000, random_state=42)`` (M1–M3), made
cluster-safe (seeded RNG sampling is partition-layout-dependent on
Spark; a key hash is not).

Scale posture: the predicate is a pure narrow filter (md5 of the key,
mod 1000, compared to a per-stratum threshold from a literal CASE
chain) — no shuffle, no driver state, survives any table size, and
composes with partition pruning. Oversampling rare strata is the
training-data use case: class-balanced subsets without a groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hash_bucket_permille", "stratified_hash_sample"]


def hash_bucket_permille(key: Column) -> Column:
    """Uniform bucket in [0, 1000) from md5 of the key's string form —
    bit-portable (DuckDB: ``('0x' || substr(md5(CAST(k AS VARCHAR)),
    1, 6))::BIGINT % 1000``)."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 6), 16, 10).cast("long")
        % 1000
    )


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates_permille: dict[str, int],
    default_permille: int = 0,
) -> DataFrame:
    """Keep each row iff its key hash-bucket falls under its stratum's
    per-mille rate. Strata absent from ``rates_permille`` get
    ``default_permille``."""
    rate: Column = F.lit(default_permille)
    for value, permille in rates_permille.items():
        rate = F.when(F.col(strata_col) == value, F.lit(permille)).otherwise(rate)
    return df.filter(hash_bucket_permille(F.col(key_col)) < rate)
