"""JSON-Lines corpus ingestion with malformed-record quarantine.

Web-scale document dumps arrive as JSONL (one object per line, often
gzip'd), and at 100 TB some lines WILL be truncated or mis-encoded.
The production posture is Spark's PERMISSIVE mode with an explicit
``columnNameOfCorruptRecord``: good rows parse against the declared
schema, bad rows land intact in the quarantine column for an audit
count — never a task failure, never silent data loss (DROPMALFORMED
hides corruption; FAILFAST turns one bad byte into a dead job).

Schema is REQUIRED, not inferred: inference costs an extra full pass
over 100 TB and lets a drifting producer silently change column types
mid-corpus. (It is also what makes the corrupt-record column work —
with inference the corrupt column must be added to the inferred
schema by hand.)

No reference counterpart (the reference ingests parquet only —
``spark_jobs/etl_yellow_s3.py``); this is charter extension surface:
the ingestion front door of an LLM data pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["jsonl_schema_with_quarantine", "read_jsonl", "jsonl_ingest_audit"]

CORRUPT_COL = "_corrupt_record"


def jsonl_schema_with_quarantine(schema: T.StructType) -> T.StructType:
    """``schema`` + the quarantine string column (idempotent)."""
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    multiline: bool = False,
) -> DataFrame:
    """PERMISSIVE JSONL read: parsed rows + quarantined corrupt lines.

    Returns the declared columns plus ``_corrupt_record`` (NULL for
    clean rows, the raw line for malformed ones). Line-oriented by
    default so splits stay byte-range parallel (``multiline=True``
    only for pretty-printed JSON arrays, which cannot split).
    """
    return (
        spark.read.schema(jsonl_schema_with_quarantine(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("multiLine", str(multiline).lower())
        .json(path)
    )


def jsonl_ingest_audit(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """One-row ingest audit over a ``read_jsonl`` frame: total lines,
    clean rows, quarantined rows, and clean rows whose ``key_col``
    (default: first declared column) parsed to NULL — the
    partial-parse signal (line was valid JSON but missing/mistyped the
    key field). Single conditional aggregation: one scan, map-side
    partials, same shape as ``etl_filter_audit``.

    Referencing a real column is also load-bearing: Spark disallows
    queries that reference ONLY the internal corrupt-record column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), so a
    corrupt-only rollup would need a cache of the parsed frame —
    unacceptable at corpus scale."""
    if key_col is None:
        key_col = next(c for c in df.columns if c != CORRUPT_COL)
    corrupt = F.col(CORRUPT_COL).isNotNull()
    return df.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.when(~corrupt, 1).otherwise(0)).cast("long").alias("n_clean"),
        F.sum(F.when(corrupt, 1).otherwise(0)).cast("long").alias("n_corrupt"),
        F.sum(
            F.when(~corrupt & F.col(key_col).isNull(), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_clean_null_key"),
    )
