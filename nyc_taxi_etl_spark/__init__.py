"""nyc_taxi_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first rebuild of the query and data-processing
capabilities of the reference repo ``AdityaShah123/nyc-taxi-etl`` (a batch
ETL + analytics pipeline over NYC TLC trip records), extended with the
operators a large-scale LLM training-data pipeline needs (dedup,
similarity search, text analysis, multimodal plumbing) and designed for
100 TB scale: declarative DataFrame plans (Catalyst optimizes), AQE on,
broadcast joins for dims, partitioned writes, no driver-side collection
in any operator.

Layout:
  session     — SparkSession factory (AQE, UTC, Arrow, nanos handling)
  sources     — table catalog over the test parquet, taxi source schemas,
                schema detection, partitioned sinks, ingest manifest
  operators   — normalize / clean / dedup / similarity / text /
                multimodal / ml
  functions   — reusable column-expression helpers (season, safe_div,
                histogram buckets, top-k, z-score)
  plans       — the query catalog (each reference analysis as a named
                DataFrame plan) + matching DuckDB oracle SQL
  streaming   — Structured Streaming variants of the rollups
"""

__version__ = "0.1.0"
