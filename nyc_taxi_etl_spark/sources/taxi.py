"""Taxi source schemas and candidate-name tables.

The four NYC TLC trip schemas the reference ingests, as Spark
StructTypes, plus the candidate-name tables its heuristic schema
detection uses. Derived from:
  * yellow 17-field StructType — reference ``spark_jobs/utils.py:4-27``
  * candidate-name lists — ``scripts/analytics_pandas.py:21-28``
  * per-cab schema notes — ``notebooks/cab_wise_analysis.ipynb`` cells
    3/6/9/11 (yellow 20 cols, green 21, fhv 7 — no fare/distance,
    fhvhv 25) and FIXTURES.md.
"""

from __future__ import annotations

from pyspark.sql import types as T

CAB_TYPES = ("yellow", "green", "fhv", "fhvhv")


def _f(name: str, dtype: T.DataType) -> T.StructField:
    return T.StructField(name, dtype, True)


YELLOW_SCHEMA = T.StructType(
    [
        _f("VendorID", T.StringType()),
        _f("tpep_pickup_datetime", T.TimestampType()),
        _f("tpep_dropoff_datetime", T.TimestampType()),
        _f("passenger_count", T.IntegerType()),
        _f("trip_distance", T.DoubleType()),
        _f("RatecodeID", T.StringType()),
        _f("store_and_fwd_flag", T.StringType()),
        _f("PULocationID", T.IntegerType()),
        _f("DOLocationID", T.IntegerType()),
        _f("payment_type", T.StringType()),
        _f("fare_amount", T.DoubleType()),
        _f("extra", T.DoubleType()),
        _f("mta_tax", T.DoubleType()),
        _f("tip_amount", T.DoubleType()),
        _f("tolls_amount", T.DoubleType()),
        _f("improvement_surcharge", T.DoubleType()),
        _f("total_amount", T.DoubleType()),
    ]
)

GREEN_SCHEMA = T.StructType(
    [f for f in YELLOW_SCHEMA.fields if not f.name.startswith("tpep_")]
    + [
        _f("lpep_pickup_datetime", T.TimestampType()),
        _f("lpep_dropoff_datetime", T.TimestampType()),
        _f("trip_type", T.StringType()),
    ]
)

FHV_SCHEMA = T.StructType(
    [
        _f("dispatching_base_num", T.StringType()),
        _f("pickup_datetime", T.TimestampType()),
        _f("dropOff_datetime", T.TimestampType()),  # capital O, per TLC files
        _f("PUlocationID", T.IntegerType()),  # lowercase 'l', per TLC files
        _f("DOlocationID", T.IntegerType()),
        _f("SR_Flag", T.IntegerType()),
        _f("Affiliated_base_number", T.StringType()),
    ]
)

FHVHV_SCHEMA = T.StructType(
    [
        _f("hvfhs_license_num", T.StringType()),
        _f("dispatching_base_num", T.StringType()),
        _f("originating_base_num", T.StringType()),
        _f("request_datetime", T.TimestampType()),
        _f("on_scene_datetime", T.TimestampType()),
        _f("pickup_datetime", T.TimestampType()),
        _f("dropoff_datetime", T.TimestampType()),
        _f("PULocationID", T.IntegerType()),
        _f("DOLocationID", T.IntegerType()),
        _f("trip_miles", T.DoubleType()),
        _f("trip_time", T.LongType()),
        _f("base_passenger_fare", T.DoubleType()),
        _f("tolls", T.DoubleType()),
        _f("bcf", T.DoubleType()),
        _f("sales_tax", T.DoubleType()),
        _f("congestion_surcharge", T.DoubleType()),
        _f("airport_fee", T.DoubleType()),
        _f("tips", T.DoubleType()),
        _f("driver_pay", T.DoubleType()),
        _f("shared_request_flag", T.StringType()),
        _f("shared_match_flag", T.StringType()),
        _f("access_a_ride_flag", T.StringType()),
        _f("wav_request_flag", T.StringType()),
        _f("wav_match_flag", T.StringType()),
        _f("cbd_congestion_fee", T.DoubleType()),
    ]
)

SOURCE_SCHEMAS = {
    "yellow": YELLOW_SCHEMA,
    "green": GREEN_SCHEMA,
    "fhv": FHV_SCHEMA,
    "fhvhv": FHVHV_SCHEMA,
}

# Candidate-name tables for heuristic schema detection
# (reference scripts/analytics_pandas.py:21-28): tried in order, with
# exact → case-insensitive → substring matching.
CANDIDATES: dict[str, tuple[str, ...]] = {
    "pickup": (
        "tpep_pickup_datetime",
        "lpep_pickup_datetime",
        "pickup_datetime",
    ),
    "dropoff": (
        "tpep_dropoff_datetime",
        "lpep_dropoff_datetime",
        "dropoff_datetime",
        "dropOff_datetime",
    ),
    "distance": ("trip_distance", "trip_miles"),
    "fare": ("fare_amount", "total_amount"),
    "tip": ("tip_amount", "tips"),
    "pu": ("PULocationID", "PUlocationID"),
    "do": ("DOLocationID", "DOlocationID"),
}

# fhvhv fare reconstruction components
# (reference scripts/analytics_pandas.py:26,52-58,139-153).
FARE_COMPONENTS: tuple[str, ...] = (
    "base_passenger_fare",
    "tips",
    "tolls",
    "bcf",
    "sales_tax",
    "congestion_surcharge",
    "airport_fee",
)

# The unified trip schema (engine output contract — FIXTURES.md §7).
UNIFIED_FIELDS: tuple[str, ...] = (
    "cab_type",
    "pickup_datetime",
    "dropoff_datetime",
    "pickup_zone",
    "dropoff_zone",
    "trip_distance",
    "fare_amount",
    "tip_amount",
    "total_amount",
)
