"""Every catalog query with an oracle must hash-match DuckDB — this is
a local replica of the driver's t2 correctness gate (sf0.001 for speed;
the driver runs sf0.01). Set ``SPARK_GRAFT_SF=sf0.1`` to run the same
gate at a larger scale factor (the oracles are written on their scale
paths — bucketed candidate joins, materialized hop+jump closures — so
the sweep stays in bounded time)."""

from __future__ import annotations

import pytest

from nyc_taxi_etl_spark.plans import (
    ORACLE,
    ORACLE_EXTRA,
    QUERIES,
    QUERIES_EXTRA,
)

from .compare import assert_frames_match
from .conftest import ORACLE_SF_DIR as SF_DIR

# The overflow registry (driver catalog caps at ~50 entries) is tested
# identically to the driver-visible catalog.
ALL_QUERIES = {**QUERIES, **QUERIES_EXTRA}
ALL_ORACLE = {**ORACLE, **ORACLE_EXTRA}


@pytest.mark.parametrize("name", sorted(ALL_ORACLE))
def test_query_matches_oracle(name, spark, duck_oracle):
    spark_pdf = ALL_QUERIES[name](spark, SF_DIR).toPandas()
    duck_pdf = duck_oracle.execute(ALL_ORACLE[name]).df()
    assert len(spark_pdf) > 0, f"{name}: empty result"
    assert_frames_match(spark_pdf, duck_pdf, name)


def test_all_queries_have_entries(spark):
    assert set(ALL_ORACLE) <= set(ALL_QUERIES)
    assert not set(QUERIES) & set(QUERIES_EXTRA)
    assert len(QUERIES) <= 50, "driver snapshot caps at ~50 entries"
    for name in ALL_QUERIES:
        df = ALL_QUERIES[name](spark, SF_DIR)
        assert df.columns, name
