"""Every catalog query with an oracle must hash-match DuckDB — this is
a local replica of the driver's t2 correctness gate (sf0.001 for speed;
the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from nyc_taxi_etl_spark.plans import ORACLE, QUERIES

from .compare import assert_frames_match
from .conftest import SF_DIR


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(name, spark, duck):
    spark_pdf = QUERIES[name](spark, SF_DIR).toPandas()
    duck_pdf = duck.execute(ORACLE[name]).df()
    assert len(spark_pdf) > 0, f"{name}: empty result"
    assert_frames_match(spark_pdf, duck_pdf, name)


def test_all_queries_have_entries(spark):
    assert set(ORACLE) <= set(QUERIES)
    for name in QUERIES:
        df = QUERIES[name](spark, SF_DIR)
        assert df.columns, name
