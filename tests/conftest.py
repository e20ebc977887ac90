from __future__ import annotations

import duckdb
import pytest

from nyc_taxi_etl_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MED = "/root/testdata/sf0.01"
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def _register(con: duckdb.DuckDBPyConnection, sf_dir: str) -> None:
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    _register(con, SF_DIR)
    yield con
    con.close()


@pytest.fixture(scope="session")
def duck_med():
    con = duckdb.connect()
    _register(con, SF_DIR_MED)
    yield con
    con.close()
