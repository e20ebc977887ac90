from __future__ import annotations

import os

import duckdb
import pytest

from nyc_taxi_etl_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MED = "/root/testdata/sf0.01"
# The ORACLE gate (tests/test_oracle.py) can be pointed at a larger
# scale factor, e.g. `SPARK_GRAFT_SF=sf0.1 pytest tests/test_oracle.py`
# — the DuckDB oracles are written on their scale paths (bucketed
# candidate joins, materialized hop+jump closures) precisely so this
# sweep finishes in bounded time. Other suites stay at sf0.001: they
# pin dataset-specific values (exact counts, tie-free top-k prefixes).
_ORACLE_SF = os.environ.get("SPARK_GRAFT_SF")
# a bare label (sf0.1) resolves under /root/testdata; a path (e.g.
# .scaledata/sf1 from tools/gen_scale_data.py) is used as-is, so the
# oracle gate can run against generated scale factors too
ORACLE_SF_DIR = (
    _ORACLE_SF
    if _ORACLE_SF and "/" in _ORACLE_SF
    else f"/root/testdata/{_ORACLE_SF}"
    if _ORACLE_SF
    else SF_DIR
)
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
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            # Spark-written dataset (directory of part files): DuckDB
            # needs the glob form
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{path}'"
        )


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    _register(con, SF_DIR)
    yield con
    con.close()


@pytest.fixture(scope="session")
def duck_oracle():
    """DuckDB views at the oracle-gate scale factor (SPARK_GRAFT_SF
    env override; defaults to the sf0.001 of every other suite)."""
    con = duckdb.connect()
    _register(con, ORACLE_SF_DIR)
    yield con
    con.close()


@pytest.fixture(scope="session")
def duck_med():
    con = duckdb.connect()
    _register(con, SF_DIR_MED)
    yield con
    con.close()
