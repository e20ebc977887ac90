"""Unit tests for operators/merge.py keep-latest upsert semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_etl_spark.operators.merge import merge_upsert


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0, 1), (2, "b", 20.0, 1), (3, "c", 30.0, 5)],
        "k long, name string, amt double, ver long",
    )


def test_updates_win_and_inserts_append(spark):
    base = _base(spark)
    updates = spark.createDataFrame(
        [(2, "b2", 25.0, 2), (4, "d", 40.0, 1)],
        "k long, name string, amt double, ver long",
    )
    got = {r["k"]: r for r in merge_upsert(base, updates, ["k"]).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[2]["name"] == "b2" and got[2]["amt"] == 25.0
    assert got[4]["name"] == "d"  # pure insert
    assert got[1]["name"] == "a"  # untouched


def test_version_beats_source(spark):
    base = _base(spark)
    # stale update (ver 2 < base ver 5) must NOT clobber key 3
    updates = spark.createDataFrame(
        [(3, "stale", 1.0, 2)], "k long, name string, amt double, ver long"
    )
    got = {r["k"]: r for r in merge_upsert(base, updates, ["k"], version_col="ver").collect()}
    assert got[3]["name"] == "c" and got[3]["ver"] == 5


def test_partial_update_columns_fill_null(spark):
    base = _base(spark)
    updates = spark.createDataFrame([(1, 99.0)], "k long, amt double")
    got = {r["k"]: r for r in merge_upsert(base, updates, ["k"]).collect()}
    assert got[1]["amt"] == 99.0 and got[1]["name"] is None


def test_merge_single_shuffle(spark):
    base, updates = _base(spark), _base(spark)
    plan = (
        merge_upsert(base, updates, ["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_merge_upsert_tombstones(spark):
    """r7 op_col: a delete tombstone wins its key and erases it; a
    HIGHER-version re-insert after a delete resurrects the key; the
    op column is consumed."""
    from nyc_taxi_etl_spark.operators.merge import merge_upsert

    base = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 1)], "k int, v string, ver int"
    )
    updates = spark.createDataFrame(
        [
            (2, None, 2, "D"),        # delete key 2
            (3, "c2", 2, "U"),        # update key 3
            (4, "d", 2, "U"),         # insert key 4
            (1, None, 2, "D"),        # delete key 1 ...
            (1, "a2", 3, "U"),        # ... then re-insert at higher ver
        ],
        "k int, v string, ver int, op string",
    )
    out = merge_upsert(
        base, updates, keys=["k"], version_col="ver", op_col="op"
    )
    assert "op" not in out.columns
    got = {r["k"]: (r["v"], r["ver"]) for r in out.collect()}
    assert got == {1: ("a2", 3), 3: ("c2", 2), 4: ("d", 2)}


def test_merge_upsert_rejects_reserved_names(spark):
    import pytest

    from nyc_taxi_etl_spark.operators.merge import merge_upsert

    df = spark.createDataFrame([(1, 0)], "k int, _src int")
    with pytest.raises(ValueError, match="_src"):
        merge_upsert(df, df, keys=["k"])
