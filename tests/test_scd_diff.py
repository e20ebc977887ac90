"""Unit tests for operators/scd.py and operators/diff.py edge cases
the catalog oracle (real orders data) cannot pin: null attribute
values, single-observation keys, same-timestamp tiebreaks, and the
keep-unchanged diff mode."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from nyc_taxi_etl_spark.operators.diff import snapshot_diff
from nyc_taxi_etl_spark.operators.scd import scd2_history

D = dt.date


def test_scd2_runs_nulls_and_ties(spark):
    rows = [
        # key 1: A, A, null, null, B -> runs A / null / B
        (1, "A", D(2024, 1, 1), 1),
        (1, "A", D(2024, 1, 2), 2),
        (1, None, D(2024, 1, 3), 3),
        (1, None, D(2024, 1, 4), 4),
        (1, "B", D(2024, 1, 5), 5),
        # key 2: single observation -> one current run
        (2, "X", D(2024, 2, 1), 6),
        # key 3: same-day flip ordered by the tiebreak k: A(k=7), B(k=8)
        (3, "A", D(2024, 3, 1), 7),
        (3, "B", D(2024, 3, 1), 8),
    ]
    df = spark.createDataFrame(
        rows, "key int, attr string, ts date, k int"
    )
    out = scd2_history(df, ["key"], ["attr"], "ts", tiebreak=["k"])
    got = {
        (r["key"], r["version"]): (
            r["attr"],
            r["effective_from"],
            r["effective_to"],
            r["is_current"],
        )
        for r in out.collect()
    }
    assert got == {
        (1, 1): ("A", D(2024, 1, 1), D(2024, 1, 3), 0),
        (1, 2): (None, D(2024, 1, 3), D(2024, 1, 5), 0),
        (1, 3): ("B", D(2024, 1, 5), None, 1),
        (2, 1): ("X", D(2024, 2, 1), None, 1),
        (3, 1): ("A", D(2024, 3, 1), D(2024, 3, 1), 0),
        (3, 2): ("B", D(2024, 3, 1), None, 1),
    }
    # exactly one current version per key
    cur = out.filter("is_current = 1").groupBy("key").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_snapshot_diff_statuses_and_null_safety(spark):
    base = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 3.0), (4, 4.0)], "k int, v double"
    )
    revised = spark.createDataFrame(
        # 1 unchanged, 2 null->null unchanged (null-safe), 3 changed,
        # 4 removed, 5 added
        [(1, 10.0), (2, None), (3, 9.0), (5, 5.0)], "k int, v double"
    )
    out = snapshot_diff(base, revised, ["k"], ["v"])
    got = {r["k"]: (r["status"], r["old_v"], r["new_v"]) for r in out.collect()}
    assert got == {
        3: ("changed", 3.0, 9.0),
        4: ("removed", 4.0, None),
        5: ("added", None, 5.0),
    }
    full = snapshot_diff(base, revised, ["k"], ["v"], drop_unchanged=False)
    statuses = {r["k"]: r["status"] for r in full.collect()}
    assert statuses[1] == "unchanged"
    assert statuses[2] == "unchanged"  # null == null, null-safely
    assert len(statuses) == 5


def test_adaptive_lsh_bits_formula():
    """Pins the bits schedule: oracle-checked SFs (<= 2000 vectors)
    must return exactly the historical 4 bits (static SQL oracles and
    recorded hashes depend on it); larger corpora grow as
    log2(n/125) and cap at 16."""
    from nyc_taxi_etl_spark.operators.similarity import adaptive_lsh_bits

    assert adaptive_lsh_bits(0) == 4
    assert adaptive_lsh_bits(125) == 4
    assert adaptive_lsh_bits(500) == 4     # sf0.001 / sf0.01
    assert adaptive_lsh_bits(2000) == 4    # sf0.1
    assert adaptive_lsh_bits(2001) == 5    # first step past the gate
    assert adaptive_lsh_bits(20000) == 8   # sf1
    assert adaptive_lsh_bits(10**9) == 16  # capped


def test_point_in_time_join_semantics(spark):
    """Facts before the first version keep nulls; facts inside an
    interval get that interval's attrs; same-instant versions resolve
    to the highest version (last-written wins for the whole instant)."""
    from nyc_taxi_etl_spark.operators.temporal import point_in_time_join

    hist = spark.createDataFrame(
        [
            (1, "A", 1, D(2024, 1, 10)),
            (1, "B", 2, D(2024, 1, 20)),
            # key 2: two versions starting the same day
            (2, "X", 1, D(2024, 2, 1)),
            (2, "Y", 2, D(2024, 2, 1)),
        ],
        "key int, attr string, version int, effective_from date",
    )
    facts = spark.createDataFrame(
        [
            (1, D(2024, 1, 5)),   # before first version -> null
            (2, D(2024, 1, 10)),  # exactly at v1 start -> A
            (3, D(2024, 1, 15)),  # inside v1 -> A
            (4, D(2024, 1, 20)),  # at v2 start -> B
            (5, D(2024, 3, 1)),   # open interval -> B
        ],
        "fact_id int, ts date",
    ).withColumn("key", F.lit(1))
    got = {
        r["fact_id"]: r["pit_attr"]
        for r in point_in_time_join(
            facts, hist, on="key", fact_ts="ts", attrs=["attr"]
        ).collect()
    }
    assert got == {1: None, 2: "A", 3: "A", 4: "B", 5: "B"}

    f2 = spark.createDataFrame(
        [(6, D(2024, 2, 1)), (7, D(2024, 2, 5))], "fact_id int, ts date"
    ).withColumn("key", F.lit(2))
    got2 = {
        r["fact_id"]: r["pit_attr"]
        for r in point_in_time_join(
            f2, hist, on="key", fact_ts="ts", attrs=["attr"]
        ).collect()
    }
    assert got2 == {6: "Y", 7: "Y"}  # same-instant tie -> max version


def test_point_in_time_join_version_col_in_attrs(spark):
    """ADVICE r6: version_col also listed in attrs used to duplicate
    the payload column and fail with an ambiguous-column error."""
    from nyc_taxi_etl_spark.operators.temporal import point_in_time_join

    hist = spark.createDataFrame(
        [(1, "A", 1, D(2024, 1, 10)), (1, "B", 2, D(2024, 1, 20))],
        "key int, attr string, version int, effective_from date",
    )
    facts = spark.createDataFrame(
        [(1, 1, D(2024, 1, 15)), (2, 1, D(2024, 1, 25))],
        "fact_id int, key int, ts date",
    )
    out = point_in_time_join(
        facts, hist, on="key", fact_ts="ts", attrs=["attr", "version"]
    )
    assert out.columns.count("pit_version") == 1
    got = {
        r["fact_id"]: (r["pit_attr"], r["pit_version"])
        for r in out.collect()
    }
    assert got == {1: ("A", 1), 2: ("B", 2)}


def test_snapshot_diff_empty_compare_is_membership_only(spark):
    """ADVICE r6: empty compare used to raise TypeError from reduce();
    now it degrades to pure membership diff (no column can differ)."""
    base = spark.createDataFrame([(1,), (2,)], "k int")
    revised = spark.createDataFrame([(2,), (3,)], "k int")
    full = snapshot_diff(base, revised, ["k"], [], drop_unchanged=False)
    got = {r["k"]: r["status"] for r in full.collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "added"}


def test_scd2_empty_attrs_one_run_per_key(spark):
    """ADVICE r6 sibling: empty attrs used to raise TypeError; now
    only the first observation of each key starts a run."""
    rows = [
        (1, D(2024, 1, 1), 1),
        (1, D(2024, 1, 5), 2),
        (2, D(2024, 2, 1), 3),
    ]
    df = spark.createDataFrame(rows, "key int, ts date, k int")
    out = scd2_history(df, ["key"], [], "ts", tiebreak=["k"]).collect()
    assert {(r["key"], r["version"]) for r in out} == {(1, 1), (2, 1)}
    assert all(r["is_current"] == 1 for r in out)
