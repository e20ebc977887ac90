"""Expectation-suite counting on planted violations (the TPC-H-ish
tables are mostly clean, so the oracle match alone would leave the
violation arms untested) plus the one-scan plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_etl_spark.operators import expectations as ex


def _suite(spark):
    rows = [
        (1, 10.0, "A", "ok-1"),
        (2, -5.0, "A", "ok-2"),      # range violation
        (None, 3.0, "B", "ok-3"),    # null id + bad flag
        (4, 7.0, "A", "bad 4"),      # regex violation
        (4, 2.0, "A", "ok-5"),       # duplicate id
        (9, None, "A", None),        # null value + null text
    ]
    return spark.createDataFrame(rows, "id int, v double, flag string, txt string")


def test_row_checks_count_violations(spark):
    df = _suite(spark)
    ref = spark.createDataFrame([(1,), (2,), (4,)], ["k"])
    out = {
        r.check_name: r
        for r in ex.run_checks(
            df,
            [
                ex.not_null("id"),
                ex.in_range("v", 0.0, 100.0),
                ex.in_set("flag", ["A"]),
                ex.matches("txt", r"^ok-\d$"),
                ex.satisfies("v_above_1", F.col("v") > 1.0),
                ex.unique("id"),
                ex.referential("id", ref, "k", "id_in_ref"),
            ],
        ).collect()
    }
    assert all(r.n_rows == 6 for r in out.values())
    assert out["not_null:id"].n_violations == 1
    assert out["in_range:v"].n_violations == 2  # -5 and NULL
    assert out["in_set:flag"].n_violations == 1
    assert out["matches:txt"].n_violations == 2  # 'bad 4' and NULL
    assert out["satisfies:v_above_1"].n_violations == 2  # -5 fails, NULL fails
    assert out["unique:id"].n_violations == 1  # one extra copy of 4
    assert out["referential:id_in_ref"].n_violations == 2  # NULL and 9
    assert out["not_null:id"].passed == 0
    clean = ex.run_checks(df, [ex.in_range("v", -100.0, 100.0)]).first()
    # NULL v still violates the closed range; range check is null-strict
    assert clean.n_violations == 1


def test_all_row_checks_share_one_scan(spark):
    df = _suite(spark)
    plan = ex.run_checks(
        df,
        [ex.not_null("id"), ex.in_range("v", 0, 1), ex.unique("id", "flag")],
    )._jdf.queryExecution().optimizedPlan().toString()
    # a single Aggregate node: adding checks must not add passes
    assert plan.count("Aggregate") == 1


def test_empty_suite_is_empty_frame(spark):
    out = ex.run_checks(_suite(spark), [])
    assert out.count() == 0
    assert out.columns == [
        "check_name",
        "kind",
        "n_rows",
        "n_violations",
        "passed",
    ]


def test_fd_check_values_both_formulations(spark):
    # o1 -> two custs (violates), c-keyed FD holds, NULL rhs ignored
    rows = [
        (1, 10, "A"),
        (1, 11, "A"),
        (2, 10, "B"),
        (3, None, "B"),
    ]
    df = spark.createDataFrame(rows, "ok int, ck int, pr string")
    for one_pass in (False, True):
        out = {
            r.fd: r
            for r in ex.fd_check(
                df, [(["ok"], "ck"), (["ck"], "pr")], one_pass=one_pass
            ).collect()
        }
        assert set(out) == {"ok -> ck", "ck -> pr"}, one_pass
        v = out["ok -> ck"]
        assert (
            v.n_groups,
            v.violating_groups,
            v.max_rhs_variants,
            v.passed,
        ) == (3, 1, 2, 0), one_pass
        # ck groups: 10 -> {A,B} violates; 11 -> {A}; NULL ck is a group
        w = out["ck -> pr"]
        assert (
            w.n_groups,
            w.violating_groups,
            w.max_rhs_variants,
            w.passed,
        ) == (3, 1, 2, 0), one_pass


def test_fd_check_empty_input_vacuous_pass(spark):
    df = spark.createDataFrame([], "ok int, ck int")
    for one_pass in (False, True):
        row = ex.fd_check(df, [(["ok"], "ck")], one_pass=one_pass).first()
        assert (
            row.fd,
            row.n_groups,
            row.violating_groups,
            row.max_rhs_variants,
            row.passed,
        ) == ("ok -> ck", 0, 0, 0, 1), one_pass


def test_fd_check_default_path_prunes_columns_per_fd(spark):
    """The default (per-FD) formulation must scan only each FD's own
    2-3 columns — the measured reason it beats the one-pass explode
    (r10: 2.45 s vs 5.03 s) is column-pruned native-typed exchanges; a
    refactor silently widening the per-FD scans would erase it (r10
    ADVICE: only the one_pass shape had a plan pin)."""
    df = spark.createDataFrame(
        [(1, 2, 3, "x", 5.0)], "a int, b int, c int, d string, e double"
    )
    plan = (
        ex.fd_check(df, [(["a"], "b"), (["b"], "c")])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # each FD branch must prune to exactly its own 2 columns right
    # above the relation (d/e still appear in the LogicalRDD's schema
    # line — pruning for in-memory relations happens via the Project)
    import re

    pruned = re.findall(r"Project \[([a-z]#\d+(?:, [a-z]#\d+)*)\]", plan)
    assert len(pruned) == 2, plan
    assert all(len(p.split(", ")) == 2 for p in pruned), pruned
    assert not any(c.startswith(("d#", "e#")) for p in pruned for c in p.split(", ")), pruned
    # and each FD reads its own pruned pass (2 scans for 2 FDs)
    assert plan.count("LogicalRDD") == 2


def test_fd_check_one_pass_single_scan_for_many_fds(spark):
    df = spark.createDataFrame([(1, 2, 3)], "a int, b int, c int")
    plan = (
        ex.fd_check(
            df,
            [(["a"], "b"), (["b"], "c"), (["a", "b"], "c")],
            one_pass=True,
        )
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # one Generate (the per-FD explode) over one relation scan: adding
    # FDs must not add passes over the audited table on this path
    assert plan.count("Generate") <= 2  # FD explode + label literals
    assert plan.count("LogicalRDD") + plan.count("Relation") <= 2
