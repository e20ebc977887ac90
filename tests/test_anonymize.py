"""generalize/generalization_report contracts: released-table
k-anonymity, suppression accounting vs the report, ladder validation,
and the top-of-ladder fallback — semantics the oracle entry (a report)
can't pin on the released DATA."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_taxi_etl_spark.operators.anonymize import (
    generalization_report,
    generalize,
)

from .conftest import spark  # noqa: F401  (fixture re-export)


def _ladder():
    # city -> state -> '*', age -> decade -> '*'
    return [
        [F.col("city"), F.col("age")],
        [F.col("state"), F.floor(F.col("age") / F.lit(10))],
        [F.lit("*"), F.lit("*")],
    ]


@pytest.fixture(scope="module")
def people(spark):
    rows = []
    # 12 in one (city, age) cell -> k=3 satisfiable at level 0 for them
    rows += [(f"p{i}", "springfield", "il", 30) for i in range(12)]
    # scattered singleton cells that only level 1 (state, decade) pools
    rows += [(f"q{i}", f"town{i}", "il", 31 + i % 3) for i in range(6)]
    # one row whose state is unique -> suppressed at level 1
    rows += [("lone", "x", "zz", 99)]
    return spark.createDataFrame(
        rows, "pid: string, city: string, state: string, age: long"
    )


def test_report_chooses_lowest_feasible_level(spark, people):
    rep = {
        r["level"]: r
        for r in generalization_report(
            people, _ladder(), k=3, max_suppress_frac=0.10
        ).collect()
    }
    assert len(rep) == 3
    # level 0: the six town singletons + lone = 7 rows below k (> 10%)
    assert rep[0]["rows_below_k"] == 7
    assert rep[0]["chosen"] == 0
    # level 1: only 'lone' remains exposed (1/19 ~ 5.3% <= 10%)
    assert rep[1]["rows_below_k"] == 1
    assert rep[1]["chosen"] == 1
    assert rep[2]["rows_below_k"] == 0
    assert rep[2]["chosen"] == 0


def test_generalize_releases_k_anonymous_table(spark, people):
    out = generalize(
        people,
        _ladder(),
        k=3,
        max_suppress_frac=0.10,
        qi_names=["geo", "age_band"],
        drop_cols=["city", "state", "age"],
    )
    assert set(out.columns) == {"geo", "age_band", "pid"}
    sizes = out.groupBy("geo", "age_band").count().collect()
    assert sizes and all(r["count"] >= 3 for r in sizes)
    released = {r["pid"] for r in out.select("pid").collect()}
    assert "lone" not in released  # suppressed, matching the report
    assert len(released) == 19 - 1


def test_generalize_falls_back_to_ladder_top(spark, people):
    # budget 0: no level passes until the all-'*' top (0 below-k rows)
    rep = {
        r["level"]: r["chosen"]
        for r in generalization_report(
            people, _ladder(), k=3, max_suppress_frac=0.0
        ).collect()
    }
    assert rep == {0: 0, 1: 0, 2: 1}
    out = generalize(people, _ladder(), k=3, max_suppress_frac=0.0)
    assert out.count() == 19  # one '*' group, nothing suppressed


def test_l_diversity_release_condition(spark, people):
    """With sensitive/l, a big-enough group with too FEW distinct
    sensitive values still violates, and generalize() suppresses it."""
    import pyspark.sql.functions as SF

    # springfield's 12 members all share age 30 -> k=3 fine, l=2 fails
    rep = {
        r["level"]: r
        for r in generalization_report(
            people,
            _ladder(),
            k=3,
            max_suppress_frac=0.40,
            sensitive=SF.col("age"),
            l=2,
        ).collect()
    }
    assert rep[0]["min_l_diversity"] == 1
    assert rep[0]["rows_violating"] == 12 + 6 + 1  # all groups fail k or l
    # level 1 pools ages 30..33 into decade-3 'il' group (l=4 >= 2);
    # only 'lone' violates -> 1/19 within the 40% budget
    assert rep[1]["rows_violating"] == 1
    assert rep[1]["chosen"] == 1
    out = generalize(
        people,
        _ladder(),
        k=3,
        max_suppress_frac=0.40,
        sensitive=SF.col("age"),
        l=2,
        qi_names=["geo", "band"],
        drop_cols=["city", "state", "age"],
    )
    assert set(out.columns) == {"geo", "band", "pid"}
    assert out.count() == 18  # lone suppressed, nothing else


def test_validation_and_empty_input(spark, people):
    with pytest.raises(ValueError, match="non-empty"):
        generalization_report(people, [], k=3)
    with pytest.raises(ValueError, match="same non-zero"):
        generalization_report(
            people, [[F.col("city")], [F.col("city"), F.col("age")]], k=3
        )
    with pytest.raises(ValueError, match="collide"):
        generalize(people, _ladder(), k=3, qi_names=["pid", "x"])
    # r9 ADVICE: a df carrying one of generalize()'s internal working
    # columns must fail with a clear ValueError up front, not an opaque
    # ambiguity error deep in the plan
    tainted = people.withColumn("_ga_n", F.lit(1))
    with pytest.raises(ValueError, match="reserved"):
        generalize(tainted, _ladder(), k=3)
    # ...unless the caller drops it from the release
    assert (
        generalize(tainted, _ladder(), k=3, drop_cols=["_ga_n"]).count() > 0
    )
    with pytest.raises(ValueError, match="reserved"):
        generalize(people, _ladder(), k=3, qi_names=["_ga_s", "g1"])
    empty = people.filter(F.lit(False))
    assert generalization_report(empty, _ladder(), k=3).count() == 0
    assert generalize(empty, _ladder(), k=3).count() == 0
