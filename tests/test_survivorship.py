"""golden_record survivorship-rule semantics pinned on adversarial
inputs — ties on every rule's ordering, NULLs in values and versions,
all-null groups — which the catalog's part table never exercises."""

from __future__ import annotations

import pytest

from nyc_taxi_etl_spark.operators.survivorship import golden_record

from .conftest import spark  # noqa: F401  (fixture re-export)


def _one(df, entity):
    rows = {r["e"]: r for r in df.collect()}
    return rows[entity]


@pytest.fixture(scope="module")
def members(spark):
    # entity 1: version tie (v=2 twice), brand tie (two counts of 2),
    #           length tie on names; entity 2: null-heavy
    rows = [
        # e, key, name,    brand, ver
        (1, 10, "alpha", "bb", 1),
        (1, 11, "beta", "aa", 2),
        (1, 12, "gamma", "bb", 2),   # ver tie with key 11
        (1, 13, "delta", "aa", None),  # null version loses
        (2, 20, None, None, 5),
        (2, 21, "zz", None, None),
    ]
    return spark.createDataFrame(
        rows, "e: long, k: long, name: string, brand: string, ver: long"
    )


def test_min_key_and_extrema(spark, members):
    out = golden_record(
        members,
        "e",
        {"first_name": ("min_key", "name"), "max_ver": ("max", "ver")},
        key_col="k",
    )
    assert _one(out, 1)["first_name"] == "alpha"
    # entity 2: min key 20 has NULL name -> nulls-last elects 'zz'
    assert _one(out, 2)["first_name"] == "zz"
    assert _one(out, 2)["max_ver"] == 5


def test_most_recent_tie_breaks_to_larger_value(spark, members):
    out = golden_record(
        members, "e", {"nm": ("most_recent", "name", "ver")}, key_col="k"
    )
    # entity 1: ver=2 twice -> larger name string wins ('gamma' > 'beta')
    assert _one(out, 1)["nm"] == "gamma"
    # entity 2: the only versioned member has a NULL name; the value
    # nulls-last flag elects the non-null 'zz' despite its null version
    assert _one(out, 2)["nm"] == "zz"


def test_most_frequent_tie_breaks_to_smallest(spark, members):
    out = golden_record(members, "e", {"b": ("most_frequent", "brand")})
    # entity 1: 'aa' x2 vs 'bb' x2 -> smallest wins
    assert _one(out, 1)["b"] == "aa"
    # entity 2: all brands NULL -> left join leaves the field NULL
    assert _one(out, 2)["b"] is None


def test_longest_string_tie_breaks_to_smallest(spark, members):
    out = golden_record(members, "e", {"n": ("longest_string", "name")})
    # entity 1: 'alpha'/'gamma'/'delta' all length 5 -> smallest string
    assert _one(out, 1)["n"] == "alpha"
    assert _one(out, 2)["n"] == "zz"  # nulls never elected


def test_rule_validation(spark, members):
    with pytest.raises(ValueError, match="key_col"):
        golden_record(members, "e", {"x": ("min_key", "name")})
    with pytest.raises(ValueError, match="most_recent"):
        golden_record(members, "e", {"x": ("most_recent", "name")})
    with pytest.raises(ValueError, match="unknown rule"):
        golden_record(members, "e", {"x": ("mode", "name")})
