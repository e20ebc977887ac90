"""Property-based tests (hypothesis) for the schema normalizer — the
SURVEY §5 'schema-drift property tests': candidate resolution must
survive case mangling, decorating prefixes/suffixes, column shuffling,
and arbitrary column subsets, degrading to None (typed nulls) rather
than erroring."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from nyc_taxi_etl_spark.operators.normalize import detect_columns, resolve_column
from nyc_taxi_etl_spark.sources.taxi import CANDIDATES

ALL_CANDS = sorted({c for v in CANDIDATES.values() for c in v})


def _mangle_case(name: str, pattern: int) -> str:
    out = []
    for i, ch in enumerate(name):
        out.append(ch.upper() if (pattern >> (i % 30)) & 1 else ch.lower())
    return "".join(out)


@given(
    cand=st.sampled_from(ALL_CANDS),
    pattern=st.integers(min_value=0, max_value=2**30 - 1),
    extra=st.lists(
        st.text(alphabet=string.ascii_lowercase + "_", min_size=1, max_size=12),
        max_size=5,
    ),
)
@settings(max_examples=200, deadline=None)
def test_case_mangled_candidate_still_resolves(cand, pattern, extra):
    """Any case variant of a known candidate resolves to that column,
    regardless of unrelated decoy columns (unless a decoy equals the
    candidate exactly, which dict ordering may prefer — exclude)."""
    mangled = _mangle_case(cand, pattern)
    decoys = [e for e in extra if e.lower() not in {c.lower() for c in ALL_CANDS}]
    cols = decoys + [mangled]
    hit = resolve_column(cols, (cand,))
    assert hit == mangled


@given(
    prefix=st.text(alphabet=string.ascii_lowercase, min_size=0, max_size=6),
    suffix=st.text(alphabet=string.ascii_lowercase, min_size=0, max_size=6),
    cand=st.sampled_from(ALL_CANDS),
)
@settings(max_examples=100, deadline=None)
def test_decorated_candidate_resolves_via_substring(prefix, suffix, cand):
    col = f"{prefix}_{cand}_{suffix}" if prefix or suffix else cand
    assert resolve_column([col], (cand,)) == col


@given(
    cols=st.lists(
        st.text(alphabet=string.ascii_lowercase + "_", min_size=1, max_size=20),
        max_size=12,
    )
)
@settings(max_examples=200, deadline=None)
def test_detection_is_total_on_arbitrary_schemas(cols):
    """detect_columns never raises and only returns real columns."""
    det = detect_columns(cols)
    assert set(det) == set(CANDIDATES)
    for v in det.values():
        assert v is None or v in cols


@given(data=st.data())
@settings(max_examples=100, deadline=None)
def test_subset_of_yellow_schema_resolves_consistently(data):
    """Dropping columns never makes detection pick a wrong column: on
    any subset of the yellow schema, each detected value is either None
    or the same column the full schema resolves (when that column
    survived)."""
    full = [
        "VendorID", "tpep_pickup_datetime", "tpep_dropoff_datetime",
        "passenger_count", "trip_distance", "RatecodeID",
        "store_and_fwd_flag", "PULocationID", "DOLocationID",
        "payment_type", "fare_amount", "extra", "mta_tax", "tip_amount",
        "tolls_amount", "improvement_surcharge", "total_amount",
    ]
    keep = data.draw(st.lists(st.sampled_from(full), unique=True, max_size=17))
    det_full = detect_columns(full)
    det_sub = detect_columns(keep)
    for key, sub_val in det_sub.items():
        full_val = det_full[key]
        if full_val in keep:
            assert sub_val == full_val


def test_unify_empty_input_raises():
    import pytest

    from nyc_taxi_etl_spark.operators.normalize import unify

    with pytest.raises(ValueError, match="at least one"):
        unify({})
