"""Strict Spark-vs-DuckDB result comparison, modeled on the driver's
gate: row count + column-name schema + order-insensitive value match
(columns sorted by name, rows sorted by all columns)."""

from __future__ import annotations

import math

import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out.columns = [str(c) for c in out.columns]
    out = out[sorted(out.columns)]
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.astype(float)
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("Int64")
        elif s.dtype == object:
            out[c] = s.map(lambda v: str(v) if v is not None else None)
    out = out.sort_values(by=list(out.columns), na_position="last").reset_index(
        drop=True
    )
    return out


def _cell_eq(a, b) -> bool:
    a_null = a is None or (isinstance(a, float) and math.isnan(a)) or a is pd.NA
    b_null = b is None or (isinstance(b, float) and math.isnan(b)) or b is pd.NA
    if a_null or b_null:
        return a_null and b_null
    if isinstance(a, float) or isinstance(b, float):
        # Near-exact: the driver hashes values, so we must be at least
        # as strict as bit-equality-after-rounding.
        return math.isclose(float(a), float(b), rel_tol=0, abs_tol=1e-12)
    return a == b


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    a, b = canon(spark_pdf), canon(duck_pdf)
    assert list(a.columns) == list(b.columns), (
        f"{name}: column mismatch spark={list(a.columns)} duck={list(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: row count spark={len(a)} duck={len(b)}"
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(av, bv)) if not _cell_eq(x, y)
        ]
        assert not bad, f"{name}: column {c} first diffs {bad[:5]}"
