"""UDTF extension surface (SURVEY §2.11: the engine exposes
``pandas_udf`` / ``applyInPandas`` / UDTF as its extension points; the
first two are exercised by ml.py and multimodal.py — this module is
the table-function point).

A Python UDTF is the escape hatch for table-generating logic that
Catalyst cannot express — each class below ships WITH the equivalent
built-in plan, and the tests assert parity, so the message stays
honest: use the Catalyst path in production (codegen, no Python
boundary); reach for the UDTF only when no built-in composition
exists.

Registration: ``register_udtfs(spark)`` makes them callable from SQL
(``SELECT s.* FROM docs, LATERAL shingle_rows(text, 3) s``).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

__all__ = ["ShingleRows", "register_udtfs"]


@udtf(returnType="shingle: string, pos: int")
class ShingleRows:
    """Word k-shingles of one text value, one row per DISTINCT shingle
    with its first position — the UDTF twin of
    ``operators/text.py::shingles`` + ``explode`` (which is the
    production path: one regex pass, whole-stage codegen, no Python).

    Python-side mirror of the Catalyst semantics: lowercase,
    whitespace-collapse, k-token windows, n<k fallback to the whole
    token list as one shingle.
    """

    def eval(self, text: str, k: int = 3):  # noqa: D102 - UDTF contract
        if text is None:
            return
        toks = text.strip().lower().split()
        if not toks:
            return
        if len(toks) < k:
            yield (" ".join(toks), 0)
            return
        seen = set()
        for i in range(len(toks) - k + 1):
            s = " ".join(toks[i : i + k])
            if s not in seen:
                seen.add(s)
                yield (s, i)


def register_udtfs(spark) -> None:
    """Register every UDTF under its SQL name."""
    spark.udtf.register("shingle_rows", ShingleRows)
