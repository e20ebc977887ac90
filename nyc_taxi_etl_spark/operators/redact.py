"""PII-style redaction for training-data curation.

Scrubs the high-frequency machine-recognizable identifier classes
(emails, URLs, IPv4 addresses, card-number-shaped and SSN-shaped digit
runs, phone-shaped digit runs) by rewriting them to stable placeholder
tokens, and counts matches per class for audit dashboards.

All patterns are chosen to mean the same thing in Java regex (Spark)
and RE2 (DuckDB/Go): no lookarounds, no backreferences — so the
redaction is oracle-checkable cross-engine and portable to other
executors. Everything is a chain of ``regexp_replace`` /
``regexp_count`` Catalyst expressions: row-local, zero shuffles,
whole-stage-codegen'd — the 100 TB cost is one codegen'd pass per rule
over the scan, no Python in the path.

Replacement ORDER is semantic, not cosmetic: emails before URLs (a URL
rule would eat ``user@host`` paths), IPv4 and card/SSN before phone
(their digit runs would otherwise partially match the looser phone
shape). Placeholders contain no digits or ``@``, so later rules can
never re-match earlier replacements.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "PII_RULES",
    "redact_pii",
    "pii_counts",
    "redact_documents",
    "k_anonymity_audit",
]

# (class, pattern, placeholder) — applied in order.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("card", r"\b\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}\b", "<CARD>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (
        "phone",
        # No leading \b on the whole pattern: '(' and '+' are non-word
        # chars, so a boundary there never exists. The bare-digit branch
        # carries its own \b instead.
        r"(?:\+\d{1,2}[ .-]?)?(?:\(\d{3}\)|\b\d{3})[ .-]\d{3}[ .-]\d{4}\b",
        "<PHONE>",
    ),
)


def redact_pii(text: Column) -> Column:
    """Text with every :data:`PII_RULES` match replaced, in rule order."""
    out = text
    for _, pattern, placeholder in PII_RULES:
        out = F.regexp_replace(out, pattern, placeholder)
    return out


def pii_counts(text: Column) -> list[Column]:
    """One ``<class>_count`` BIGINT column per rule, measured on the
    ORIGINAL text (audit semantics: what was present, not what remains
    after earlier rules rewrote their matches)."""
    return [
        F.regexp_count(text, F.lit(pattern)).cast("long").alias(f"{name}_count")
        for name, pattern, _ in PII_RULES
    ]


def redact_documents(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document redacted text + per-class audit counts.

    Returns ``(id_col, redacted_text, <class>_count...)``.
    """
    text = F.col(text_col)
    return df.select(
        F.col(id_col),
        redact_pii(text).alias("redacted_text"),
        *pii_counts(text),
    )


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 10,
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination (Sweeney
    2002): group sizes per quasi-identifier tuple, flagged when a
    group is smaller than ``k`` — those rows are re-identifiable by
    joining the quasi-identifiers against an external dataset, the
    release-gate check that sits beside PII redaction in a
    training-data pipeline.

    One hash aggregation on the quasi-identifier key (map-side
    partials; group count is bounded by the quasi-identifier domain,
    not the row count). Returns one row per group:
    ``(*quasi_cols, group_size, at_risk)``.
    """
    return (
        df.groupBy(*[F.col(c) for c in quasi_cols])
        .agg(F.count(F.lit(1)).alias("group_size"))
        .select(
            *quasi_cols,
            "group_size",
            (F.col("group_size") < F.lit(k)).alias("at_risk"),
        )
    )
