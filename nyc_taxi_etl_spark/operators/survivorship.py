"""Declared golden-record survivorship rules for entity resolution.

Merge/purge (Hernández & Stolfo, SIGMOD '95) names the resolution
pipeline; the MDM survivorship literature names the standard rule menu
for choosing each golden-record field from an entity's member rows:

* ``min_key``        — the deterministic representative: the value
                       carried by the member with the smallest key
                       (the connected-components convention);
* ``most_recent``    — the value with the highest version/timestamp
                       (recency wins — CDC-style master data);
* ``most_frequent``  — the modal value (consensus wins — directory
                       data aggregated from many feeds);
* ``longest_string`` — the most complete text (completeness wins —
                       address/name enrichment);
* ``min`` / ``max``  — numeric spans (price corridors, date ranges).

Every rule is DETERMINISTIC under ties (documented per rule below), so
a SQL oracle replays the whole golden record value-for-value — the
same cross-engine discipline as the rest of the catalog.

Scale: the single-agg rules compile into ONE hash aggregation over the
labeled member table. ``most_frequent`` needs value counts, so each
such rule adds one (entity, value)-grain pre-aggregation joined back
on the entity key — same partitioning as the main agg, no broadcast of
data-sized frames, no windows over the full relation.

Reference basis: public merge/purge + MDM survivorship practice; the
reference repo (AdityaShah123/nyc-taxi-etl) has no linkage machinery —
this is a beyond-reference extension family (SURVEY.md §2 bonus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["golden_record", "SURVIVORSHIP_KINDS"]

SURVIVORSHIP_KINDS = (
    "min_key",
    "most_recent",
    "most_frequent",
    "longest_string",
    "min",
    "max",
)


def _nulls_last_min_by(col: str, ordering):
    """min_by that never elects a NULL value while non-nulls exist:
    the leading isNull flag sorts every null-valued member after every
    non-null one."""
    return F.min_by(
        F.col(col),
        F.struct(F.col(col).isNull().cast("int").alias("_n"), *ordering),
    )


def golden_record(
    df: DataFrame,
    entity_col: str,
    rules: dict[str, tuple],
    key_col: str | None = None,
) -> DataFrame:
    """One golden-record row per ``entity_col`` value of ``df``.

    ``rules`` maps each OUTPUT column name to a rule tuple:

    * ``("min_key", col)``          — value at the smallest ``key_col``
      (requires ``key_col``; unique key ⇒ no ties);
    * ``("most_recent", col, by)``  — value at the largest ``by``
      (version/timestamp); ties on ``by`` break toward the LARGER
      value of ``col`` itself; members with NULL ``by`` lose to any
      versioned member;
    * ``("most_frequent", col)``    — modal non-null value; count ties
      break toward the SMALLEST value;
    * ``("longest_string", col)``   — longest non-null string; length
      ties break toward the SMALLEST string;
    * ``("min", col)`` / ``("max", col)`` — plain extrema.

    Each output is NULL only when every member's value is NULL.
    """
    aggs = []
    mf_frames = []
    for out, rule in rules.items():
        kind, col = rule[0], rule[1]
        if kind == "min_key":
            if key_col is None:
                raise ValueError(
                    "golden_record: min_key rules need key_col"
                )
            aggs.append(
                _nulls_last_min_by(col, [F.col(key_col)]).alias(out)
            )
        elif kind == "most_recent":
            if len(rule) != 3:
                raise ValueError(
                    "golden_record: most_recent needs (kind, col, by)"
                )
            by = rule[2]
            # max_by: null version sorts FIRST via the isNotNull flag,
            # so any versioned member beats every unversioned one
            aggs.append(
                F.max_by(
                    F.col(col),
                    F.struct(
                        F.col(col).isNotNull().cast("int").alias("_n"),
                        F.col(by).isNotNull().cast("int").alias("_v"),
                        F.col(by).alias("_b"),
                        F.col(col).alias("_c"),
                    ),
                ).alias(out)
            )
        elif kind == "longest_string":
            aggs.append(
                _nulls_last_min_by(
                    col,
                    [
                        (-F.coalesce(F.length(F.col(col)), F.lit(0))).alias(
                            "_l"
                        ),
                        F.col(col).alias("_c"),
                    ],
                ).alias(out)
            )
        elif kind == "min":
            aggs.append(F.min(col).alias(out))
        elif kind == "max":
            aggs.append(F.max(col).alias(out))
        elif kind == "most_frequent":
            mf_frames.append((out, col))
        else:
            raise ValueError(
                f"golden_record: unknown rule kind {kind!r} "
                f"(choose from {SURVIVORSHIP_KINDS})"
            )
    base = (
        df.groupBy(entity_col).agg(*aggs)
        if aggs
        else df.select(entity_col).distinct()
    )
    for out, col in mf_frames:
        counts = (
            df.filter(F.col(col).isNotNull())
            .groupBy(entity_col, col)
            .agg(F.count(F.lit(1)).alias("_sv_cnt"))
        )
        winner = counts.groupBy(entity_col).agg(
            F.min_by(
                F.col(col),
                F.struct(
                    (-F.col("_sv_cnt")).alias("_nc"), F.col(col).alias("_c")
                ),
            ).alias(out)
        )
        # same key as the main agg: co-partitioned equi-join, and LEFT
        # so an all-null column still yields a (null) golden field
        base = base.join(winner, entity_col, "left")
    return base
