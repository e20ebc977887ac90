"""Distributed graph analytics on DataFrames: PageRank.

North-star extension beside ``dedup.connected_components`` — the
other staple graph primitive a corpus/entity pipeline needs (rank
hosts by link mass, weight documents by citation, order dedup-cluster
keepers by centrality). The reference has no graph surface at all.

Same design posture as connected components: edges and ranks stay
DataFrames end-to-end (no driver-side adjacency), every round is an
equi-join + hash-agg on the node key, and the fixed iteration count
makes the result DETERMINISTIC — which is what lets the catalog
entry carry a full DuckDB oracle (the same power iteration unrolled
as chained CTEs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    iterations: int = 6,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list; returns
    ``(node, rank)`` for every node appearing as source or target.

    Semantics (the classic formulation): uniform init 1/N; each round
    every node keeps ``(1-d)/N`` plus ``d ×`` (rank mass arriving on
    in-edges, where a node with out-degree g ships rank/g along each
    out-edge, plus the dangling-node mass redistributed uniformly).
    Ranks sum to 1 every round — dangling redistribution is what
    preserves that invariant.

    Scale: per round, ONE exchange — the contribution hash-agg on the
    destination key. Everything else is exchange-free by
    CO-PARTITIONING: the edge⋈degree relation and the node list are
    hash-repartitioned ONCE on their join keys (src / node, same
    partition count) and persisted, and each round's rank relation
    comes out of a join whose streamed side is the co-partitioned node
    list — ``localCheckpoint`` preserves that physical partitioning,
    so the next round's edge join lines up again without moving the
    edges. The dangling-node term needs no anti-join at all: ranks sum
    to 1 every round, so the undistributed mass is ``1 − Σ new_raw``
    (new_raw = base + d·inc), recovered as an OBSERVED metric on the
    checkpoint job itself (``df.observe`` / CollectMetrics — zero
    extra jobs, one scalar per round to the driver, never node
    state). A fixed iteration count (‖Δ‖ ≈ d^k) replaces convergence
    polling so the driver loop does no data reads. Skewed in-degree
    (celebrity nodes) degrades only the final agg — salting composes
    if needed (functions/skew.py)."""
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    deg = e.groupBy("src").agg(F.count("*").cast("double").alias("outdeg"))
    # edges ⋈ out-degree once, laid out on the per-round join key AND
    # sorted within partitions on it: every iteration's sort-merge join
    # then reuses both the partitioning and the ordering from the cache
    # — no exchange and no re-sort of the (large) edge side per round
    ed = (
        e.join(deg, "src")
        .repartition(n_part, "src")
        .sortWithinPartitions("src")
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .repartition(n_part, "node")
        .sortWithinPartitions("node")
        .persist()
    )
    n_nodes = nodes.count()  # also materializes the persisted relations
    if n_nodes == 0:
        # empty graph: typed empty result (SURVEY §7.3 posture), and
        # guards the 1/N terms below
        return nodes.select(
            "node", F.lit(0.0).alias("rank")
        ).limit(0)
    base = (1.0 - damping) / n_nodes
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    for it in range(iterations):
        contrib = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inc"))
        )
        raw = nodes.join(
            contrib, nodes["node"] == contrib["dst"], "left"
        ).select(
            "node",
            (
                F.lit(base)
                + F.lit(damping) * F.coalesce(F.col("inc"), F.lit(0.0))
            ).alias("rank"),
        )
        # raw feeds BOTH the deficit sum and the final per-node add:
        # localCheckpoint materializes it once, truncates lineage
        # (constant plan depth across rounds — the connected-components
        # posture, dedup.py) and PRESERVES the hash(node) partitioning
        # the next round's edge join needs. The Σ rank needed for the
        # dangling deficit rides the SAME checkpoint job via
        # df.observe (CollectMetrics fires on materialization) — zero
        # extra jobs, one scalar to the driver per round.
        from pyspark.sql import Observation

        obs = Observation(f"pr_mass_{it}")
        raw = raw.observe(obs, F.sum("rank").alias("mass")).localCheckpoint(
            eager=True
        )
        # Σ ranks = 1 invariant ⇒ the dangling mass d·dm is exactly the
        # deficit 1 − Σ raw; redistribute it uniformly
        deficit = 1.0 - obs.get["mass"]
        ranks = raw.select(
            "node",
            (F.col("rank") + F.lit(deficit / float(n_nodes))).alias("rank"),
        )
    return ranks
