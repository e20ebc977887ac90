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

    Scale: per round, ONE shuffle — the contribution join/agg on the
    node key (edges are pre-joined with out-degrees once and
    persisted, so each round reuses the partitioned edge relation);
    the dangling mass is a 1-row aggregate broadcast back (the scalar
    cross-join pattern, never a driver round-trip of node state). A
    fixed iteration count (‖Δ‖ ≈ d^k) replaces convergence polling so
    the driver loop does no data reads at all. Skewed in-degree
    (celebrity nodes) degrades only the final agg — salting composes
    if needed (functions/skew.py)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    deg = e.groupBy("src").agg(F.count("*").cast("double").alias("outdeg"))
    # edges ⋈ out-degree once; every iteration reuses this relation
    ed = e.join(deg, "src").persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
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
    has_out = deg.select(F.col("src").alias("node"))
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    for _ in range(iterations):
        dangling = (
            ranks.join(has_out, "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        contrib = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inc"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inc"), F.lit(0.0))
                        + F.col("dm") / F.lit(float(n_nodes))
                    )
                ).alias("rank"),
            )
        )
        # each round's ranks feed BOTH the next dangling agg and the
        # next contribution join: an unpersisted subtree would
        # re-execute per reference (2^k plan blowup), and even a
        # persisted one accretes a plan deep enough to overflow plan
        # rendering. localCheckpoint truncates lineage every round —
        # constant plan depth, each round computed exactly once (the
        # connected-components posture, dedup.py).
        ranks = ranks.localCheckpoint(eager=True)
    return ranks
