"""Graph catalog query: PageRank over the customer→supplier purchase
graph, oracle-checked by unrolling the same power iteration as
chained DuckDB CTEs.

The graph: a directed edge c→s whenever customer c has an order with
a line item supplied by s (orders ⋈ lineitem, distinct pairs).
Suppliers are pure sinks (dangling nodes), so the entry also
exercises the dangling-mass redistribution path.

Oracle portability: a FIXED iteration count makes power iteration a
deterministic composition of joins/aggs both engines express exactly;
per-iteration float divergence is summation-order ulp (~1e-16
relative), far under the final r4 rounding. No top-k cut — selection
by a float rank could flip membership across engines at ulp scale, so
the entry returns every node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import r4
from ..operators.graph import pagerank
from .queries import query, t

_ITERATIONS = 6
_DAMPING = 0.85


def _pagerank_sql(iterations: int = _ITERATIONS, d: float = _DAMPING) -> str:
    # AS MATERIALIZED throughout is load-bearing: every r{i} references
    # r{i-1} twice (dangling agg + contribution join) and edges/deg/nn
    # repeat per iteration — DuckDB inlines un-materialized CTEs, which
    # is 2^iterations expansion (at sf0.1 the inlined plan spilled the
    # temp directory to disk-full before producing a row).
    ctes = [
        """edges AS MATERIALIZED (
          SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                          's' || CAST(l_suppkey AS VARCHAR) AS dst
          FROM orders JOIN lineitem ON l_orderkey = o_orderkey)""",
        "nodes AS MATERIALIZED (SELECT src AS node FROM edges"
        " UNION SELECT dst FROM edges)",
        "nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        """deg AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) AS outdeg
                   FROM edges GROUP BY 1)""",
        "r0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT n FROM nn) AS r"
        " FROM nodes)",
    ]
    for i in range(1, iterations + 1):
        p = i - 1
        ctes.append(
            f"""dang{i} AS MATERIALIZED (
              SELECT COALESCE(sum(r), 0) AS dm
              FROM r{p} LEFT JOIN deg ON deg.src = r{p}.node
              WHERE deg.src IS NULL)"""
        )
        ctes.append(
            f"""r{i} AS MATERIALIZED (
              SELECT nodes.node,
                     (1 - {d}) / (SELECT n FROM nn)
                     + {d} * (COALESCE(inc.s, 0)
                              + (SELECT dm FROM dang{i}) / (SELECT n FROM nn))
                       AS r
              FROM nodes LEFT JOIN (
                SELECT e.dst AS node, sum(p.r / deg.outdeg) AS s
                FROM edges e
                JOIN r{p} p ON p.node = e.src
                JOIN deg ON deg.src = e.src
                GROUP BY 1) inc ON inc.node = nodes.node)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, ROUND(r, 4) AS rank FROM r{iterations}"
    )


@query("purchase_graph_pagerank", _pagerank_sql(), extra=True)
def purchase_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (6 fixed iterations, d=0.85) on the customer→supplier
    purchase graph — ranks suppliers by how much customer "attention
    mass" flows into them, the centrality companion to
    ``dedup_components``' connectivity.

    Scale: see ``operators/graph.py::pagerank`` — one node-key
    shuffle per iteration over a persisted edge⋈degree relation, a
    1-row broadcast for dangling mass, zero driver-side graph state.
    The edge list itself is |distinct (cust,supp)| ≤ lineitem and
    shrinks through the DISTINCT's partial agg."""
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # node ids stay LONG through the iterations (customer k → 2k,
    # supplier k → 2k+1 — bijective) and decode to the display labels
    # only at the end: every per-round exchange/sort moves 8-byte
    # fixed-width longs instead of variable-length strings (neutral at
    # sf0.1 where scheduling dominates the rounds; the win is shuffle
    # payload and comparator cost at cluster scale). Safe for the
    # oracle: ranks are rounded to 4 places, which already absorbs
    # add-order ulp differences between any two executions.
    edges = (
        orders.join(
            lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
        )
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
    )
    ranks = pagerank(edges, iterations=_ITERATIONS, damping=_DAMPING)
    label = F.when(
        F.col("node") % 2 == 0,
        F.concat(F.lit("c"), (F.col("node") / 2).cast("long").cast("string")),
    ).otherwise(
        F.concat(
            F.lit("s"), ((F.col("node") - 1) / 2).cast("long").cast("string")
        )
    )
    return ranks.select(label.alias("node"), r4(F.col("rank")).alias("rank"))
