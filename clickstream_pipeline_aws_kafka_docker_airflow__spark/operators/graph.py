"""Graph analytics over edge DataFrames: integer-exact PageRank.

Complements the min-label-propagation connected components
(operators/clustering.py) with the other classic iterative graph
kernel. Everything is fixed-point integer arithmetic — scores live in
``scale`` units and every division is an integer ``div`` — so a fixed
iteration count produces bit-identical BIGINT scores on any engine,
and the whole computation has an unrolled-CTE SQL oracle
(queries/graph_q.py). No floats means no summation-order risk under
the driver's value hash.

Scale shape: each iteration is one join of the score table against the
edge list plus one aggregate — both shuffle on node ids. Edge weights
and out-degrees are precomputed once. Dangling nodes (no out-edges)
simply contribute nothing, the standard simplification; the damping
base term keeps every node's score positive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PR_SCALE = 10**12  # score fixed-point: 1.0 == 10^12
PR_DAMP_PCT = 85  # damping factor as an integer percentage
PR_ITERS = 3


def pagerank_int(
    edges: DataFrame,
    n_iters: int = PR_ITERS,
    damp_pct: int = PR_DAMP_PCT,
    scale: int = PR_SCALE,
) -> DataFrame:
    """PageRank over a weighted edge list ``(src, dst, n)`` with
    integer fixed-point math. Per iteration, in ``scale`` units:

        contrib(u->v) = (pr[u] * n_uv) div out[u]
        pr'[v] = (scale * (100 - damp_pct)) div (100 * n_nodes)
                 + (damp_pct * sum(contrib)) div 100

    Returns ``(node, pr)`` with BIGINT scores. The node universe is
    every id appearing as src or dst; ``n_nodes`` rides along as a
    column (one tiny aggregate cross-joined in), so nothing collects
    to the driver."""
    outd = edges.groupBy("src").agg(F.sum("n").alias("out"))
    e = edges.join(outd, "src").select("src", "dst", "n", "out")
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    nn = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    base = F.expr(f"CAST(({scale} * {100 - damp_pct}) div (100 * n_nodes) AS BIGINT)")
    pr = (
        nodes.crossJoin(F.broadcast(nn))
        .select("node", F.expr(f"CAST({scale} div n_nodes AS BIGINT)").alias("pr"))
    )
    for _ in range(n_iters):
        contrib = (
            pr.join(e, pr["node"] == e["src"])
            .select(
                F.col("dst").alias("node"),
                F.expr("(pr * n) div out").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        pr = (
            nodes.crossJoin(F.broadcast(nn))
            .join(contrib, "node", "left")
            .select(
                "node",
                (base + F.expr(f"({damp_pct} * coalesce(s, 0L)) div 100"))
                .cast("bigint")
                .alias("pr"),
            )
        )
    return pr
