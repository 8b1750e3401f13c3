"""Graph query: integer-exact PageRank over the props-key transition
graph, with a fully unrolled DuckDB oracle.

Nodes are the ``props.k`` values (0..99 in the driver data); an edge
u->v with weight n means "n times, some user's next event carried key v
after an event carrying key u". The fixed-point arithmetic
(operators/graph.py) makes every iteration's BIGINT scores
bit-identical across engines, so a genuinely ITERATIVE algorithm gets
a full value-hash oracle — the oracle simply unrolls the same
``n_iters`` update as chained CTEs.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..functions.scalars import props_int
from ..io import load_table
from ..operators.graph import PR_DAMP_PCT, PR_ITERS, PR_SCALE, pagerank_int
from ..registry import register

_K_SQL = 'TRY_CAST(regexp_extract(props, \'"k"\\s*:\\s*(-?\\d+)\', 1) AS BIGINT)'


def _pagerank_oracle(n_iters: int = PR_ITERS) -> str:
    base = (
        f"CAST(({PR_SCALE} * {100 - PR_DAMP_PCT}) "
        f"// (100 * (SELECT n_nodes FROM nn)) AS BIGINT)"
    )
    ctes = [
        f"""s AS (
    SELECT user_id, {_K_SQL} AS from_k,
           LEAD({_K_SQL}) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_k
    FROM events
), edges AS (
    SELECT from_k AS src, to_k AS dst, COUNT(*) AS n
    FROM s WHERE from_k IS NOT NULL AND to_k IS NOT NULL
    GROUP BY 1, 2
), outd AS (
    SELECT src, SUM(n) AS outn FROM edges GROUP BY src
), nodes AS (
    SELECT DISTINCT node
    FROM (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)
), nn AS (
    SELECT COUNT(*) AS n_nodes FROM nodes
), pr0 AS (
    SELECT node, CAST({PR_SCALE} // (SELECT n_nodes FROM nn) AS BIGINT) AS pr
    FROM nodes
)"""
    ]
    for i in range(1, n_iters + 1):
        ctes.append(
            f"""pr{i} AS (
    SELECT n.node,
           CAST({base}
                + ({PR_DAMP_PCT} * COALESCE(c.s, 0)) // 100 AS BIGINT) AS pr
    FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, SUM((p.pr * e.n) // o.outn) AS s
        FROM pr{i - 1} p
        JOIN edges e ON e.src = p.node
        JOIN outd o ON o.src = e.src
        GROUP BY e.dst
    ) c ON c.node = n.node
)"""
        )
    joined = ",\n".join(ctes)
    return f"WITH {joined}\nSELECT node, pr FROM pr{n_iters}"


@register("pagerank_props", oracle=_pagerank_oracle())
def pagerank_props(spark, sf_dir):
    """PageRank (3 fixed-point iterations, damping 0.85) over the
    props-key transition graph. The per-user LEAD window builds the
    edge list; each iteration is one score⋈edges join + aggregate.
    Scores are BIGINT fixed-point (1.0 == 10^12) — no float anywhere,
    so the iterative result hash-matches the unrolled SQL twin."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    k = props_int("props", "k")
    edges = (
        e.select(k.alias("src"), F.lead(k).over(w).alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return pagerank_int(edges)
