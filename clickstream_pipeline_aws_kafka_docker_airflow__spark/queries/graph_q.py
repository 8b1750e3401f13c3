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


_PROPS_EDGES_CTES = f"""s AS (
    -- NULL-ts events have no position in the stream, so they anchor
    -- no transition edge (dropped on both engines)
    SELECT user_id, {_K_SQL} AS from_k,
           LEAD({_K_SQL}) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_k
    FROM events WHERE ts IS NOT NULL
), edges AS (
    SELECT from_k AS src, to_k AS dst, COUNT(*) AS n
    FROM s WHERE from_k IS NOT NULL AND to_k IS NOT NULL
    GROUP BY 1, 2
)"""


def _pagerank_oracle(edges_ctes: str = None, n_iters: int = PR_ITERS,
                     final_select: str = "SELECT node, pr FROM pr{last}") -> str:
    """Unrolled-CTE oracle for :func:`pagerank_int` over ANY edge list:
    ``edges_ctes`` must end in ``edges(src, dst, n)``; the iteration
    chain is shared by every graph query (props transitions, TextRank
    keywords)."""
    if edges_ctes is None:
        edges_ctes = _PROPS_EDGES_CTES
    base = (
        f"CAST(({PR_SCALE} * {100 - PR_DAMP_PCT}) "
        f"// (100 * (SELECT n_nodes FROM nn)) AS BIGINT)"
    )
    ctes = [
        f"""{edges_ctes}, outd AS (
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
    return f"WITH {joined}\n" + final_select.format(last=n_iters)


@register("pagerank_props", oracle=_pagerank_oracle())
def pagerank_props(spark, sf_dir):
    """PageRank (3 fixed-point iterations, damping 0.85) over the
    props-key transition graph. The per-user LEAD window builds the
    edge list; each iteration is one score⋈edges join + aggregate.
    Scores are BIGINT fixed-point (1.0 == 10^12) — no float anywhere,
    so the iterative result hash-matches the unrolled SQL twin.
    Like every iterative corpus product, the scores are a build-once
    snapshot artifact: recomputed when the events snapshot changes,
    served from parquet between rebuilds."""
    import os

    from ..operators.artifacts import materialized
    from ..operators.graph import PR_ITERS

    def _build():
        e = load_table(spark, sf_dir, "events").where(
            F.col("ts").isNotNull()
        )
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        k = props_int("props", "k")
        edges = (
            e.select(k.alias("src"), F.lead(k).over(w).alias("dst"))
            .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        return pagerank_int(edges)

    return materialized(
        spark,
        os.path.join(sf_dir, "events.parquet"),
        "pagerank_props",
        _build,
        # nts1: NULL-ts events excluded from the edge walk (build change)
        params=f"i{PR_ITERS}nts1",
    )


# --------------------------------------------------------------------------
# TextRank keywords: the same kernel over the token co-occurrence graph

TEXTRANK_TOP = 20

_TOKEN_EDGES_CTES = r"""toks AS (
    SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
    FROM documents
), adj AS (
    SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                  i -> [t[i], t[i + 1]])) AS pair
    FROM toks WHERE len(t) >= 2
), edges AS (
    -- co-occurrence is symmetric: emit both directions
    SELECT pair[1] AS src, pair[2] AS dst, COUNT(*) AS n
    FROM adj WHERE pair[1] <> '' AND pair[2] <> '' GROUP BY 1, 2
    UNION ALL
    SELECT pair[2], pair[1], COUNT(*) FROM adj
    WHERE pair[1] <> '' AND pair[2] <> '' GROUP BY 1, 2
)"""


@register(
    "keyword_textrank",
    oracle=_pagerank_oracle(
        edges_ctes=_TOKEN_EDGES_CTES,
        final_select=f"""SELECT node AS token, pr,
       CAST(ROW_NUMBER() OVER (ORDER BY pr DESC, node) AS BIGINT) AS rank
FROM pr{{last}}
QUALIFY rank <= {TEXTRANK_TOP}""",
    ),
)
def keyword_textrank(spark, sf_dir):
    """TextRank keyword extraction (Mihalcea & Tarau 2004): the SAME
    integer-exact PageRank kernel (operators/graph.py) over the
    corpus's adjacent-token co-occurrence graph (symmetric edges), top
    tokens by score. A frequency-blind complement to top_tokens: a
    token scores high when its NEIGHBORS are central, not merely when
    it is common.

    Scale shape: top-k is TakeOrdered (orderBy+limit — per-partition
    heaps, no single-partition sort of the vocabulary; the rank window
    then runs over k rows only), and the whole extraction is a
    build-once snapshot artifact — TextRank keywords are a corpus
    PRODUCT, recomputed when the corpus changes, not per query."""
    import os

    from ..operators.artifacts import materialized
    from ..operators.graph import PR_ITERS, pagerank_int

    def _build():
        d = load_table(spark, sf_dir, "documents")
        t = F.split(F.trim(F.lower("text")), r"\s+")
        pairs = d.select(t.alias("t")).where(F.size("t") >= 2).select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1), i -> array(t[i-1], t[i]))"
                )
            ).alias("pair")
        ).where((F.col("pair")[0] != "") & (F.col("pair")[1] != ""))
        one_dir = pairs.groupBy(
            F.col("pair")[0].alias("src"), F.col("pair")[1].alias("dst")
        ).agg(F.count(F.lit(1)).alias("n"))
        other = pairs.groupBy(
            F.col("pair")[1].alias("src"), F.col("pair")[0].alias("dst")
        ).agg(F.count(F.lit(1)).alias("n"))
        edges = one_dir.unionByName(other)
        top = (
            pagerank_int(edges)
            .orderBy(F.desc("pr"), F.asc("node"))
            .limit(TEXTRANK_TOP)
        )
        from pyspark.sql import Window

        w = Window.orderBy(F.desc("pr"), F.asc("node"))
        return top.withColumn(
            "rank", F.row_number().over(w).cast("bigint")
        ).select(F.col("node").alias("token"), "pr", "rank")

    return materialized(
        spark,
        os.path.join(sf_dir, "documents.parquet"),
        "textrank_keywords",
        _build,
        params=f"i{PR_ITERS}top{TEXTRANK_TOP}",
    )
