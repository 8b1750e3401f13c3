"""ANN query with generated-literal oracle: sign-LSH bucketed top-k."""

from __future__ import annotations

from ..io import load_table
from ..operators.similarity import ANN_BITS, ann_topk_bucketed, bucket_sql
from ..registry import register

ANN_K = 5
ANN_NQUERIES = 20

_E = "CAST(embedding AS DOUBLE[])"


def _ann_oracle() -> str:
    return f"""
WITH e AS (
    SELECT vec_id, {_E} AS v,
           sqrt(list_dot_product({_E}, {_E})) AS nrm,
           ({bucket_sql(_E, ANN_BITS)}) AS bucket
    FROM embeddings
),
q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn, bucket FROM e
      WHERE vec_id < {ANN_NQUERIES}),
p AS (
    SELECT qid, e.vec_id AS nid,
           ROUND(list_dot_product(qv, v) / (qn * nrm), 4) AS sim
    FROM q JOIN e USING (bucket)
    WHERE e.vec_id <> qid
)
SELECT qid, nid, sim, CAST(rn AS BIGINT) AS rn
FROM (SELECT qid, nid, sim,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
      FROM p)
WHERE rn <= {ANN_K}
"""


@register("ann_topk_lsh", oracle=_ann_oracle())
def ann_topk_lsh(spark, sf_dir):
    """ext_sim_topk scale path: random-hyperplane LSH buckets, exact
    cosine only within the query's bucket."""
    return ann_topk_bucketed(
        load_table(spark, sf_dir, "embeddings"), ANN_NQUERIES, ANN_K
    )


# identical semantics to sim_topk_bruteforce (vectors_q.py) -> same oracle
_BRUTE_ORACLE = f"""
WITH e AS (
    SELECT vec_id, {_E} AS v,
           sqrt(list_dot_product({_E}, {_E})) AS nrm
    FROM embeddings
),
q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM e WHERE vec_id < 10),
p AS (
    SELECT qid, e.vec_id AS nid,
           ROUND(list_dot_product(qv, v) / (qn * nrm), 4) AS sim
    FROM q JOIN e ON e.vec_id <> qid
)
SELECT qid, nid, sim, CAST(rn AS BIGINT) AS rn
FROM (SELECT qid, nid, sim,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
      FROM p)
WHERE rn <= 5
"""


@register("sim_topk_vectorized", oracle=_BRUTE_ORACLE)
def sim_topk_vectorized(spark, sf_dir):
    """ext_sim_topk via Arrow-batched numpy matmul — numerically
    equivalent to the Column-expression baseline at 4 dp, an order of
    magnitude faster when dim x corpus grows (BLAS beats interpreted
    higher-order functions)."""
    from ..operators.similarity import topk_matmul_arrow

    return topk_matmul_arrow(load_table(spark, sf_dir, "embeddings"), 10, 5)
