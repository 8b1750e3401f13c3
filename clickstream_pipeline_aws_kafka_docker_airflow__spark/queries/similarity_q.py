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
