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


_IVF_ORACLE = f"""
WITH e AS (
    SELECT vec_id, {_E} AS v,
           sqrt(list_dot_product({_E}, {_E})) AS nrm
    FROM embeddings
),
cent AS (SELECT vec_id AS centroid_id, v AS cvec FROM e WHERE vec_id < 16),
assign AS (
    SELECT e.vec_id, centroid_id,
           ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY list_dot_product(v, v) - 2 * list_dot_product(v, cvec)
                        + list_dot_product(cvec, cvec),
                        centroid_id) AS crank
    FROM e CROSS JOIN cent
),
corpus AS (
    SELECT e.vec_id, v, nrm, centroid_id
    FROM e JOIN assign a ON a.vec_id = e.vec_id AND a.crank = 1
),
probes AS (
    SELECT a.vec_id AS qid, a.centroid_id, e.v AS qv, e.nrm AS qn
    FROM assign a JOIN e ON e.vec_id = a.vec_id
    WHERE a.vec_id < {ANN_NQUERIES} AND a.crank <= 2
),
cands AS (
    SELECT p.qid, c.vec_id AS nid,
           ROUND(list_dot_product(qv, v) / (qn * nrm), 4) AS sim
    FROM corpus c JOIN probes p ON c.centroid_id = p.centroid_id
                              AND c.vec_id <> p.qid
)
SELECT qid, nid, sim, CAST(rn AS BIGINT) AS rn
FROM (SELECT qid, nid, sim,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
      FROM cands)
WHERE rn <= {ANN_K}
"""


@register("ann_topk_ivf", oracle=_IVF_ORACLE)
def ann_topk_ivf(spark, sf_dir):
    """ext_sim_topk IVF path: coarse quantizer (16 sampled centroids) +
    nprobe=2 cell search — the inverted-file alternative to sign-LSH;
    recall/cost tunes with nprobe instead of nbits."""
    from ..operators.similarity import ivf_topk

    return ivf_topk(
        load_table(spark, sf_dir, "embeddings"), ANN_NQUERIES, ANN_K
    )


@register("sim_topk_vectorized", oracle=_BRUTE_ORACLE)
def sim_topk_vectorized(spark, sf_dir):
    """ext_sim_topk via Arrow-batched numpy matmul. BLAS prunes to
    top-(k+margin); survivors are re-scored with the sequential-fold
    expression, so final sims match the exact baseline bit-for-bit
    (BLAS summation order never reaches the output)."""
    from ..operators.similarity import topk_matmul_arrow

    return topk_matmul_arrow(load_table(spark, sf_dir, "embeddings"), 10, 5)
