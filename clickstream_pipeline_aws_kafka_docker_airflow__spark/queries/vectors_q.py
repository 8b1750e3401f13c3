"""Embedding-vector queries (LLM-data-pipeline ops): norm statistics,
brute-force top-k cosine similarity, cosine near-duplicate pairs.

Parity strategy: both engines compute dot products in DOUBLE with
index-order accumulation (Spark ``aggregate`` fold vs DuckDB
``list_dot_product`` over ``DOUBLE[]``); similarity values are rounded
to 4 dp **before** they are used as ordering keys, with the neighbor id
as tiebreak, so rank assignment is identical even if the two engines
differ in the last ulp.

Scale notes: brute-force top-k is quadratic — correct baseline at test
scale; the LSH-bucketed variant (operators/similarity.py) is the 100 TB
path. Norms are computed once per row before the pairwise join, never
per pair.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from ..functions.scalars import (
    dec_avg_trunc4,
    dec_avg_trunc4_sql,
    dec_avg_trunc_sql,
)
from ..functions.vectors import dot, norm, ns_dot_sql, ns_selfdot_sql
from ..io import load_table
from ..registry import register

TOPK_K = 5
TOPK_NQUERIES = 10  # vec_id < 10 are the query vectors
NEARDUP_THRESHOLD = 0.35  # driver embeddings are unclustered; 0.35 ~ p99.9

_E_DOUBLE = "CAST(embedding AS DOUBLE[])"
# NULL-safe self-dot (r11 nullish-vector fuzz): Spark's fold returns
# NULL for vectors containing NULL elements where DuckDB's
# list_dot_product ERRORS — the oracles mirror the engine's NULL
# propagation explicitly (functions/vectors.py::ns_selfdot_sql)
_NS_SELFDOT = ns_selfdot_sql(_E_DOUBLE)


@register(
    "embed_norms_by_label",
    oracle=f"""
SELECT label,
       COUNT(*) AS n_vecs,
       {dec_avg_trunc4_sql("nrm", "duckdb")} AS avg_norm,
       ROUND(MIN(nrm), 4) AS min_norm,
       ROUND(MAX(nrm), 4) AS max_norm
FROM (SELECT label, sqrt({_NS_SELFDOT}) AS nrm
      FROM embeddings)
GROUP BY label
""",
)
def embed_norms_by_label(spark, sf_dir):
    """L2-norm statistics per label — the embedding-hygiene check every
    training pipeline runs before similarity work."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select("label", norm("embedding").alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            dec_avg_trunc4("nrm").alias("avg_norm"),
            F.round(F.min("nrm"), 4).alias("min_norm"),
            F.round(F.max("nrm"), 4).alias("max_norm"),
        )
    )


@register(
    "sim_topk_bruteforce",
    oracle=f"""
WITH e AS (
    SELECT vec_id, {_E_DOUBLE} AS v,
           sqrt({_NS_SELFDOT}) AS nrm
    FROM embeddings
    WHERE {_NS_SELFDOT} > 0
),
q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM e WHERE vec_id < {TOPK_NQUERIES}),
p AS (
    SELECT qid, e.vec_id AS nid,
           ROUND(list_dot_product(qv, v) / (qn * nrm), 4) AS sim
    FROM q JOIN e ON e.vec_id <> qid
)
SELECT qid, nid, sim, CAST(rn AS BIGINT) AS rn
FROM (SELECT qid, nid, sim,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
      FROM p)
WHERE rn <= {TOPK_K}
""",
)
def sim_topk_bruteforce(spark, sf_dir):
    """ext_sim_topk baseline: exact top-k cosine by broadcasting the
    (small) query set against all vectors. The corpus side never
    shuffles; ranking uses the per-qid window. 100 TB path: LSH/IVF
    bucketing in operators/similarity.py.

    Zero-norm vectors carry no direction — cosine is undefined for
    them — so they are excluded from BOTH sides (query and corpus) on
    both engines; without the guard ANSI division raises on the first
    all-zero embedding a real corpus contains."""
    e = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding", norm("embedding").alias("nrm"))
        .where(F.col("nrm") > 0)
    )
    q = (
        e.where(F.col("vec_id") < TOPK_NQUERIES)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qv"),
            F.col("nrm").alias("qn"),
        )
    )
    pairs = e.join(broadcast(q), F.col("vec_id") != F.col("qid")).select(
        "qid",
        F.col("vec_id").alias("nid"),
        F.round(dot("qv", "embedding") / (F.col("qn") * F.col("nrm")), 4).alias("sim"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (
        pairs.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= TOPK_K)
    )


@register(
    "embed_neardup_cosine",
    oracle=f"""
WITH e AS (
    SELECT vec_id, label, {_E_DOUBLE} AS v,
           sqrt({_NS_SELFDOT}) AS nrm
    FROM embeddings
    WHERE {_NS_SELFDOT} > 0
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) AS sim
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) >= {NEARDUP_THRESHOLD}
""",
)
def embed_neardup_cosine(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs, blocked by label so the
    pairwise work is per-block quadratic instead of global quadratic —
    the same blocking idea LSH generalizes (band buckets instead of
    labels) when no natural key exists. Zero-norm vectors (cosine
    undefined) and NULL labels (equi-join semantics: NULL never
    matches NULL) are excluded on both engines.

    Execution (r8): per-block Arrow matmul prune + exact-fold rescore
    (operators/similarity.py::blocked_neardup_matmul) instead of the
    pairwise broadcast join evaluating the fold expression per pair —
    the pair mass grows quadratically in block size while the matmul
    stays BLAS-batched (measured, identical rows: sf1 15.1 -> 1.4 s;
    sf0.1 0.52 -> 0.85 s, the Arrow/Python-worker floor at tiny
    scale - the recorded trade). The division + 4-dp round + threshold stay HERE, JVM-side,
    over the kernel's bit-exact dot/norms, so the emitted sims equal
    the pure Column-expression plan bit-for-bit. At corpus scale the
    banded LSH/SimHash tiers are the path (block = bucket); this
    operator is the exact within-block verifier shape."""
    from ..operators.similarity import blocked_neardup_matmul

    cand = blocked_neardup_matmul(
        load_table(spark, sf_dir, "embeddings"), "label", NEARDUP_THRESHOLD
    )
    sim = F.round(F.col("dot") / (F.col("na") * F.col("nb")), 4)
    return (
        cand.select("id_a", "id_b", sim.alias("sim"))
        .where(F.col("sim") >= NEARDUP_THRESHOLD)
    )
# appended to vectors_q.py


MEAN_TRUNC6_DUCK = dec_avg_trunc_sql("x", "duckdb", 6)


@register(
    "label_centroid_inertia",
    oracle=f"""
WITH e AS (
    SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), dims AS (
    SELECT label, pos, v[pos] AS x FROM (
        SELECT label, v, unnest(generate_series(1, len(v))) AS pos FROM e
    )
), cent AS (
    SELECT label, pos, {MEAN_TRUNC6_DUCK} AS coord
    FROM dims GROUP BY label, pos
), carr AS (
    SELECT label, list(coord ORDER BY pos) AS c FROM cent GROUP BY label
), d2 AS (
    SELECT e.label,
           {ns_selfdot_sql("e.v")}
           - 2 * {ns_dot_sql("e.v", "carr.c")}
           + {ns_selfdot_sql("carr.c")} AS d2
    FROM e JOIN carr ON carr.label = e.label
)
SELECT label, COUNT(*) AS n_vecs,
       CAST(ROUND(SUM(CAST(d2 AS DECIMAL(24,8))), 2) AS DOUBLE) AS inertia
FROM d2 GROUP BY label
""",
)
def label_centroid_inertia(spark, sf_dir):
    """Clustering diagnostics over the labeled embeddings: per label,
    the within-cluster sum of squared distances (inertia) to the
    label's centroid — the number a k-means quality report prints.

    Determinism end to end: centroid coordinates are the 6-dp
    TRUNCATED exact-decimal means (operators/similarity.py::
    MEAN_TRUNC6_SQL — identical on both engines, so both measure
    distance to the SAME point); per-vector d2 is sequential-fold
    float64 over identical inputs; and the final inertia sum is an
    exact-decimal sum rounded on output, so partial-aggregation order
    cannot flip it.

    Scale: two aggregations (per-dim means, per-label sums) both keyed
    on label — centroid state is labels x dims rows; the rebuild of the
    ordered centroid array is a labels-sized sort, and the d2 pass is
    one broadcast join + map-side fold over the corpus.
    """
    from ..operators.similarity import MEAN_TRUNC6_SQL

    # widen() measured NEGATIVE here (r8): the load feeds two legs, so
    # the widening exchange ships the array column twice (1.29 s vs
    # 0.88 s bare at sf0.1); widening only the d2 leg was mediocre at
    # both scales (1.00/2.21 vs bare 0.88/2.40). The bare scan stays —
    # at production split counts the layout provides the parallelism.
    e = load_table(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("v")
    )
    dims = e.select("label", F.posexplode("v").alias("pos0", "x"))
    cent = dims.groupBy("label", "pos0").agg(
        F.expr(MEAN_TRUNC6_SQL).alias("coord")
    )
    carr = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos0"), F.col("coord")))
            ),
            lambda s: s["coord"],
        ).alias("c")
    )
    # dot()'s single-parse SQL path; its CAST(x AS DOUBLE) over the
    # already-double arrays is erased by SimplifyCasts, leaving the
    # identical product-fold expression the DSL lambdas built (r11:
    # three DSL folds cost ~0.5 s of py4j chatter per construction)
    vv, vc, cc = dot("v", "v"), dot("v", "c"), dot("c", "c")
    d2 = (vv - 2 * vc + cc).alias("d2")
    return (
        e.join(F.broadcast(carr), "label")
        .select("label", d2)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.expr(
                "CAST(ROUND(SUM(CAST(d2 AS DECIMAL(24,8))), 2) AS DOUBLE)"
            ).alias("inertia"),
        )
    )
