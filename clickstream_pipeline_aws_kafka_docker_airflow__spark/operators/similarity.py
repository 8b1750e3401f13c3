"""Approximate nearest-neighbor search over embedding columns.

Two tiers (SURVEY.md §2.5 ext_sim_topk):

* brute-force cosine top-k (queries/vectors_q.py) — the exact baseline,
  quadratic; fine when one side is small enough to broadcast;
* **sign-LSH bucketing** (here) — random-hyperplane signatures: vectors
  agreeing on all ``nbits`` signs land in one bucket, search runs
  within-bucket only. At 100 TB: bucket id is the shuffle key, each
  bucket is a small local problem, and recall tunes with ``nbits``
  (fewer bits -> bigger buckets -> higher recall, more compute).

The hyperplanes are generated from a fixed seed and inlined as literal
arrays in BOTH the Spark plan and the DuckDB oracle — float64 literals
round-trip exactly, so the sign bits (and therefore buckets) agree
bit-for-bit across engines.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

from ..functions.vectors import dot

ANN_BITS = 8
ANN_DIM = 64
ANN_SEED = 7


@lru_cache(maxsize=None)
def hyperplanes(nbits: int = ANN_BITS, dim: int = ANN_DIM, seed: int = ANN_SEED):
    rng = np.random.default_rng(seed)
    return tuple(tuple(float(x) for x in row) for row in rng.standard_normal((nbits, dim)))


def _plane_dot(emb: Column | str, plane: tuple[float, ...]) -> Column:
    arr = F.array(*[F.lit(x) for x in plane])
    c = F.col(emb) if isinstance(emb, str) else emb
    prods = F.zip_with(c, arr, lambda x, y: x.cast("double") * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def bucket_expr(emb: Column | str = "embedding", nbits: int = ANN_BITS,
                dim: int = ANN_DIM, seed: int = ANN_SEED) -> Column:
    """Sign-bit bucket id as a '0'/'1' string of length nbits."""
    bits = [
        F.when(_plane_dot(emb, p) > 0, F.lit("1")).otherwise(F.lit("0"))
        for p in hyperplanes(nbits, dim, seed)
    ]
    return F.concat(*bits)


def bucket_sql(emb_sql: str = "CAST(embedding AS DOUBLE[])", nbits: int = ANN_BITS,
               dim: int = ANN_DIM, seed: int = ANN_SEED) -> str:
    """The DuckDB spelling of :func:`bucket_expr` with identical plane
    literals (repr round-trips float64 exactly)."""
    parts = []
    for p in hyperplanes(nbits, dim, seed):
        arr = "[" + ", ".join(repr(x) for x in p) + "]"
        parts.append(
            f"CASE WHEN list_dot_product({emb_sql}, {arr}) > 0 THEN '1' ELSE '0' END"
        )
    return " || ".join(parts)


IVF_NCENTROIDS = 16
IVF_NPROBE = 2


def ivf_assignments(emb: DataFrame, n_centroids: int = IVF_NCENTROIDS) -> DataFrame:
    """Coarse quantizer: nearest-centroid assignment per vector.

    Centroids are the first ``n_centroids`` vectors themselves (sampled
    training points — the deterministic flavor of IVF training; a
    k-means refinement would drop in here without changing the search
    path). Distance ranking uses squared L2 expanded as
    ||v||^2 - 2 v.c + ||c||^2; ties break on centroid id.

    Returns (vec_id, centroid_id, crank) where crank=1 is the home
    cell, crank<=nprobe are the probe cells.
    """
    from pyspark.sql.window import Window

    cent = emb.where(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("cvec"),
    )
    pairs = emb.select("vec_id", "embedding").crossJoin(F.broadcast(cent))
    d2 = (
        dot("embedding", "embedding")
        - 2 * dot("embedding", "cvec")
        + dot("cvec", "cvec")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("d2"), F.col("centroid_id"))
    return (
        pairs.select("vec_id", "centroid_id", d2.alias("d2"))
        .withColumn("crank", F.row_number().over(w).cast("bigint"))
    )


def ivf_topk(
    emb: DataFrame,
    n_queries: int,
    k: int,
    n_centroids: int = IVF_NCENTROIDS,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """IVF search: corpus vectors live in their home cell (crank=1);
    each query probes its ``nprobe`` nearest cells and ranks exact
    cosine only within them. Scale shape: the shuffle key is the cell
    id, per-cell work is (cell size x nprobe queries), recall tunes
    with nprobe — the inverted-file trade."""
    from pyspark.sql.window import Window

    from ..functions.vectors import norm

    assign = ivf_assignments(emb, n_centroids)
    base = emb.select("vec_id", "embedding", norm("embedding").alias("nrm"))
    corpus = base.join(
        assign.where(F.col("crank") == 1).select("vec_id", "centroid_id"),
        "vec_id",
    )
    probes = (
        assign.where((F.col("vec_id") < n_queries) & (F.col("crank") <= nprobe))
        .select(F.col("vec_id").alias("qid"), "centroid_id")
        .join(
            base.select(
                F.col("vec_id").alias("qid"),
                F.col("embedding").alias("qv"),
                F.col("nrm").alias("qn"),
            ),
            "qid",
        )
    )
    cands = corpus.join(F.broadcast(probes), "centroid_id").where(
        F.col("vec_id") != F.col("qid")
    )
    sim = F.round(dot("qv", "embedding") / (F.col("qn") * F.col("nrm")), 4)
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    # no dedup needed: each corpus vector has exactly one home cell, so
    # a (qid, nid) pair arises from at most one probed cell
    return (
        cands.select("qid", F.col("vec_id").alias("nid"), sim.alias("sim"))
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= k)
    )


def topk_matmul_arrow(
    emb: DataFrame,
    n_queries: int,
    k: int,
    rescore_margin: int = 5,
) -> DataFrame:
    """Brute-force top-k cosine via Arrow-batched numpy matmul.

    Same semantics as the Column-expression version
    (queries/vectors_q.py::sim_topk_bruteforce) but each Arrow batch
    computes one (batch x dim) @ (dim x n_queries) matrix product
    instead of per-row fold expressions — the pattern that wins once
    dim x candidates is large (BLAS vs interpreted higher-order
    functions). The query matrix is collected once (tiny) and shipped
    inside the closure; the corpus side streams through executors.

    Determinism: BLAS accumulates pairwise/in-register, so a dot
    product can land within an ulp of a 4-dp rounding boundary and
    disagree with a sequential in-order fold. The matmul therefore only
    PRUNES — per query the top ``k + rescore_margin`` candidates by
    approximate sim — and the survivors (a few rows per query) are
    re-scored with the same sequential-fold ``aggregate`` expression
    the exact baseline uses. Final sims are bit-identical to the
    fold-order reference regardless of BLAS/batching, while the heavy
    corpus scan stays vectorized.
    """
    import numpy as np
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )
    from pyspark.sql.window import Window

    q_rows = (
        emb.where(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .collect()
    )
    qids = [r["vec_id"] for r in q_rows]
    qmat = np.array([r["embedding"] for r in q_rows], dtype=np.float64)
    qnorm = np.sqrt((qmat * qmat).sum(axis=1))

    out_schema = StructType(
        [
            StructField("qid", LongType()),
            StructField("nid", LongType()),
            StructField("sim", DoubleType()),
        ]
    )

    def _sims(batches):
        import numpy as _np
        import pandas as _pd

        _qids = _np.array(qids, dtype=_np.int64)
        for pdf in batches:
            if pdf.empty:
                continue
            v = _np.stack(pdf["embedding"].map(_np.asarray)).astype(_np.float64)
            vnorm = _np.sqrt((v * v).sum(axis=1))
            sims = (v @ qmat.T) / _np.outer(vnorm, qnorm)  # (B, nq)
            b = len(pdf)
            yield _pd.DataFrame(
                {
                    "qid": _np.repeat(_qids.reshape(1, -1), b, axis=0).ravel(),
                    "nid": _np.repeat(pdf["vec_id"].to_numpy(_np.int64), len(_qids)),
                    "sim": sims.ravel(),  # unrounded: prune key only
                }
            )

    from ..functions.vectors import norm

    approx = (
        emb.select("vec_id", "embedding")
        .mapInPandas(_sims, out_schema)
        .where(F.col("nid") != F.col("qid"))
    )
    wp = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    cand = (
        approx.withColumn("prn", F.row_number().over(wp))
        .where(F.col("prn") <= k + rescore_margin)
        .select("qid", "nid")
    )
    # exact re-score of the tiny candidate set: corpus streams, the
    # (n_queries x (k+margin)) candidate list and query vectors broadcast
    nvecs = emb.select(
        F.col("vec_id").alias("nid"),
        F.col("embedding").alias("nv"),
        norm("embedding").alias("nn"),
    )
    qvecs = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        norm("embedding").alias("qn"),
    )
    rescored = (
        nvecs.join(F.broadcast(cand), "nid")
        .join(F.broadcast(qvecs), "qid")
        .select(
            "qid",
            "nid",
            F.round(dot("qv", "nv") / (F.col("qn") * F.col("nn")), 4).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (
        rescored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= k)
    )


def ann_topk_bucketed(
    emb: DataFrame,
    n_queries: int,
    k: int,
    nbits: int = ANN_BITS,
) -> DataFrame:
    """Within-bucket top-k cosine for query vectors (vec_id < n_queries).

    Join is on the bucket id, so the pairwise work is (bucket size)^2,
    not corpus^2. sim is rounded to 4 dp BEFORE ranking (deterministic
    cross-engine order; ties break on neighbor id).
    """
    from ..functions.vectors import norm
    from pyspark.sql.window import Window

    base = emb.select(
        "vec_id", "embedding", norm("embedding").alias("nrm"),
        bucket_expr("embedding", nbits).alias("bucket"),
    )
    q = base.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("nrm").alias("qn"),
        "bucket",
    )
    pairs = base.join(F.broadcast(q), "bucket").where(
        F.col("vec_id") != F.col("qid")
    ).select(
        "qid",
        F.col("vec_id").alias("nid"),
        F.round(dot("qv", "embedding") / (F.col("qn") * F.col("nrm")), 4).alias("sim"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (
        pairs.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= k)
    )
