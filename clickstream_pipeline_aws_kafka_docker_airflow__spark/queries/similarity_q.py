"""ANN query with generated-literal oracle: sign-LSH bucketed top-k."""

from __future__ import annotations

from ..functions.scalars import dec_avg_trunc_sql
from ..functions.vectors import ns_selfdot_sql
from ..io import load_table
from ..operators.similarity import (
    ANN_BITS,
    IVF_KMEANS_ITERS,
    IVF_NCENTROIDS,
    IVF_NPROBE,
    ann_topk_bucketed,
    bucket_sql,
)
from ..registry import register

ANN_K = 5
ANN_NQUERIES = 20

_E = "CAST(embedding AS DOUBLE[])"


def _ann_oracle() -> str:
    from ..operators.similarity import ANN_SEED, ANN_TABLES

    band_rows = "\n    UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, "
        f"({bucket_sql(_E, ANN_BITS, seed=ANN_SEED + t)}) AS bucket FROM embeddings"
        for t in range(ANN_TABLES)
    )
    return f"""
WITH e AS (
    -- zero-norm vectors (cosine undefined) sit out ranking on both
    -- sides; they may still occupy band-index buckets
    SELECT vec_id, {_E} AS v,
           sqrt(list_dot_product({_E}, {_E})) AS nrm
    FROM embeddings
    WHERE list_dot_product({_E}, {_E}) > 0
),
b AS (
    {band_rows}
),
cand AS (
    SELECT DISTINCT qb.vec_id AS qid, b.vec_id AS nid
    FROM b JOIN b qb ON b.tbl = qb.tbl AND b.bucket = qb.bucket
    WHERE qb.vec_id < {ANN_NQUERIES} AND b.vec_id <> qb.vec_id
),
p AS (
    SELECT qid, nid,
           ROUND(list_dot_product(eq.v, en.v) / (eq.nrm * en.nrm), 4) AS sim
    FROM cand
    JOIN e eq ON eq.vec_id = qid
    JOIN e en ON en.vec_id = nid
)
SELECT qid, nid, sim, CAST(rn AS BIGINT) AS rn
FROM (SELECT qid, nid, sim,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
      FROM p)
WHERE rn <= {ANN_K}
"""


def lsh_bands_table(spark, sf_dir):
    """Materialized sign-LSH index (vec_id, tbl, bucket) — built once
    per corpus snapshot; searches join it instead of re-hashing the
    corpus through n_tables x nbits hyperplane dots."""
    import os

    from ..operators.artifacts import materialized
    from ..operators.similarity import ANN_TABLES, lsh_bands

    return materialized(
        spark,
        os.path.join(sf_dir, "embeddings.parquet"),
        "lsh_bands",
        lambda: lsh_bands(load_table(spark, sf_dir, "embeddings")),
        params=f"{ANN_BITS}x{ANN_TABLES}",
    )


@register("ann_topk_lsh", oracle=_ann_oracle())
def ann_topk_lsh(spark, sf_dir):
    """ext_sim_topk scale path: random-hyperplane sign-LSH with
    OR-amplified multi-table buckets (candidate = same bucket in any of
    the tables), exact cosine only on the de-duplicated candidates.
    Joins the MATERIALIZED band index (lsh_bands_table)."""
    return ann_topk_bucketed(
        load_table(spark, sf_dir, "embeddings"),
        ANN_NQUERIES,
        ANN_K,
        bands=lsh_bands_table(spark, sf_dir),
    )


# identical semantics to sim_topk_bruteforce (vectors_q.py) -> same
# oracle; base norm is the NULL-safe form (r11 nullish-vector fuzz —
# Spark's fold NULL-propagates where list_dot_product errors), pair
# dots below only see vectors that survived the norm guard
_BRUTE_ORACLE = f"""
WITH e AS (
    SELECT vec_id, {_E} AS v,
           sqrt({ns_selfdot_sql(_E)}) AS nrm
    FROM embeddings
    WHERE {ns_selfdot_sql(_E)} > 0
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


def _ivf_ctes(n_centroids: int, n_iters: int) -> str:
    """Composable CTE chain (assumes ``e(vec_id, v, nrm)`` is already
    defined) ending in ``assign(vec_id, centroid_id, crank)`` — the
    k-means-refined quantizer assignment. Iterations are unrolled as
    WITH stages; centroid means use the exact truncated-decimal
    construction (operators/similarity.py::MEAN_TRUNC6_SQL), so
    centroids — and therefore cells and candidates — agree across
    engines."""
    from ..operators.similarity import ANN_DIM

    assign_over = (
        "SELECT e.vec_id, centroid_id,\n"
        "           ROW_NUMBER() OVER (\n"
        "               PARTITION BY e.vec_id\n"
        "               ORDER BY list_dot_product(v, v) - 2 * list_dot_product(v, cvec)\n"
        "                        + list_dot_product(cvec, cvec),\n"
        "                        centroid_id) AS crank\n"
        "    FROM e CROSS JOIN {cent}"
    )
    sql = f"""cent0 AS (SELECT vec_id AS centroid_id, v AS cvec FROM e
          WHERE vec_id < {n_centroids})"""
    prev = "cent0"
    for i in range(1, n_iters + 1):
        sql += f""",
a{i} AS (
    {assign_over.format(cent=prev)}
),
cent{i} AS (
    SELECT centroid_id, list(coord ORDER BY dim) AS cvec
    FROM (
        SELECT a.centroid_id, r.dim,
               {dec_avg_trunc_sql("v[dim]", "duckdb", 6)} AS coord
        FROM e
        JOIN a{i} a ON a.vec_id = e.vec_id AND a.crank = 1
        CROSS JOIN range(1, {ANN_DIM + 1}) r(dim)
        GROUP BY a.centroid_id, r.dim
    )
    GROUP BY centroid_id
)"""
        prev = f"cent{i}"
    sql += f""",
assign AS (
    {assign_over.format(cent=prev)}
)"""
    return sql


def _ivf_refined_oracle(n_centroids: int, n_iters: int, nprobe: int) -> str:
    """DuckDB twin of the k-means-refined IVF search."""
    sql = f"""
WITH e AS (
    SELECT vec_id, {_E} AS v,
           sqrt(list_dot_product({_E}, {_E})) AS nrm
    FROM embeddings
),
{_ivf_ctes(n_centroids, n_iters)},
corpus AS (
    -- zero-norm vectors keep a home cell (training/assignment above
    -- see every vector) but sit out cosine ranking on both sides
    SELECT e.vec_id, v, nrm, centroid_id
    FROM e JOIN assign a ON a.vec_id = e.vec_id AND a.crank = 1
    WHERE e.nrm > 0
),
probes AS (
    SELECT a.vec_id AS qid, a.centroid_id, e.v AS qv, e.nrm AS qn
    FROM assign a JOIN e ON e.vec_id = a.vec_id
    WHERE a.vec_id < {ANN_NQUERIES} AND a.crank <= {nprobe}
      AND e.nrm > 0
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
    return sql


def _quantizer_cached(spark, sf_dir):
    """Train-once-reuse-everywhere quantizer: the trained centroid set
    is persisted (save_quantizer) keyed on the source file identity and
    quantizer params, and later calls load it instead of re-running
    k-means — the production IVF pattern, where training cost lives in
    a build job and the query path only loads. float64 round-trips
    through parquet exactly, so a loaded quantizer reproduces
    assignments (and the oracle match) bit-for-bit."""
    import hashlib
    import os

    from ..operators.similarity import (
        kmeans_centroid_list,
        load_quantizer,
        save_quantizer,
    )

    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    key = hashlib.sha1(
        f"{os.path.abspath(src)}:{st.st_mtime_ns}:{st.st_size}:"
        f"{IVF_NCENTROIDS}:{IVF_KMEANS_ITERS}:v1".encode()
    ).hexdigest()[:16]
    path = os.path.join("/tmp/spark_graft_quantizers", key)
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return load_quantizer(spark, path)
    import time

    from ..operators.artifacts import BUILD_WALLS

    t0 = time.perf_counter()
    cents = kmeans_centroid_list(load_table(spark, sf_dir, "embeddings"))
    save_quantizer(cents, spark, path)
    # k-means training is a build cost like any artifact's — recorded
    # so bench_compare's cold pass can report build-inclusive walls
    BUILD_WALLS["quantizer"] = BUILD_WALLS.get("quantizer", 0.0) + (
        time.perf_counter() - t0
    )
    return cents


def ivf_cells_table(spark, sf_dir, cents=None):
    """Materialized IVF inverted file: every vector's home cell under
    the persisted quantizer — built once per snapshot, joined by every
    search."""
    import os

    from ..operators.artifacts import materialized
    from ..operators.similarity import _assign_to_centroids

    if cents is None:
        cents = _quantizer_cached(spark, sf_dir)
    return materialized(
        spark,
        os.path.join(sf_dir, "embeddings.parquet"),
        "ivf_cells",
        lambda: _assign_to_centroids(
            load_table(spark, sf_dir, "embeddings"), cents, top=1
        ).select("vec_id", "centroid_id"),
        params=f"{IVF_NCENTROIDS}i{IVF_KMEANS_ITERS}",
    )


@register(
    "ann_topk_ivf",
    oracle=_ivf_refined_oracle(IVF_NCENTROIDS, IVF_KMEANS_ITERS, IVF_NPROBE),
)
def ann_topk_ivf(spark, sf_dir):
    """ext_sim_topk IVF path: deterministic k-means quantizer (16 seeds
    + 2 exact-arithmetic Lloyd iterations) + nprobe=2 cell search — the
    inverted-file alternative to sign-LSH; recall/cost tunes with
    nprobe instead of nbits. Refinement re-centers cells on the data
    (balanced cells = bounded per-cell work at scale) at zero search
    cost; recall vs brute force is reported with stated floors in
    tests/test_ann_recall.py. The quantizer is trained once and
    persisted (_quantizer_cached), and the inverted file (per-vector
    home cell) is materialized once — search pays neither training nor
    corpus re-assignment."""
    from ..operators.similarity import ivf_topk

    cents = _quantizer_cached(spark, sf_dir)
    return ivf_topk(
        load_table(spark, sf_dir, "embeddings"),
        ANN_NQUERIES,
        ANN_K,
        cents=cents,
        corpus_cells=ivf_cells_table(spark, sf_dir, cents),
    )


@register("sim_topk_vectorized", oracle=_BRUTE_ORACLE)
def sim_topk_vectorized(spark, sf_dir):
    """ext_sim_topk via Arrow-batched numpy matmul. BLAS prunes to
    top-(k+margin); survivors are re-scored with the sequential-fold
    expression, so final sims match the exact baseline bit-for-bit
    (BLAS summation order never reaches the output)."""
    from ..operators.similarity import topk_matmul_arrow

    return topk_matmul_arrow(load_table(spark, sf_dir, "embeddings"), 10, 5)
