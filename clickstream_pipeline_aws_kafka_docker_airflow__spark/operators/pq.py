"""Product quantization (PQ) — the third ANN tier next to sign-LSH and
IVF: split the embedding into ``N_SUB`` subvectors, k-means each
subspace independently, and store every vector as ``N_SUB`` small codes
(here 8 codes of 4 bits of information each — a 64-float vector
compresses to 8 ints). Search scans CODES, not vectors: per query a
``N_SUB x K_SUB`` lookup table of subspace distances is built once, and
a vector's approximate distance is ``sum_s LUT[s][code_s]`` — integer
indexing and adds, no per-pair dot products.

At 100 TB this is the memory-bound regime's answer: the code table is
~10^2 smaller than the raw vectors, streams through executors at scan
speed, and the LUT rides in the closure. Approximation is handled the
same way as the Arrow-matmul path (operators/similarity.py): PQ
distance only PRUNES to ``k + margin`` candidates per query, and the
survivors are re-scored with the exact sequential-fold cosine — final
results are bit-identical to the exact ordering on the candidate set.

Training reuses the deterministic machinery of the IVF quantizer
(exact-decimal means, fixed iterations, id tie-breaks) per subspace, so
codes are reproducible across engines and runs; with ``n_iters=0`` the
codebooks are the first ``k_sub`` subvectors and the whole encoding has
a DuckDB oracle (queries/pq_q.py::pq_codes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.vectors import dot
from .similarity import kmeans_centroid_list

N_SUB = 8  # subspaces
SUB_DIM = 8  # dims per subspace (N_SUB * SUB_DIM = embedding dim)
K_SUB = 16  # centroids per subspace codebook
PQ_ITERS = 0  # 0 = sampled-seed codebooks (fully oracle-able)


def _sub_slice(
    s: int, col: str = "embedding", sub_dim: int = SUB_DIM
) -> F.Column:
    return F.slice(F.col(col), s * sub_dim + 1, sub_dim)


def train_pq(
    emb: DataFrame,
    n_sub: int = N_SUB,
    k_sub: int = K_SUB,
    n_iters: int = PQ_ITERS,
    sub_dim: int = SUB_DIM,
) -> list[list[tuple[int, list[float]]]]:
    """One codebook per subspace: k-means (or, for ``n_iters=0``, the
    first ``k_sub`` subvectors by vec_id) over that subspace's slice of
    every vector. Returns ``codebooks[s] = [(code_id, coords), ...]``.
    ``n_sub * sub_dim`` must equal the embedding dimension — the
    geometry flows through every consumer via the explicit ``sub_dim``.
    """
    if n_iters > 0:
        return [
            kmeans_centroid_list(
                emb.select(
                    "vec_id",
                    _sub_slice(s, sub_dim=sub_dim)
                    .cast("array<double>")
                    .alias("embedding"),
                ),
                k_sub,
                n_iters,
            )
            for s in range(n_sub)
        ]
    # seed codebooks: ONE collect of the k_sub seed vectors, sliced
    # driver-side — not one scan job per subspace. The slice is exactly
    # collect_query_vectors' shape, so the pq/ivfpq/residual tiers all
    # share one memoized collect instead of re-scanning per query.
    from .similarity import collect_query_vectors

    seeds = collect_query_vectors(emb, k_sub)
    return [
        [
            (cid, v[s * sub_dim : (s + 1) * sub_dim])
            for cid, v in seeds
        ]
        for s in range(n_sub)
    ]


def _empty_topk(emb: DataFrame) -> DataFrame:
    """The empty search result (empty corpus snapshot / no usable
    quantizer state) in the shared top-k schema."""
    return emb.sparkSession.createDataFrame(
        [], "qid bigint, nid bigint, sim double, rn bigint"
    )


def encode_pq(
    emb: DataFrame,
    books: list[list[tuple[int, list[float]]]],
    sub_dim: int = SUB_DIM,
    mode: str | None = None,
) -> DataFrame:
    """(vec_id, codes array<bigint>) — nearest-codebook-entry id per
    subspace, ONE projection for all subspaces (each an array_min over
    the codebook, the same shape as the IVF assignment).

    Codebook state routes like the IVF quantizer
    (similarity.LITERAL_STATE_MAX_DOUBLES): small books inline as plan
    literals; large books ship as ONE broadcast row holding all
    subspace books, so the plan size is O(1) in n_sub x k_sub x
    sub_dim. Both paths share the sequential-fold arithmetic, so codes
    are bit-identical.

    Per-row constants stay out of the per-entry lambda (interpreted
    HOFs get no CSE): ||v_s||^2 is projected once per subspace per row
    rather than once per codebook entry, and ||c||^2 — constant per
    entry — is folded at the driver with the same sequential left fold
    (``_fold_sq``), so d2 is bit-identical to the DuckDB oracle's
    spelling."""
    from .similarity import LITERAL_STATE_MAX_DOUBLES, _fold_sq

    if not books or not any(books):
        # empty codebooks (empty corpus snapshot): nothing to encode —
        # an empty code table, not an array() VOID-type crash
        return emb.sparkSession.createDataFrame(
            [], "vec_id bigint, codes array<bigint>"
        )
    if mode is None:
        state = sum(len(b) * (sub_dim + 1) for b in books)
        mode = "literal" if state <= LITERAL_STATE_MAX_DOUBLES else "broadcast"

    proj = emb.select(
        "vec_id",
        "embedding",
        *[
            F.aggregate(
                F.zip_with(
                    _sub_slice(s, sub_dim=sub_dim),
                    _sub_slice(s, sub_dim=sub_dim),
                    lambda a, b: a.cast("double") * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias(f"_svv{s}")
            for s in range(len(books))
        ],
    )
    if mode == "broadcast":
        packed = emb.sparkSession.createDataFrame(
            [
                (
                    [
                        [
                            (float(_fold_sq(coords)), int(cid),
                             [float(x) for x in coords])
                            for cid, coords in book
                        ]
                        for book in books
                    ],
                )
            ],
            "_books array<array<struct<cn2:double,code:bigint,"
            "cvec:array<double>>>>",
        )
        def _entries_for(sliced, svv):
            # factory, not default-arg lambda: PySpark counts lambda
            # parameters (defaults included) to pick the HOF arity
            return lambda cm: F.struct(
                (
                    svv
                    - 2
                    * F.aggregate(
                        F.zip_with(
                            sliced, cm["cvec"],
                            lambda a, b: a.cast("double") * b,
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                    + cm["cn2"]
                ).alias("d2"),
                cm["code"].alias("code"),
            )

        code_cols = []
        for s in range(len(books)):
            entries = F.transform(
                F.element_at("_books", s + 1),
                _entries_for(_sub_slice(s, sub_dim=sub_dim), F.col(f"_svv{s}")),
            )
            code_cols.append(F.array_min(entries)["code"])
        return proj.join(F.broadcast(packed)).select(
            "vec_id", F.array(*code_cols).alias("codes")
        )

    code_cols = []
    for s, book in enumerate(books):
        sliced = _sub_slice(s, sub_dim=sub_dim)
        cmat = F.expr(
            "array("
            + ",".join(
                "array(" + ",".join(f"CAST('{x!r}' AS DOUBLE)" for x in coords) + ")"
                for _, coords in book
            )
            + ")"
        )
        cmeta = F.expr(
            "array("
            + ",".join(
                f"named_struct('cn2', CAST('{_fold_sq(coords)!r}' AS DOUBLE), "
                f"'code', CAST({int(cid)} AS BIGINT))"
                for cid, coords in book
            )
            + ")"
        )
        svv = F.col(f"_svv{s}")
        entries = F.zip_with(
            cmat,
            cmeta,
            lambda c, m: F.struct(
                (
                    svv
                    - 2
                    * F.aggregate(
                        F.zip_with(sliced, c, lambda a, b: a.cast("double") * b),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                    + m["cn2"]
                ).alias("d2"),
                m["code"].alias("code"),
            ),
        )
        code_cols.append(F.array_min(entries)["code"])
    return proj.select("vec_id", F.array(*code_cols).alias("codes"))


def _query_luts(emb, n_queries, books, sub_dim, q_vecs=None):
    """Per-query PQ lookup tables as a broadcastable DataFrame
    (qid, lut array<array<double>>) — expanded-form sequential folds
    (see pq_topk). Pass ``q_vecs`` (from ``collect_query_vectors``) to
    reuse an already-collected query slice instead of running another
    collect job."""
    from .similarity import _fold_dot, collect_query_vectors

    if q_vecs is None:
        q_vecs = collect_query_vectors(emb, n_queries)
    lut_len = max(cid for book in books for cid, _ in book) + 1
    lut_rows = []
    for qid, v in q_vecs:
        luts = []
        for s, book in enumerate(books):
            sub = v[s * sub_dim : (s + 1) * sub_dim]
            qq = _fold_dot(sub, sub)
            row = [float("inf")] * lut_len
            for cid, coords in book:
                row[cid] = (
                    qq - 2 * _fold_dot(sub, coords) + _fold_dot(coords, coords)
                )
            luts.append(row)
        lut_rows.append((qid, luts))
    return emb.sparkSession.createDataFrame(
        lut_rows, "qid bigint, lut array<array<double>>"
    )


def _adist_expr(n_sub: int) -> F.Column:
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(n_sub - 1)),
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(
            F.element_at("lut", (s + 1).cast("int")),
            (F.element_at("codes", (s + 1).cast("int")) + 1).cast("int"),
        ),
    )


def ivfpq_topk(
    emb: DataFrame,
    n_queries: int,
    k: int,
    cents: list[tuple[int, list[float]]],
    corpus_cells: DataFrame | None = None,
    codes: DataFrame | None = None,
    books: list[list[tuple[int, list[float]]]] | None = None,
    nprobe: int = 2,
    rescore_margin: int = 50,
    sub_dim: int = SUB_DIM,
    index: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ search — the production ANN serving architecture (the
    faiss IVFPQ shape) composed from the materialized artifacts: probe
    the query's ``nprobe`` nearest cells (coarse quantizer), rank ONLY
    that cell's members by PQ approximate distance (codes scan + LUT
    adds — no vector math on the corpus side), then exact-rescore the
    ``k + rescore_margin`` survivors with the sequential-fold cosine.

    At 100 TB: candidate work is (cells probed x cell size) rows of
    CODES (~10^2 smaller than vectors), the LUTs and probe lists are
    query-side broadcasts, and the exact rescore touches margin rows
    per query. Everything upstream (quantizer, inverted file, code
    table) is build-once state.

    Pass ``index`` as the COMBINED (vec_id, centroid_id, codes) table
    (the production layout — cells and codes stored together) to
    serve from one scan with no corpus-sized vec_id join; passing
    separate ``corpus_cells`` + ``codes`` joins them here instead.
    """
    from pyspark.sql.window import Window

    from ..functions.vectors import norm
    from .similarity import _probe_cells_driver, collect_query_vectors

    if not cents or not books or not any(books):
        # empty quantizer/codebooks (empty corpus snapshot)
        return _empty_topk(emb)
    q_vecs = collect_query_vectors(emb, n_queries)
    probes = emb.sparkSession.createDataFrame(
        _probe_cells_driver(q_vecs, cents, max(nprobe, 1)),
        "qid bigint, centroid_id bigint",
    )
    qdf = _query_luts(emb, n_queries, books, sub_dim, q_vecs=q_vecs)
    if index is None:
        index = corpus_cells.join(codes, "vec_id")
    # candidates: cell members of probed cells, ranked by PQ distance
    cand_codes = (
        index.join(F.broadcast(probes), "centroid_id")
        .where(F.col("vec_id") != F.col("qid"))
        .join(F.broadcast(qdf), "qid")
    )
    pairs = cand_codes.select(
        "qid", F.col("vec_id").alias("nid"), _adist_expr(len(books)).alias("adist")
    )
    wp = Window.partitionBy("qid").orderBy(F.col("adist"), F.col("nid"))
    cand = (
        pairs.withColumn("prn", F.row_number().over(wp))
        .where(F.col("prn") <= k + rescore_margin)
        .select("qid", "nid")
    )
    # zero-norm vectors (cosine undefined) are excluded at the RESCORE
    # stage on both engines — the ADC prune above still sees them, so
    # the candidate sets stay identical across engines
    qv = (
        emb.where(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qvec"),
            norm("embedding").alias("qn"),
        )
        .where(F.col("qn") > 0)
    )
    # corpus-side norm folds AFTER the candidate join: the broadcast
    # probe reduces the corpus to margin-rows-per-query first, so the
    # O(dim) fold runs on survivors only (same expression, same values
    # — bit-identical to folding before the join)
    rescored = (
        emb.select("vec_id", "embedding")
        .where(norm("embedding") > 0)
        .join(F.broadcast(cand), F.col("vec_id") == F.col("nid"))
        .join(F.broadcast(qv), "qid")
        .select(
            "qid",
            "nid",
            F.round(
                dot("qvec", "embedding")
                / (F.col("qn") * norm("embedding")),
                4,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (
        rescored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= k)
    )


def pq_topk(
    emb: DataFrame,
    n_queries: int,
    k: int,
    n_sub: int = N_SUB,
    k_sub: int = K_SUB,
    n_iters: int = PQ_ITERS,
    rescore_margin: int = 50,
    sub_dim: int = SUB_DIM,
    codes: DataFrame | None = None,
) -> DataFrame:
    """PQ search: encode the corpus once, build per-query LUTs at the
    driver (``n_queries x n_sub x k_sub`` doubles — tiny), prune to the
    ``k + rescore_margin`` best approximate distances per query, then
    exact-rescore the survivors with the sequential-fold cosine. Same
    prune-then-exact contract as ``topk_matmul_arrow``.

    ``rescore_margin`` is the recall dial: measured on the driver's
    UNCLUSTERED embeddings (near-random neighbors — the hardest case
    for any quantizer) recall@5 is 0.53/0.71/0.82 at margins 25/50/75
    (tests/test_pq.py pins a floor). On real clustered embeddings the
    codes separate neighbors far better and a much smaller margin
    reaches the same recall; at scale the rescore cost is
    margin-rows-per-query regardless of corpus size.
    """
    from pyspark.sql.window import Window

    from ..functions.vectors import norm
    from .scale import widen

    books = train_pq(emb, n_sub, k_sub, n_iters, sub_dim=sub_dim)
    if not any(books):
        return _empty_topk(emb)  # empty corpus snapshot
    if codes is None:
        codes = encode_pq(widen(emb), books, sub_dim=sub_dim)

    # LUT[q][s][cid] = ||q_s - c||^2, indexed by CODEBOOK-ENTRY ID, not
    # list position: with n_iters>0 a k-means cluster can empty and drop
    # out of the book, leaving id gaps — a positional LUT would then
    # read the wrong entry (or index past the end under ANSI mode).
    # Gap ids get +inf so a stale code can never win the prune.
    # LUT entries use the EXPANDED d2 spelling (q.q - 2 q.c + c.c) with
    # sequential folds — the same arithmetic the SQL oracle spells via
    # list_dot_product (agreement within an ulp), so the prune ordering
    # (adist, nid) matches across engines away from ulp-ties and the
    # generous rescore margin absorbs any boundary flip.
    qdf = _query_luts(emb, n_queries, books, sub_dim)
    # approx distance: integer-indexed LUT lookups, one per subspace
    pairs = (
        codes.join(F.broadcast(qdf), F.col("vec_id") != F.col("qid"))
        .select(
            "qid", F.col("vec_id").alias("nid"), _adist_expr(n_sub).alias("adist")
        )
    )
    wp = Window.partitionBy("qid").orderBy(F.col("adist"), F.col("nid"))
    cand = (
        pairs.withColumn("prn", F.row_number().over(wp))
        .where(F.col("prn") <= k + rescore_margin)
        .select("qid", "nid")
    )
    # zero-norm vectors (cosine undefined) are excluded at the RESCORE
    # stage on both engines — the ADC prune above still sees them, so
    # the candidate sets stay identical across engines
    qv = (
        emb.where(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qvec"),
            norm("embedding").alias("qn"),
        )
        .where(F.col("qn") > 0)
    )
    # corpus-side norm folds AFTER the candidate join: the broadcast
    # probe reduces the corpus to margin-rows-per-query first, so the
    # O(dim) fold runs on survivors only (same expression, same values
    # — bit-identical to folding before the join)
    rescored = (
        emb.select("vec_id", "embedding")
        .where(norm("embedding") > 0)
        .join(F.broadcast(cand), F.col("vec_id") == F.col("nid"))
        .join(F.broadcast(qv), "qid")
        .select(
            "qid",
            "nid",
            F.round(
                dot("qvec", "embedding")
                / (F.col("qn") * norm("embedding")),
                4,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (
        rescored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= k)
    )


def residual_frame(
    emb: DataFrame,
    cells: DataFrame,
    cents: list[tuple[int, list[float]]],
) -> DataFrame:
    """(vec_id, embedding = v - centroid[home_cell], centroid_id) —
    the faiss-IVFPQ refinement: PQ codes quantize the RESIDUAL from
    the coarse cell centroid, not the raw vector. Members of a tight
    cell share nearly identical raw vectors (identical codes -> the
    prune degenerates to its id tie-break); their residuals differ,
    so the codes keep within-cell resolution — measured on 100k
    clustered vectors (margins 50/200): raw-vector codes 0.08/0.26
    recall@5 vs residual 0.23/0.57 at 16-entry codebooks, and
    0.48/0.80 vs 0.51/0.90 at the faiss-standard 256 entries (IVF
    with exact in-cell scoring hits 1.00; tests/test_pq.py pins the
    ordering).

    Parity note: the subtraction is per-element (one IEEE op, no
    reduction), so residual arrays are bit-identical to the DuckDB
    oracle's ``list_transform(list_zip(v, cvec), s -> s[1] - s[2])``
    spelling — the whole downstream code/LUT machinery then applies
    to residuals verbatim."""
    cdf = emb.sparkSession.createDataFrame(
        [(int(cid), [float(x) for x in coords]) for cid, coords in cents],
        "centroid_id bigint, _cvec array<double>",
    )
    return (
        emb.join(cells.select("vec_id", "centroid_id"), "vec_id")
        .join(F.broadcast(cdf), "centroid_id")
        .select(
            "vec_id",
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                F.col("_cvec"),
                lambda a, b: a - b,
            ).alias("embedding"),
            "centroid_id",
        )
    )


def _luts_for_vec(v, books, sub_dim, lut_len):
    """LUT[s][cid] = ||v_s - c||^2 over one vector, expanded-form
    sequential folds (shared by the raw-vector and residual paths)."""
    from .similarity import _fold_dot

    luts = []
    for s, book in enumerate(books):
        sub = v[s * sub_dim : (s + 1) * sub_dim]
        qq = _fold_dot(sub, sub)
        row = [float("inf")] * lut_len
        for cid, coords in book:
            row[cid] = (
                qq - 2 * _fold_dot(sub, coords) + _fold_dot(coords, coords)
            )
        luts.append(row)
    return luts


def ivfpq_topk_residual(
    emb: DataFrame,
    n_queries: int,
    k: int,
    cents: list[tuple[int, list[float]]],
    books: list[list[tuple[int, list[float]]]],
    nprobe: int = 2,
    rescore_margin: int = 50,
    sub_dim: int = SUB_DIM,
    index: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ search over RESIDUAL codes (``residual_frame``): the LUT
    is built per (query, probed cell) from the query's residual against
    that cell's centroid — n_queries x nprobe tiny driver-side tables —
    and candidates join on the cell id, so each cell member is ranked
    by the LUT of the exact centroid its code was encoded against.
    Everything else (prune window, exact cosine rescore on RAW
    vectors) matches :func:`ivfpq_topk`."""
    from pyspark.sql.window import Window

    from ..functions.vectors import norm
    from .similarity import _probe_cells_driver, collect_query_vectors

    if not cents or not books or not any(books):
        # empty quantizer/codebooks (empty corpus snapshot)
        return _empty_topk(emb)
    q_vecs = collect_query_vectors(emb, n_queries)
    probe_pairs = _probe_cells_driver(q_vecs, cents, max(nprobe, 1))
    cents_map = {int(cid): [float(x) for x in coords] for cid, coords in cents}
    qmap = dict(q_vecs)
    lut_len = max(cid for book in books for cid, _ in book) + 1
    lut_rows = []
    for qid, cellid in probe_pairs:
        rv = [a - b for a, b in zip(qmap[qid], cents_map[cellid])]
        lut_rows.append(
            (qid, cellid, _luts_for_vec(rv, books, sub_dim, lut_len))
        )
    qdf = emb.sparkSession.createDataFrame(
        lut_rows,
        "qid bigint, centroid_id bigint, lut array<array<double>>",
    )
    cand_codes = index.join(F.broadcast(qdf), "centroid_id").where(
        F.col("vec_id") != F.col("qid")
    )
    pairs = cand_codes.select(
        "qid",
        F.col("vec_id").alias("nid"),
        _adist_expr(len(books)).alias("adist"),
    )
    wp = Window.partitionBy("qid").orderBy(F.col("adist"), F.col("nid"))
    cand = (
        pairs.withColumn("prn", F.row_number().over(wp))
        .where(F.col("prn") <= k + rescore_margin)
        .select("qid", "nid")
    )
    # zero-norm vectors (cosine undefined) are excluded at the RESCORE
    # stage on both engines — the ADC prune above still sees them, so
    # the candidate sets stay identical across engines
    qv = (
        emb.where(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qvec"),
            norm("embedding").alias("qn"),
        )
        .where(F.col("qn") > 0)
    )
    # corpus-side norm folds AFTER the candidate join: the broadcast
    # probe reduces the corpus to margin-rows-per-query first, so the
    # O(dim) fold runs on survivors only (same expression, same values
    # — bit-identical to folding before the join)
    rescored = (
        emb.select("vec_id", "embedding")
        .where(norm("embedding") > 0)
        .join(F.broadcast(cand), F.col("vec_id") == F.col("nid"))
        .join(F.broadcast(qv), "qid")
        .select(
            "qid",
            "nid",
            F.round(
                dot("qvec", "embedding")
                / (F.col("qn") * norm("embedding")),
                4,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (
        rescored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= k)
    )
