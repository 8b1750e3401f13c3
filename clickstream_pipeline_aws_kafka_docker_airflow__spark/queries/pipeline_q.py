"""Training-data pipeline operators beyond pairwise dedup: cluster
canonicalization, deterministic dataset splits, per-language quota
sampling, and benchmark-contamination screening.

These are the steps a 100 TB pretraining corpus build runs AFTER the
reference's ingest/KPI stages and the near-dup detectors: collapse dup
pairs into keep-lists, carve reproducible train/val/test slices, cap
per-language volume, and screen against eval-set leakage. Each has a
full DuckDB oracle (the components oracle is a recursive-CTE transitive
closure — the SQL-expressible ground truth for the iterative Spark
implementation).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..functions.vectors import ns_selfdot_sql
from ..io import load_table
from ..operators.artifacts import materialized
from ..operators.clustering import connected_components
from ..operators.dedup import HEX, token_hash32_sql
from ..queries.dedup_q import _minhash_oracle
from ..registry import register

# Candidate pairs at/above this exact-Jaccard level are duplicates for
# clustering purposes (the LSH candidate set is verified with exact
# Jaccard first, so this thresholds a true similarity, not a sketch).
DUP_JACCARD = 0.5


def dup_pairs_table(spark, sf_dir):
    """Materialized verified near-dup pair list — the output of the
    dedup DETECTOR job, consumed by cluster labeling and cross-modal
    checks. In production this is a table the detector writes once per
    corpus snapshot; recomputing MinHash inside every consumer would
    multiply the heaviest text scan by the number of consumers."""
    from .dedup_q import minhash_pairs_table

    return minhash_pairs_table(spark, sf_dir).where(
        F.col("jaccard") >= DUP_JACCARD
    )


def cluster_labels_table(spark, sf_dir):
    """Materialized cluster-label table — the output of the labeling
    job (connected components over the pair list), consumed by the
    curation composites."""
    return materialized(
        spark,
        os.path.join(sf_dir, "documents.parquet"),
        "cluster_labels",
        lambda: _dedup_clusters_frame(spark, sf_dir),
        params=f"j{DUP_JACCARD}",
    )


# Shared oracle fragment: verified near-dup pairs -> symmetric edges ->
# recursive transitive closure -> per-doc min-reachable-id (`members`).
# ONE spelling, composed by dedup_clusters, corpus_curation, and
# source_curation_stats — editing the closure logic or threshold in one
# consumer but not the others would silently de-sync the composite
# oracles from their stage oracle.
# MATERIALIZED on the static terms: DuckDB may re-evaluate a plain CTE
# on every iteration of the recursive member that joins it — at sf1 the
# un-hinted pack oracle re-split every doc's text ~6k times (30+ min vs
# 10 s). Pure evaluation hint, zero semantic change.
MEMBERS_CTES = f"""pairs AS MATERIALIZED (
    SELECT * FROM ({_minhash_oracle()}) q WHERE jaccard >= {DUP_JACCARD}
), e AS MATERIALIZED (
    SELECT id_a AS a, id_b AS b FROM pairs
    UNION SELECT id_b, id_a FROM pairs
), reach AS (
    SELECT a, b FROM e
    UNION
    SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a
), members AS (
    SELECT a AS doc_id, LEAST(a, MIN(b)) AS canonical_id FROM reach GROUP BY a
)"""


@register(
    "dedup_clusters",
    oracle=f"""
WITH RECURSIVE {MEMBERS_CTES}
SELECT d.doc_id,
       COALESCE(m.canonical_id, d.doc_id) AS canonical_id,
       d.doc_id = COALESCE(m.canonical_id, d.doc_id) AS is_canonical
FROM documents d LEFT JOIN members m USING (doc_id)
""",
)
def dedup_clusters(spark, sf_dir):
    """Near-dup pairs -> connected components -> per-document keep
    decision: every doc maps to the minimum doc_id of its duplicate
    cluster; ``is_canonical`` is the keep-list. Transitivity matters —
    A~B and B~C must collapse to ONE canonical even when A,C never
    paired, which per-pair dedup gets wrong.

    Scale: the component computation runs on the near-dup SUBGRAPH
    (nodes that appear in a verified pair), not the corpus; the corpus
    only left-joins the resulting label table once at the end. The
    pair list comes from the materialized detector output
    (dup_pairs_table) — the labeling job reads the detector's table,
    it does not re-run MinHash. Like the other iterative corpus
    products (pagerank, semdedup), the labels are a build-once
    snapshot artifact (cluster_labels_table): the CC iterations run
    once per snapshot in the build job, queries only read.
    """
    return cluster_labels_table(spark, sf_dir)


def _dedup_clusters_frame(spark, sf_dir):
    """The labeling computation (builder for cluster_labels_table —
    dedup_clusters serves its materialized output)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dup_pairs_table(spark, sf_dir)
    comp = connected_components(pairs, "id_a", "id_b").withColumnRenamed(
        "id", "doc_id"
    )
    return docs.select("doc_id").join(comp, "doc_id", "left").select(
        "doc_id",
        F.coalesce("label", "doc_id").alias("canonical_id"),
        (F.col("doc_id") == F.coalesce("label", "doc_id")).alias("is_canonical"),
    )


# --------------------------------------------------------------------------
# Deterministic train/val/test split

SPLIT_BUCKETS = 100
SPLIT_TRAIN, SPLIT_VAL = 80, 90  # bucket < 80 train, < 90 val, else test


def _hash32_duck(col_sql: str) -> str:
    """DuckDB twin of operators/dedup.py::token_hash32_sql — first 8 md5
    hex nibbles as a 32-bit int via strpos (DuckDB strpos(str, ch) ==
    Spark locate(ch, str))."""
    h = f"md5({col_sql})"
    terms = " + ".join(
        f"(strpos('{HEX}', substr({h}, {p + 1}, 1)) - 1) * {16 ** (7 - p)}"
        for p in range(8)
    )
    return f"({terms})"


@register(
    "train_split",
    oracle=f"""
SELECT doc_id,
       CAST({_hash32_duck("CAST(doc_id AS VARCHAR)")} % {SPLIT_BUCKETS} AS BIGINT)
           AS bucket,
       CASE WHEN {_hash32_duck("CAST(doc_id AS VARCHAR)")} % {SPLIT_BUCKETS}
                 < {SPLIT_TRAIN} THEN 'train'
            WHEN {_hash32_duck("CAST(doc_id AS VARCHAR)")} % {SPLIT_BUCKETS}
                 < {SPLIT_VAL} THEN 'val'
            ELSE 'test' END AS split
FROM documents
""",
)
def train_split(spark, sf_dir):
    """Reproducible 80/10/10 split keyed on a content-independent stable
    hash of doc_id: the same document lands in the same slice on every
    engine, every run, at every scale — no rand(), no sampling state.

    Scale: pure projection (md5 of the key), no shuffle; downstream
    consumers filter on ``split`` and the predicate reaches the scan.
    """
    d = load_table(spark, sf_dir, "documents")
    h = F.expr(token_hash32_sql("CAST(doc_id AS STRING)"))
    bucket = (h % SPLIT_BUCKETS).cast("bigint")
    return d.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < SPLIT_TRAIN, "train")
        .when(bucket < SPLIT_VAL, "val")
        .otherwise("test")
        .alias("split"),
    )


# --------------------------------------------------------------------------
# Per-language quota sampling

QUOTA_PER_LANG = 25


def _quality_subquery() -> str:
    from .text_q import _Q_BASE_SQL, _quality_outputs

    return _quality_outputs("//").replace("__Q_BASE__", _Q_BASE_SQL)


@register(
    "quota_sample",
    oracle=f"""
WITH q AS ({_quality_subquery()}),
ranked AS (
    SELECT d.doc_id, d.lang, q.quality,
           ROW_NUMBER() OVER (PARTITION BY d.lang
                              ORDER BY q.quality DESC, d.doc_id) AS rn
    FROM documents d JOIN q ON q.doc_id = d.doc_id
)
SELECT doc_id, lang, quality, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= {QUOTA_PER_LANG}
""",
)
def quota_sample(spark, sf_dir):
    """Per-language quality quota: keep the top-N docs per language by
    the exact-integer quality score (text_q.py), doc_id tie-break — the
    "cap each language's volume, keep its best" sampling step of a
    multilingual corpus build.

    Scale: the rank<=N predicate on a row_number window compiles to
    WindowGroupLimit (per-partition top-N BEFORE the shuffle, as
    plan-tested for topn_parts_per_brand), so per-language work is
    bounded even though language cardinality is tiny relative to
    executor count.
    """
    from pyspark.sql.window import Window

    from .text_q import quality_score

    d = load_table(spark, sf_dir, "documents")
    q = quality_score(spark, sf_dir).select("doc_id", "quality")
    w = Window.partitionBy("lang").orderBy(F.col("quality").desc(), F.col("doc_id"))
    return (
        d.select("doc_id", "lang")
        .join(q, "doc_id")
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= QUOTA_PER_LANG)
    )


# --------------------------------------------------------------------------
# Mixture resampling to target proportions

# Target mixture in permille; languages not listed are dropped.
MIX_WEIGHTS = {"en": 500, "de": 150, "es": 150, "fr": 100, "zh": 100}


def _mix_case_sql() -> str:
    arms = " ".join(
        f"WHEN lang = '{k}' THEN {v}" for k, v in MIX_WEIGHTS.items()
    )
    return f"CASE {arms} ELSE 0 END"


@register(
    "mixture_resample",
    oracle=f"""
WITH base AS (
    SELECT doc_id, lang,
           {_hash32_duck("'mix:' || CAST(doc_id AS VARCHAR)")} AS h,
           {_mix_case_sql()} AS wt
    FROM documents
), counts AS (
    SELECT lang, wt, COUNT(*) AS n FROM base WHERE wt > 0 GROUP BY 1, 2
), tmax AS (
    SELECT MIN(n * 1000 // wt) AS t FROM counts
), caps AS (
    SELECT lang, wt * t // 1000 AS keep_n FROM counts, tmax
)
SELECT b.doc_id, b.lang, CAST(r.rn AS BIGINT) AS mix_rank
FROM (SELECT doc_id, lang, h FROM base WHERE wt > 0) b
JOIN (SELECT doc_id,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn
      FROM base WHERE wt > 0) r ON r.doc_id = b.doc_id
JOIN caps c ON c.lang = b.lang
WHERE r.rn <= c.keep_n
""",
)
def mixture_resample(spark, sf_dir):
    """Deterministic mixture resampling — the "hit the target data
    mixture" step of a corpus build: given per-language weights
    (permille), scale the corpus to the LARGEST total for which every
    language can fill its share from available docs (the binding
    language is kept whole, the rest downsample), then select each
    language's quota by stable hash rank. Everything is integer
    arithmetic (scaled-permille caps, hash ranks), so selection is
    reproducible across engines, runs, and scales.

    Scale: counts and caps are language-cardinality rows (broadcast);
    the hash-rank selection needs a per-language sort of (hash, id)
    pairs, not documents — at extreme scale the sort can be replaced
    by a hash-threshold cut (keep h below keep_n/n scaled into hash
    space), trading a few boundary docs for the sort; the exact-rank
    version is kept here because the quota, and therefore the oracle,
    is exact.
    """
    from pyspark.sql.window import Window

    from ..operators.dedup import token_hash32_sql

    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        "lang",
        F.expr(
            token_hash32_sql("CONCAT('mix:', CAST(doc_id AS STRING))")
        ).alias("h"),
        F.expr(_mix_case_sql()).alias("wt"),
    ).where(F.col("wt") > 0)
    # ONE corpus exchange serves everything: the hash-rank window needs
    # lang clustering anyway, and since wt is functional on lang the
    # per-(lang, wt) count is just COUNT(*) OVER (PARTITION BY lang) on
    # the same exchange. The binding total t = MIN(n*1000 div wt) over
    # rows equals the min over distinct languages (min is duplicate-
    # blind), so the old separate counts scan + groupBy + caps join
    # collapse into a window column, one tiny global agg, and an inline
    # cap comparison. Empty corpus: t is NULL, NULL cap filters all
    # rows — same empty result as the oracle's join against no caps.
    w = Window.partitionBy("lang").orderBy("h", "doc_id")
    win = (
        base.withColumn("mix_rank", F.row_number().over(w).cast("bigint"))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("lang")))
    )
    tmax = win.groupBy().agg(F.min(F.expr("n * 1000 div wt")).alias("t"))
    return (
        win.crossJoin(F.broadcast(tmax))
        .where(F.col("mix_rank") <= F.expr("wt * t div 1000"))
        .select("doc_id", "lang", "mix_rank")
    )


# --------------------------------------------------------------------------
# Greedy sequence packing

PACK_MAX_TOKENS = 512
PACK_SHARDS = 8

_PACK_TOKS = f"""
    SELECT doc_id,
           CAST({_hash32_duck("CAST(doc_id AS VARCHAR)")} % {PACK_SHARDS}
                AS BIGINT) AS shard,
           CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
               AS n_tokens
    FROM documents
    WHERE text IS NOT NULL
"""


@register(
    "pack_sequences_greedy",
    oracle=f"""
WITH RECURSIVE toks AS MATERIALIZED (
    SELECT doc_id, shard, n_tokens,
           ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
    FROM ({_PACK_TOKS})
), packed AS (
    SELECT doc_id, shard, n_tokens, rn,
           CAST(0 AS BIGINT) AS chunk_id, n_tokens AS chunk_fill
    FROM toks WHERE rn = 1
    UNION ALL
    SELECT t.doc_id, t.shard, t.n_tokens, t.rn,
           CASE WHEN p.chunk_fill + t.n_tokens > {PACK_MAX_TOKENS}
                THEN p.chunk_id + 1 ELSE p.chunk_id END,
           CASE WHEN p.chunk_fill + t.n_tokens > {PACK_MAX_TOKENS}
                THEN t.n_tokens ELSE p.chunk_fill + t.n_tokens END
    FROM packed p JOIN toks t ON t.shard = p.shard AND t.rn = p.rn + 1
)
SELECT doc_id, shard, chunk_id, n_tokens, chunk_fill FROM packed
""",
)
def pack_sequences_greedy(spark, sf_dir):
    """Greedy sequence packing — the "concatenate documents into
    fixed-budget training chunks" step of a pretraining pipeline: docs
    are sharded by a stable hash, walked in doc_id order within each
    shard, and a chunk closes when the next doc would push it past
    {PACK_MAX_TOKENS} whitespace tokens (docs are never split; an
    oversized doc gets its own chunk).

    The running-fill reset makes this NOT a window function — it is
    genuinely sequential state, so the Spark side is
    ``applyInPandas`` per shard (Arrow batch in, one O(n) pass in
    pandas, Arrow batch out) and the oracle is a recursive CTE walking
    ``rn``. All state is integer, so both walks agree exactly.

    Scale: the shard is the unit of parallelism — exactly how
    production packers run (one sequential pass per worker over its
    shard); 100 TB means more shards, never a longer pass. The shuffle
    key is the shard id; token counting happens map-side before the
    shuffle, so shuffled rows are (ids + 2 ints), not text.
    """
    import pandas as pd

    from ..operators.dedup import token_hash32_sql
    from ..functions.text import ws_token_count

    # NULL text carries no tokens — those docs sit out packing on both
    # engines (a real curation pass drops them upstream anyway); without
    # the guard the sequential kernel sees NaN and dies mid-shard
    d = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select(
            "doc_id",
            (F.expr(token_hash32_sql("CAST(doc_id AS STRING)")) % PACK_SHARDS)
            .cast("bigint")
            .alias("shard"),
            ws_token_count("text").alias("n_tokens"),
        )
    )

    max_tokens = PACK_MAX_TOKENS

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        chunk_ids, fills = [], []
        chunk, fill = 0, 0
        for t in pdf["n_tokens"]:
            t = int(t)
            if fill > 0 and fill + t > max_tokens:
                chunk += 1
                fill = t
            else:
                fill += t
            chunk_ids.append(chunk)
            fills.append(fill)
        pdf["chunk_id"] = pd.Series(chunk_ids, dtype="int64")
        pdf["chunk_fill"] = pd.Series(fills, dtype="int64")
        return pdf[["doc_id", "shard", "chunk_id", "n_tokens", "chunk_fill"]]

    return d.groupBy("shard").applyInPandas(
        _pack,
        "doc_id bigint, shard bigint, chunk_id bigint, "
        "n_tokens bigint, chunk_fill bigint",
    )


# --------------------------------------------------------------------------
# Benchmark contamination screening

CONTAM_SHINGLE_N = 5
N_BENCH_DOCS = 20  # docs with doc_id < this play the held-out benchmark

_CONTAM_SH = f"""
    SELECT DISTINCT doc_id,
           unnest(list_transform(
               generate_series(1, len(t) - {CONTAM_SHINGLE_N - 1}),
               i -> array_to_string(list_slice(t, i, i + {CONTAM_SHINGLE_N - 1}), ' ')))
               AS shingle
    FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
          FROM documents)
    WHERE len(t) >= {CONTAM_SHINGLE_N}
"""


# Shared oracle fragment: corpus/benchmark shingle split + per-doc hit
# counts — composed by contamination_check and corpus_curation.
CONTAM_CTES = f"""sh AS ({_CONTAM_SH}),
bench AS (
    SELECT DISTINCT shingle FROM sh WHERE doc_id < {N_BENCH_DOCS}
),
corpus_sh AS (SELECT * FROM sh WHERE doc_id >= {N_BENCH_DOCS}),
hits AS (
    SELECT c.doc_id, COUNT(*) AS n_hit
    FROM corpus_sh c JOIN bench b ON b.shingle = c.shingle
    GROUP BY 1
)"""


@register(
    "contamination_check",
    oracle=f"""
WITH {CONTAM_CTES}
SELECT s.doc_id,
       COUNT(*) AS n_shingles,
       COALESCE(MAX(h.n_hit), 0) AS n_contaminated,
       ROUND(CAST(COALESCE(MAX(h.n_hit), 0) AS DOUBLE) / COUNT(*), 4)
           AS contamination_rate
FROM corpus_sh s LEFT JOIN hits h ON h.doc_id = s.doc_id
GROUP BY s.doc_id
""",
)
def contamination_check(spark, sf_dir):
    """Eval-set leakage screen: for every corpus doc, the fraction of
    its word 5-grams that also occur in the benchmark set (here: the
    first {N_BENCH_DOCS} docs stand in for a held-out benchmark).
    Served from the MATERIALIZED screen output (contamination_table) —
    the screening job runs once per snapshot."""
    return contamination_table(spark, sf_dir)


def _contamination_build(spark, sf_dir):
    """The screening job itself. Scale: the benchmark shingle set is
    small by definition — it BROADCASTS, so the corpus-side shingle
    table never shuffles; per-doc counts aggregate map-side. The rate
    is one int/int division (no summation-order float risk). Scans the
    width-keyed shingle artifact (three consumers: bench set, corpus
    counts, hits join)."""
    from .dedup_q import shingles_table

    sh = shingles_table(spark, sf_dir, CONTAM_SHINGLE_N)
    bench = (
        sh.where(F.col("doc_id") < N_BENCH_DOCS).select("shingle").distinct()
    )
    corpus = sh.where(F.col("doc_id") >= N_BENCH_DOCS)
    hits = (
        corpus.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        corpus.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shingles"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_hit", F.lit(0)).alias("n_contaminated"),
            F.round(
                F.coalesce("n_hit", F.lit(0)) / F.col("n_shingles"), 4
            ).alias("contamination_rate"),
        )
    )


def contamination_table(spark, sf_dir):
    """Materialized contamination screen — the screening job's output,
    consumed by the curation composite (same build-once contract as
    dup_pairs_table / cluster_labels_table)."""
    return materialized(
        spark,
        os.path.join(sf_dir, "documents.parquet"),
        "contamination",
        lambda: _contamination_build(spark, sf_dir),
        params=f"n{CONTAM_SHINGLE_N}b{N_BENCH_DOCS}",
    )


# --------------------------------------------------------------------------
# Cross-modal dedup validation


@register(
    "neardup_embedding_check",
    oracle=f"""
WITH pairs AS (
    SELECT * FROM ({_minhash_oracle()}) q WHERE jaccard >= {DUP_JACCARD}
), e AS (
    -- NULL-safe norm (r11): Spark's fold NULL-propagates on NULL
    -- elements where list_dot_product errors; NULL norm fails the
    -- > 0 guard on both engines, so such vectors drop out identically
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           sqrt({ns_selfdot_sql("CAST(embedding AS DOUBLE[])")}) AS nrm
    FROM embeddings
    WHERE {ns_selfdot_sql("CAST(embedding AS DOUBLE[])")} > 0
)
SELECT p.id_a, p.id_b, p.jaccard,
       -- + 0.0 canonicalizes IEEE negative zero (the projection.py
       -- rule): a near-orthogonal text-dup pair rounds to +-0.0
       -- depending on the engine's accumulation seed. Caught by the
       -- sf1 audit, where cross-replica text dups with unrelated
       -- embeddings make tiny-negative cosines common.
       ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) + 0.0
           AS emb_sim
FROM pairs p
JOIN e a ON a.vec_id = p.id_a
JOIN e b ON b.vec_id = p.id_b
""",
)
def neardup_embedding_check(spark, sf_dir):
    """Cross-modal consistency probe — the check a curation pipeline
    runs before trusting EITHER detector: for every verified TEXT
    near-dup pair, the EMBEDDING cosine of the same two documents
    (doc_id joins vec_id; pairs without embeddings — including
    zero-norm embeddings, whose cosine is undefined — drop out). Text-dup
    pairs with low embedding similarity mean the embedding model (or
    the text normalizer) disagrees with the shingle view — exactly the
    pairs a human should sample.

    Scale: the pair list is the (small) verified near-dup set; both
    embedding fetches are joins keyed on the pair ids against the
    embedding table — no pairwise work beyond the pairs themselves.
    """
    from ..functions.vectors import dot, norm

    pairs = dup_pairs_table(spark, sf_dir)
    e = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding", norm("embedding").alias("nrm"))
        .where(F.col("nrm") > 0)
    )
    a = e.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = e.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            "jaccard",
            (
                F.round(dot("va", "vb") / (F.col("na") * F.col("nb")), 4)
                + F.lit(0.0)  # -0.0 -> +0.0, both engines (see oracle)
            ).alias("emb_sim"),
        )
    )
