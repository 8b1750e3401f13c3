"""Training-data preparation operators: token chunking, distinctive
terms, behavioral transition model, vocabulary spectrum, and
embedding-space (semantic) deduplication.

These extend the LLM-pipeline surface (SURVEY.md §2.5 north-star ops)
with the steps that sit between a curated corpus and a training run:
cutting documents into model-context-sized chunks, profiling what makes
a source distinctive, and dropping semantically redundant items the
text-level dedups (MinHash/SimHash — operators/dedup.py) cannot see.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load_table
from ..operators.similarity import IVF_NCENTROIDS, ivf_assignments
from ..functions.vectors import dot, norm
from ..registry import register

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24  # < CHUNK_TOKENS -> overlapping context windows

_TOKS_SQL = "regexp_split_to_array(trim(lower(text)), '\\s+')"


@register(
    "chunk_documents",
    oracle=f"""
WITH t AS (
    SELECT doc_id, {_TOKS_SQL} AS toks, len({_TOKS_SQL}) AS n
    FROM documents
), s AS (
    SELECT doc_id, toks, n,
           unnest(generate_series(0, CAST(n - 1 AS BIGINT), {CHUNK_STRIDE}))
               AS start
    FROM t
)
SELECT doc_id,
       CAST(start // {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
       CAST(start AS BIGINT) AS start_tok,
       CAST(LEAST({CHUNK_TOKENS}, n - start) AS BIGINT) AS n_tok,
       array_to_string(toks[start + 1 : start + {CHUNK_TOKENS}], ' ')
           AS chunk_text
FROM s
""",
)
def chunk_documents(spark, sf_dir):
    """Strided token chunking — the sequence-prep step that turns a
    document into model-context-sized windows (here {CHUNK_TOKENS}
    tokens with stride {CHUNK_STRIDE}, so consecutive chunks overlap by
    {CHUNK_TOKENS - CHUNK_STRIDE} tokens of context).

    Scale: one projection + one posexplode — no shuffle, no window; the
    fan-out per document is ceil(n_tokens / stride) rows whose text
    slices reference the already-tokenized array. At 100 TB this is a
    pure map stage that chains onto the curation output and writes
    straight to the packed-sequence step (pipeline_q.pack_sequences).
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower("text")), r"\s+")
    base = d.select("doc_id", toks.alias("toks"), F.size(toks).alias("n"))
    starts = F.sequence(
        F.lit(0), F.col("n") - 1, F.lit(CHUNK_STRIDE)
    )
    return base.select(
        "doc_id",
        "toks",
        "n",
        F.posexplode(starts).alias("chunk_id", "start"),
    ).select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.col("start").cast("bigint").alias("start_tok"),
        F.least(F.lit(CHUNK_TOKENS), F.col("n") - F.col("start"))
        .cast("bigint")
        .alias("n_tok"),
        F.array_join(
            F.slice("toks", F.col("start") + 1, F.lit(CHUNK_TOKENS)), " "
        ).alias("chunk_text"),
    )


TFIDF_TOP_K = 5


@register(
    "tfidf_top_terms",
    oracle=f"""
WITH tok AS (
    SELECT doc_id, source, unnest({_TOKS_SQL}) AS token
    FROM documents
), tok2 AS (
    SELECT doc_id, source, token FROM tok WHERE token <> ''
), tf AS (
    SELECT source, token, COUNT(*) AS tf
    FROM tok2 GROUP BY source, token
), df AS (
    SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok2 GROUP BY token
), scored AS (
    SELECT tf.source, tf.token, tf.tf, df.df,
           CAST(tf.tf * (SELECT COUNT(*) FROM documents) // df.df AS BIGINT)
               AS score
    FROM tf JOIN df ON df.token = tf.token
)
SELECT source, token, tf, df, score, CAST(rn AS BIGINT) AS rn
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY source ORDER BY score DESC, token) AS rn
    FROM scored
)
WHERE rn <= {TFIDF_TOP_K}
""",
)
def tfidf_top_terms(spark, sf_dir):
    """Most distinctive terms per source: tf-idf with a LINEAR inverse
    document frequency — score = tf * N_docs // df in exact integer
    arithmetic (a log idf would put a cross-engine float knife-edge
    under the ranking; the linear variant orders rare-but-frequent-here
    terms the same way and stays bit-stable). Top {TFIDF_TOP_K} per
    source, ties on token.

    Scale: the corpus is tokenized and exploded ONCE — the compact
    (token, source, doc_id, tf) rollup is materialized with
    localCheckpoint (the connected_components pattern) and BOTH
    downstream aggregates read it, because Catalyst cannot deduplicate
    the two branches itself: column pruning rewrites the
    document-frequency branch to a distinct (no count), so the two
    first-level subtrees never canonicalize equal and ReuseExchange
    never fires — without the checkpoint the heaviest map stage in the
    whole query (tokenize + explode the corpus) runs twice. Keys stay
    short and uniform; the per-source ranking compiles to
    WindowGroupLimit (per-partition top-K before the shuffle), so the
    full vocabulary never sorts globally. The N_docs scalar joins in as
    a broadcast literal row. (A doc has exactly one source, so the
    rollup's (token, doc_id) pairs are unique and df is a plain count.)
    """
    d = load_table(spark, sf_dir, "documents")
    tok = (
        d.select(
            "doc_id",
            "source",
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token"),
        )
        .where(F.col("token") != "")
    )
    g1 = (
        tok.groupBy("token", "source", "doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    tf = g1.groupBy("source", "token").agg(F.sum("c").alias("tf"))
    dfreq = g1.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.groupBy().agg(F.count(F.lit(1)).alias("n_total"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "source",
            "token",
            "tf",
            "df",
            F.expr("CAST(tf * n_total div df AS BIGINT)").alias("score"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.col("score").desc(), "token")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= TFIDF_TOP_K)
        .select("source", "token", "tf", "df", "score", "rn")
    )


@register(
    "session_transitions",
    oracle="""
WITH s AS (
    SELECT user_id, event_type AS from_et,
           LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS to_et
    FROM events
), c AS (
    SELECT from_et, to_et, COUNT(*) AS n
    FROM s WHERE to_et IS NOT NULL
    GROUP BY from_et, to_et
)
SELECT from_et, to_et, n,
       CAST(n * 1000 // SUM(n) OVER (PARTITION BY from_et) AS BIGINT)
           AS permille
FROM c
""",
)
def session_transitions(spark, sf_dir):
    """First-order behavioral model: event-type bigram counts and
    per-origin transition permilles over each user's time-ordered
    stream (LEAD over (user, ts)) — the Markov-chain view of the
    clickstream that funnels and retention queries summarize.

    Scale: the heavy window partitions by user_id (high-cardinality,
    uniform); everything after operates on the |event_types|^2 bigram
    table, which is tiny by construction. Permille is integer-exact —
    no float division under the oracle hash.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select(
            F.col("event_type").alias("from_et"),
            F.lead("event_type").over(w).alias("to_et"),
        )
        .where(F.col("to_et").isNotNull())
        .groupBy("from_et", "to_et")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy("from_et")
    # integer `div`, not float `/` + cast: a quotient landing within an
    # ulp of an integer would truncate differently across engines
    return (
        pairs.withColumn("_tot", F.sum("n").over(tot))
        .withColumn("permille", F.expr("CAST((n * 1000) div _tot AS BIGINT)"))
        .select("from_et", "to_et", "n", "permille")
    )


@register(
    "token_freq_spectrum",
    oracle=f"""
WITH tok AS (
    SELECT unnest({_TOKS_SQL}) AS token FROM documents
), tc AS (
    SELECT token, COUNT(*) AS c FROM tok WHERE token <> '' GROUP BY token
)
SELECT c AS freq, COUNT(*) AS n_tokens
FROM tc GROUP BY c
""",
)
def token_freq_spectrum(spark, sf_dir):
    """Frequency-of-frequencies (the Zipf/Good-Turing spectrum): how
    many distinct tokens occur exactly c times. The one-glance corpus
    diagnostic for vocabulary health — a missing singleton tail or a
    spike at one frequency means degenerate or templated text.

    Scale: two cascaded aggregations, each with map-side partial
    combine; the second groups the (token, count) table by count — a
    key space no wider than the max token frequency.
    """
    d = load_table(spark, sf_dir, "documents")
    tc = (
        d.select(
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token")
        )
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return tc.groupBy(F.col("c").alias("freq")).agg(
        F.count(F.lit(1)).alias("n_tokens")
    )


SEMDEDUP_TAU = 0.35  # driver-data dial; production embeddings use ~0.9
_E = "CAST(embedding AS DOUBLE[])"


@register(
    "semantic_dedup",
    oracle=f"""
WITH e AS (
    SELECT vec_id, {_E} AS v,
           sqrt(list_dot_product({_E}, {_E})) AS nrm
    FROM embeddings
), cent AS (
    SELECT vec_id AS centroid_id, v AS cvec FROM e
    WHERE vec_id < {IVF_NCENTROIDS}
), a AS (
    SELECT e.vec_id, centroid_id,
           ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY list_dot_product(v, v) - 2 * list_dot_product(v, cvec)
                        + list_dot_product(cvec, cvec),
                        centroid_id) AS crank
    FROM e CROSS JOIN cent
), cells AS (
    SELECT vec_id, centroid_id FROM a WHERE crank = 1
), dropped AS (
    SELECT DISTINCT cb.vec_id
    FROM cells ca
    JOIN cells cb ON ca.centroid_id = cb.centroid_id
                 AND ca.vec_id < cb.vec_id
    JOIN e ea ON ea.vec_id = ca.vec_id
    JOIN e eb ON eb.vec_id = cb.vec_id
    WHERE ROUND(list_dot_product(ea.v, eb.v) / (ea.nrm * eb.nrm), 4)
          >= {SEMDEDUP_TAU}
)
SELECT c.vec_id, c.centroid_id AS cell,
       (d.vec_id IS NULL) AS is_kept
FROM cells c LEFT JOIN dropped d ON d.vec_id = c.vec_id
""",
)
def semantic_dedup(spark, sf_dir):
    """Embedding-space deduplication (SemDeDup, Abbas et al. 2023,
    arXiv:2303.09540): cluster the corpus into cells with the IVF
    coarse quantizer, compare pairs only WITHIN a cell, and drop every
    vector that has a lower-id cell-mate with cosine >= tau. Catches
    paraphrases and re-encodings that text-level MinHash/SimHash
    (operators/dedup.py) cannot see.

    Scale shape — identical to IVF search: the self-join shuffles on
    the cell id, per-cell work is quadratic in CELL size (corpus/n_cells
    on average), never corpus^2; vectors travel into exactly one cell.
    tau={SEMDEDUP_TAU} is a driver-data dial (these synthetic
    embeddings are near-random, max cosine ~0.5); production corpora
    use ~0.9+ with the same plan. Cosine is rounded to 4 dp before the
    threshold compare — the same deterministic cross-engine contract as
    every similarity query here.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    cells = ivf_assignments(emb, IVF_NCENTROIDS, n_iters=0, top=1).select(
        "vec_id", "centroid_id"
    )
    base = emb.select(
        "vec_id", "embedding", norm("embedding").alias("nrm")
    ).join(cells, "vec_id")
    a = base.select(
        F.col("centroid_id").alias("cell"),
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = base.select(
        F.col("centroid_id").alias("cell"),
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    sim = F.round(dot("va", "vb") / (F.col("na") * F.col("nb")), 4)
    dropped = (
        a.join(b, "cell")
        .where(F.col("id_a") < F.col("id_b"))
        .where(sim >= SEMDEDUP_TAU)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    return (
        base.select("vec_id", F.col("centroid_id").alias("cell"))
        .join(
            dropped.select(F.col("vec_id"), F.lit(False).alias("_drop")),
            "vec_id",
            "left",
        )
        .select(
            "vec_id", "cell", F.coalesce("_drop", F.lit(True)).alias("is_kept")
        )
    )
