"""Text-analysis queries over ``documents`` (LLM-data-pipeline ops):
exact dedup, per-language stats, token counting, language-ID heuristic,
quality scoring, document fingerprinting.

All expressions are portable regex/string ops so each query has a
byte-equivalent DuckDB oracle. No Python UDFs anywhere — at 100 TB these
run inside whole-stage codegen at scan speed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.text import (
    BPE_TOKEN_RE,
    LANG_MARKERS,
    PUNCT_RE,
    STOPWORD_RE,
    bpe_token_count,
    fingerprint_md5,
    lang_scores,
    punct_count,
    stopword_count,
    upper_count,
    ws_token_count,
)
from ..functions.scalars import dec_avg_trunc4, dec_avg_trunc4_sql
from ..io import load_table
from ..operators.scale import widen
from ..registry import register


def _docs_wide(spark, sf_dir):
    """documents scan widened to cluster parallelism for the
    compute-per-row queries: a single-row-group parquet file scans as
    ONE task no matter the core count (row groups cannot split across
    tasks — measured end to end in docs/SCALING_CURVE.json), so heavy
    string work over a narrow layout runs serial without this. widen()
    round-robins ONLY when the scan is narrower than the cluster — at
    production split counts it is a no-op, so the shuffle-free scale
    claims of these plans still hold where they matter.

    Policy (measured at sf0.1 AND sf1, r8): only queries whose per-row
    compute dominates take the widening exchange — repetition_score
    (0.64->0.33 s), pii_scrub (0.76->0.41), array_hof_suite
    (0.49->0.23), lang_id_heuristic, quality_score, token_profile,
    vocab_encode. Explode->groupBy chains (bigram, tfidf) and light
    projections (doc_fingerprint, chunk, text_stats) measured WORSE
    with it — the exchange plus its determinism sort costs more than
    the single-task scan stage saves — and keep the bare scan."""
    return widen(load_table(spark, sf_dir, "documents"))

_WS_TOKENS_SQL = "CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)"


@register(
    "dedup_exact_docs",
    oracle=r"""
SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS text_hash,
       MIN(doc_id) AS rep_doc_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY 1
""",
)
def dedup_exact_docs(spark, sf_dir):
    """ext_dedup_exact: hash-groupBy on normalized text; keeps the
    lowest doc_id as the canonical representative. One shuffle on the
    text hash (not the full text — narrow shuffle rows at 100 TB).

    Tier choice: README "Choosing a dedup tier" decision table.
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(fingerprint_md5("text").alias("text_hash"))
        .agg(
            F.min("doc_id").alias("rep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@register(
    "text_stats_by_lang",
    oracle=f"""
SELECT lang,
       COUNT(*) AS n_docs,
       {dec_avg_trunc4_sql("n_chars", "duckdb")} AS avg_chars,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       {dec_avg_trunc4_sql("n_tokens", "duckdb")} AS avg_tokens
FROM (SELECT lang, n_chars, {_WS_TOKENS_SQL} AS n_tokens FROM documents)
GROUP BY lang
""",
)
def text_stats_by_lang(spark, sf_dir):
    """ext_text_stats: per-language corpus statistics. Averages use the
    order-independent decimal construction (r1 hash-fail fix)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("lang", "n_chars", ws_token_count("text").alias("n_tokens"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            dec_avg_trunc4("n_chars").alias("avg_chars"),
            F.sum("n_tokens").alias("total_tokens"),
            dec_avg_trunc4("n_tokens").alias("avg_tokens"),
        )
    )


@register(
    "token_profile",
    oracle=f"""
SELECT doc_id,
       length(text) AS n_chars_calc,
       {_WS_TOKENS_SQL} AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '{BPE_TOKEN_RE}')) AS BIGINT) AS n_bpe_tokens
FROM documents
""",
)
def token_profile(spark, sf_dir):
    """ext_token_count: whitespace + BPE-ish regex token counts per doc."""
    d = _docs_wide(spark, sf_dir)
    return d.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_calc"),
        ws_token_count("text").alias("n_ws_tokens"),
        bpe_token_count("text").alias("n_bpe_tokens"),
    )


def _lang_case_sql() -> str:
    """CASE ladder picking the max-scoring language, ties -> earlier
    entry in LANG_MARKERS — mirrored exactly by the Spark when-ladder."""
    langs = list(LANG_MARKERS)
    clauses = []
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(f"s_{lang} >= s_{o}" for o in langs[i + 1:])
        clauses.append(f"WHEN {conds} THEN '{lang}'")
    return "CASE " + " ".join(clauses) + f" ELSE '{langs[-1]}' END"


_LANG_SCORES_SQL = ", ".join(
    f"CAST(len(regexp_extract_all(lower(text), '{pat}')) AS BIGINT) AS s_{lang}"
    for lang, pat in LANG_MARKERS.items()
)


@register(
    "lang_id_heuristic",
    oracle=f"""
SELECT doc_id, lang AS labeled_lang, {", ".join(f"s_{l}" for l in LANG_MARKERS)},
       {_lang_case_sql()} AS pred_lang
FROM (SELECT doc_id, lang, {_LANG_SCORES_SQL} FROM documents)
""",
)
def lang_id_heuristic(spark, sf_dir):
    """Language-ID by marker-lexicon hit counts (n-gram heuristic),
    argmax with deterministic tie-break."""
    d = _docs_wide(spark, sf_dir)
    scores = lang_scores("text")
    scored = d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[c.alias(f"s_{lang}") for lang, c in scores.items()],
    )
    langs = list(LANG_MARKERS)
    pred = None
    for i, lang in enumerate(langs[:-1]):
        cond = None
        for other in langs[i + 1:]:
            c = F.col(f"s_{lang}") >= F.col(f"s_{other}")
            cond = c if cond is None else (cond & c)
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    pred = pred.otherwise(langs[-1])
    return scored.withColumn("pred_lang", pred)


# Quality is a sum of rationals of small integers, so float rounding at
# a 4-dp tie (e.g. exactly 0.84025) is knife-edge unstable across
# engines (hit at sf0.1). Exact fix: one integer rational per output,
# truncated to 4 dp with integer division — bit-identical everywhere.
# quality = 0.4*min(t,100)/100 + 0.3*(c-p)/c + 0.3*min(5s,t)/t
#         = (4*min(t,100)*c*t + 300*(c-p)*t + 300*min(5s,t)*c) / (1000*c*t)
_Q_NUM = (
    "4 * LEAST(n_tokens, 100) * c * t + 300 * (c - punct) * t "
    "+ 300 * LEAST(5 * stops, t) * c"
)
_Q_DEN = "1000 * c * t"


def _ratio4(num: str, den: str, idiv: str) -> str:
    """Truncate num/den to 4 dp via integer division (`idiv` = 'div' on
    Spark, '//' on DuckDB)."""
    # CAST(... AS DOUBLE): Spark SQL parses a bare `10000.0` literal as
    # DECIMAL and would propagate decimal types through the division
    return f"(({num}) * 10000 {idiv} ({den})) / CAST(10000 AS DOUBLE)"


def _quality_outputs(idiv: str) -> str:
    return f"""
SELECT doc_id,
       n_tokens,
       {_ratio4("punct", "c", idiv)} AS punct_ratio,
       {_ratio4("uppers", "c", idiv)} AS upper_ratio,
       {_ratio4("stops", "t", idiv)} AS stopword_ratio,
       {_ratio4(_Q_NUM, _Q_DEN, idiv)} AS quality
FROM (
    SELECT doc_id, n_tokens, punct, uppers, stops,
           GREATEST(n_chars, 1) AS c, GREATEST(n_tokens, 1) AS t
    FROM __Q_BASE__
)
"""


_Q_BASE_SQL = f"""(
    SELECT doc_id,
           length(text) AS n_chars,
           {_WS_TOKENS_SQL} AS n_tokens,
           CAST(len(regexp_extract_all(text, '{PUNCT_RE}')) AS BIGINT) AS punct,
           CAST(len(regexp_extract_all(text, '[A-Z]')) AS BIGINT) AS uppers,
           CAST(len(regexp_extract_all(lower(text), '{STOPWORD_RE}')) AS BIGINT) AS stops
    FROM documents
)"""


@register(
    "quality_score",
    oracle=_quality_outputs("//").replace("__Q_BASE__", _Q_BASE_SQL),
)
def quality_score(spark, sf_dir):
    """ext quality scoring: length/punctuation/stopword heuristics
    combined into one bounded score, computed in exact integer
    arithmetic (see note above)."""
    d = _docs_wide(spark, sf_dir)
    base = d.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        ws_token_count("text").alias("n_tokens"),
        punct_count("text").alias("punct"),
        upper_count("text").alias("uppers"),
        stopword_count("text").alias("stops"),
    ).select(
        "doc_id", "n_tokens", "punct", "uppers", "stops",
        F.greatest(F.col("n_chars"), F.lit(1)).alias("c"),
        F.greatest(F.col("n_tokens"), F.lit(1)).alias("t"),
    )
    return base.select(
        "doc_id",
        "n_tokens",
        F.expr(_ratio4("punct", "c", "div")).alias("punct_ratio"),
        F.expr(_ratio4("uppers", "c", "div")).alias("upper_ratio"),
        F.expr(_ratio4("stops", "t", "div")).alias("stopword_ratio"),
        F.expr(_ratio4(_Q_NUM, _Q_DEN, "div")).alias("quality"),
    )


@register(
    "doc_fingerprint",
    oracle=r"""
SELECT doc_id,
       md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
FROM documents
""",
)
def doc_fingerprint(spark, sf_dir):
    """ext fingerprinting: md5 over whitespace-normalized lowercase text."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint_md5("text").alias("fp"))


REP_N = 3
REP_PERMILLE_FLAG = 100  # repetitive when the top 3-gram is >=10% of all

_REP_GRAMS_SQL = f"""
    SELECT doc_id,
           unnest(list_transform(
               generate_series(1, len(t) - {REP_N - 1}),
               i -> array_to_string(list_slice(t, i, i + {REP_N - 1}), ' ')))
               AS gram
    FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
          FROM documents)
    WHERE len(t) >= {REP_N}
"""


@register(
    "repetition_score",
    oracle=f"""
WITH grams AS ({_REP_GRAMS_SQL}),
per_gram AS (
    SELECT doc_id, gram, COUNT(*) AS c FROM grams GROUP BY 1, 2
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_grams,
       MAX(c) AS top_gram_count,
       CAST(MAX(c) * 1000 // SUM(c) AS BIGINT) AS rep_permille,
       MAX(c) * 1000 >= {REP_PERMILLE_FLAG} * SUM(c) AS is_repetitive
FROM per_gram GROUP BY doc_id
""",
)
def repetition_score(spark, sf_dir):
    """Degenerate-text detector — the "same phrase looping" filter of a
    corpus build: per document, the share of all word {REP_N}-grams
    (counted WITH multiplicity, unlike the dedup shingles) taken by the
    single most-repeated one. A high share means the doc is a loop, a
    template, or boilerplate padding. Score and flag are pure integer
    arithmetic (permille with integer division, cross-multiplied flag).

    Scale: a per-document metric must not shuffle the corpus — the max
    gram multiplicity is the longest run in the doc's SORTED gram
    array, computed by a Catalyst fold inside one projection. The
    whole query is scan + project: zero exchanges, zero explode (an
    earlier two-groupBy formulation shuffled every gram string twice;
    at 100 TB that is the difference between embarrassingly parallel
    and shuffling the corpus — plan pinned in tests/test_plans_r5.py).
    The "" fold seed can never equal a real gram (tokens from
    splitting trimmed non-empty text are non-empty).
    """
    d = _docs_wide(spark, sf_dir)
    base = d.select(
        "doc_id", F.split(F.trim(F.lower("text")), r"\s+").alias("t")
    ).where(F.size("t") >= REP_N)
    grams = F.expr(
        f"array_sort(transform(sequence(1, size(t) - {REP_N - 1}), "
        f"i -> concat_ws(' ', slice(t, i, {REP_N}))))"
    )
    top = F.expr(
        "aggregate("
        "  _grams,"
        "  named_struct('prev', '', 'run', CAST(0 AS BIGINT),"
        "               'best', CAST(0 AS BIGINT)),"
        "  (acc, x) -> named_struct("
        "    'prev', x,"
        "    'run', IF(x = acc.prev, acc.run + 1, CAST(1 AS BIGINT)),"
        "    'best', GREATEST(acc.best,"
        "            IF(x = acc.prev, acc.run + 1, CAST(1 AS BIGINT)))),"
        "  acc -> acc.best)"
    )
    return (
        base.select("doc_id", grams.alias("_grams"))
        .select(
            "doc_id",
            F.size("_grams").cast("bigint").alias("n_grams"),
            top.alias("top_gram_count"),
        )
        .select(
            "doc_id",
            "n_grams",
            "top_gram_count",
            F.expr("top_gram_count * 1000 div n_grams").alias("rep_permille"),
            F.expr(
                f"top_gram_count * 1000 >= {REP_PERMILLE_FLAG} * n_grams"
            ).alias("is_repetitive"),
        )
    )


BIGRAM_TOP_K = 50


@register(
    "bigram_top",
    oracle=rf"""
WITH t AS (
    SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS toks
    FROM documents
), s AS (
    SELECT toks,
           unnest(generate_series(1, CAST(len(toks) - 1 AS BIGINT))) AS i
    FROM t
    WHERE len(toks) >= 2
)
SELECT toks[i] AS w1, toks[i + 1] AS w2, COUNT(*) AS n_pairs
FROM s
GROUP BY 1, 2
ORDER BY n_pairs DESC, w1, w2
LIMIT {BIGRAM_TOP_K}
""",
)
def bigram_top(spark, sf_dir):
    """Corpus-wide top bigrams — the collocation profile a data-quality
    pass reads before choosing tokenizer merges or boilerplate filters
    (the 2-gram sibling of the unigram ``top_tokens``).

    Scale: adjacent-pair fan-out is a pure map stage (one ``transform``
    over the already-split token array — no self-join, no window); the
    only shuffle keys on (w1, w2), which partial-aggregates map-side,
    so skewed common-word pairs ship one partial row per partition, not
    one row per occurrence. The final top-K is a TakeOrdered over the
    grouped counts (exact integers + full tie-break ordering -> one
    deterministic cross-engine prefix), not a global sort of the pairs.
    """
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        F.split(F.trim(F.lower("text")), r"\s+").alias("t")
    ).where(F.size("t") >= 2)
    pairs = base.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1), "
                "i -> struct(t[i - 1] AS w1, t[i] AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    return (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy(F.desc("n_pairs"), "w1", "w2")
        .limit(BIGRAM_TOP_K)
    )


@register(
    "array_hof_suite",
    oracle=r"""
WITH t AS (
    SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
    FROM documents
)
SELECT doc_id,
       CAST(len(list_filter(toks, x -> length(x) > 3)) AS BIGINT)
           AS n_long_tokens,
       CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT)
           AS total_chars,
       array_to_string(list_transform(list_slice(toks, 1, 3), x -> upper(x)), '-')
           AS first3_upper,
       CAST(list_max(list_transform(toks, x -> length(x))) AS BIGINT)
           AS longest_token,
       list_contains(toks, 'spark') AS mentions_spark
FROM t
""",
)
def array_hof_suite(spark, sf_dir):
    """Higher-order array-function family over the token arrays —
    filter, transform, slice, fold (aggregate), max reduction, and
    membership — each as pure Catalyst HOF exprs with DuckDB ``list_*``
    twins. One projection, no explode, no shuffle (beyond the widening
    round-robin when the input layout is narrower than the cluster)."""
    d = _docs_wide(spark, sf_dir)
    toks = F.split(F.trim(F.lower("text")), r"\s+")
    return d.select(
        "doc_id",
        F.size(F.filter(toks, lambda x: F.length(x) > 3))
        .cast("bigint")
        .alias("n_long_tokens"),
        F.aggregate(
            toks, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
        ).alias("total_chars"),
        F.array_join(
            F.transform(F.slice(toks, 1, 3), lambda x: F.upper(x)), "-"
        ).alias("first3_upper"),
        F.array_max(F.transform(toks, lambda x: F.length(x)))
        .cast("bigint")
        .alias("longest_token"),
        F.array_contains(toks, "spark").alias("mentions_spark"),
    )


# ---------------------------------------------------------------------------
# Inverted index + conjunctive keyword search

# Probe conjunction: docs mentioning ALL of these (AND semantics).
SEARCH_TERMS = ("spark", "batch", "window")


def inverted_index_table(spark, sf_dir):
    """Materialized inverted index: token -> (df, sorted posting list).
    Built once per snapshot (one explode + one aggregate over the
    corpus); conjunctive queries then touch ONLY the probed tokens'
    rows — parquet predicate pushdown on the token column makes a
    k-term search an O(k posting lists) read, never a corpus scan."""
    import os

    from ..operators.artifacts import materialized

    def _build():
        tk = (
            load_table(spark, sf_dir, "documents")
            .select(
                "doc_id",
                F.explode(
                    F.split(F.trim(F.lower("text")), r"\s+")
                ).alias("token"),
            )
            .where(F.col("token") != "")
            .distinct()
        )
        return tk.groupBy("token").agg(
            F.count(F.lit(1)).cast("bigint").alias("df"),
            F.sort_array(F.collect_list("doc_id")).alias("postings"),
        )

    return materialized(
        spark,
        os.path.join(sf_dir, "documents.parquet"),
        "inverted_index",
        _build,
        params="v1",
    )


_TOKS = r"regexp_split_to_array(trim(lower(text)), '\s+')"


def _search_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in SEARCH_TERMS)
    return f"""
WITH tk AS (
    SELECT DISTINCT doc_id, token
    FROM (SELECT doc_id, unnest({_TOKS}) AS token FROM documents)
    WHERE token IN ({terms})
)
SELECT d.doc_id, d.lang, d.source
FROM (SELECT doc_id FROM tk GROUP BY doc_id
      HAVING COUNT(*) = {len(SEARCH_TERMS)}) m
JOIN documents d USING (doc_id)
"""


@register("keyword_search_conj", oracle=_search_oracle())
def keyword_search_conj(spark, sf_dir):
    """Conjunctive (AND) keyword search served from the materialized
    inverted index: explode the probed tokens' posting lists, keep
    doc_ids appearing in all k lists, then fetch metadata for the hits
    only. The index read is filter-pushed to exactly k token rows; the
    intersection is a groupBy over the union of those posting lists
    (bounded by the sum of the k dfs, not the corpus); the metadata
    join touches matching docs only. At 100 TB the index is
    token-partitioned parquet and a search never scans the corpus."""
    idx = inverted_index_table(spark, sf_dir).where(
        F.col("token").isin(*SEARCH_TERMS)
    )
    hits = (
        idx.select(F.explode("postings").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("k"))
        .where(F.col("k") == len(SEARCH_TERMS))
        .select("doc_id")
    )
    d = load_table(spark, sf_dir, "documents")
    return hits.join(d, "doc_id").select("doc_id", "lang", "source")
