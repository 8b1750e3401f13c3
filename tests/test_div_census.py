"""Static division-by-zero census (r9 verdict next-round #1): every
ANSI-throwing division/remainder/pmod site in every registered query's
ANALYZED plan, classified and pinned against an adjudicated allowlist
— closing the class the r9 fuzz campaign only sampled
(`q14_promo_revenue` / `q8_market_share`, both fixed with
``try_divide``), the way the r7 nullable-order-key sweep closed NULL
ordering.

Why the ANALYZED plan: this Spark build runs ANSI mode (default on in
4.x), where ``a / 0`` throws ``DIVIDE_BY_ZERO`` for EVERY numeric type
— including double/double — while DuckDB (the oracle semantics)
returns NULL. ``try_divide`` is only distinguishable from a throwing
``/`` in the analyzed plan; the optimizer rewrites it to a ``/`` whose
TRY eval mode is invisible in the string (verified empirically).

Adjudicated classes — each structurally-nonzero by construction:

* ``literal`` (allowed everywhere, filtered before classification):
  the denominator is a nonzero constant, possibly under nested casts
  (``/ 25.0``, ``% cast(7 as bigint)``, the 1e4 round-scale family).
* ``cosine-norm-product``: ``dot / (qn * nrm)`` where BOTH factors are
  L2 norms of frames filtered ``norm > 0`` upstream on both engines
  (zero-norm vectors carry no cosine direction — the exclusion is the
  documented semantics, mirrored in every oracle). Guard sites:
  similarity.py:592,608 (IVF), 843,850 (LSH), 668 (matmul prune +
  rescore), 978 (blocked matmul kernel -> na/nb);
  pq.py:349/357, 447/455, 599/607 (PQ tiers); vectors_q.py
  sim_topk_bruteforce (one shared filtered frame feeds both sides).
* ``jaccard-union``: ``n_common / n_union`` in incremental admission
  (dedup.py:417-425). ``n_a``/``n_b`` are ``COUNT(*)`` of non-empty
  shingle groups (>= 1) or ``raise_error`` when the sizes artifact has
  no row (dedup.py:387-406); ``n_union = n_a + n_b - n_common >=
  max(n_a, n_b) >= 1`` since ``n_common <= min(n_a, n_b)``.

Pandas-UDF interiors are invisible to plan strings, audited by grep
(one site): the matmul prune's ``(v @ qmat.T) / np.outer(vnorm,
qnorm)`` — inputs filtered ``norm > 0`` before ``mapInPandas``
(similarity.py:668), and numpy division never raises (it would yield
inf/nan, not an ANSI throw) — and its output is a PRUNE KEY only;
emitted sims come from the JVM-side rescore.

A NEW non-literal division in any plan fails this suite until it is
adjudicated here with a structurally-nonzero argument or rewritten to
``try_divide`` (NULL-on-zero, the DuckDB semantics).
"""

from __future__ import annotations

import importlib.util
import os
import re

from clickstream_pipeline_aws_kafka_docker_airflow__spark import registry

from conftest import SF_SMOKE

_spec = importlib.util.spec_from_file_location(
    "div_census",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "div_census.py",
    ),
)
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)
division_sites = _mod.division_sites
is_safe_literal = _mod.is_safe_literal

_CLASSES: list[tuple[str, re.Pattern[str]]] = [
    # both factors are norms of `norm > 0`-filtered frames (see module
    # docstring for the guard sites); matches the inline-recomputed
    # SQRT(aggregate(...)) fold and the aliased qn/nn/nrm/na/nb forms
    (
        "cosine-norm-product",
        re.compile(
            r"^/ \((qn|na) \* (nn|nrm|nb|SQRT\(aggregate\(zip_with\("
            r"embedding, embedding, )"
        ),
    ),
    ("jaccard-union", re.compile(r"^/ cast\(n_union as double\)$")),
    # --- IntegralDivide (` div `) classes, added r11: the generative
    # ANSI fuzzer (scripts/ansi_fuzzer.py) found `x div 0` throws
    # DIVIDE_BY_ZERO where DuckDB `//` returns NULL — and the r10
    # census never swept the `div` spelling. Adjudications:
    #
    # div-group-count: denominator is COUNT(*)/COUNT(1) of an existing
    #   group (or a product of such counts) — a group only exists with
    #   >= 1 row, so the count is >= 1. Sites: chi2 n/r/c; curation
    #   c/t permille scaling; dataset_card n_docs; key_skew n_rows
    #   (count window over rows being divided); repetition n_grams
    #   (COUNT of grams grouped per doc); session_transitions _tot;
    #   tfidf df (count of docs containing the term); trimmed_mean
    #   count(1).
    (
        "div-group-count",
        re.compile(
            r"^div (n|c|t|r|df|n_docs|n_rows|n_grams|_tot|count\(1\)"
            r"|\(\(cast\(1000 as bigint\) \* c\) \* t\)"
            r"|\(\(n \* r\) \* c\))$"
        ),
    ),
    # div-nullif-guarded: denominator is nullif(COUNT(x), 0) * scale —
    #   a zero count becomes NULL and `x div NULL` is NULL on BOTH
    #   engines (null propagation, no throw); the trunc4-avg pattern
    #   (functions/scalars.py:76).
    (
        "div-nullif-guarded",
        re.compile(r"^div cast\(\(nullif\(count\("),
    ),
    # div-filter-guarded: denominator filtered > 0 upstream on both
    #   engines — n_chars (curation_q.py priority sampling, WHERE
    #   n_chars > 0 mirrored in the oracle) and wt (pipeline_q.py
    #   mixture_resample, .where(wt > 0) / WHERE wt > 0).
    (
        "div-filter-guarded",
        re.compile(r"^div (n_chars|cast\(wt as bigint\))$"),
    ),
    # div-positive-sum-product: revenue_gini's (n * s) — n a group
    #   count >= 1, s = SUM of integer-cent o_totalprice, positive in
    #   the TPC-H domain (and the oracle computes the identical
    #   expression, so a hostile zero-mass stratum fails LOUDLY on
    #   both engines rather than silently diverging).
    ("div-positive-sum-product", re.compile(r"^div \(n \* s\)$")),
]

ALLOWED: dict[str, set[str]] = {
    "ann_topk_ivf": {"cosine-norm-product"},
    "ann_topk_ivfpq": {"cosine-norm-product"},
    "ann_topk_ivfpq_res": {"cosine-norm-product"},
    "ann_topk_lsh": {"cosine-norm-product"},
    "ann_topk_pq": {"cosine-norm-product"},
    "embed_neardup_cosine": {"cosine-norm-product"},
    "neardup_embedding_check": {"cosine-norm-product"},
    "sim_topk_bruteforce": {"cosine-norm-product"},
    "sim_topk_vectorized": {"cosine-norm-product"},
    "incremental_dedup_batch": {"jaccard-union"},
    # IntegralDivide sites (r11)
    "chi2_type_by_weekday": {"div-group-count"},
    "corpus_curation": {"div-group-count"},
    "quality_score": {"div-group-count"},
    "quota_sample": {"div-group-count"},
    "source_curation_stats": {"div-group-count", "div-nullif-guarded"},
    "dataset_card": {"div-group-count"},
    "key_skew_report": {"div-group-count"},
    "repetition_score": {"div-group-count"},
    "session_transitions": {"div-group-count"},
    "tfidf_top_terms": {"div-group-count"},
    "trimmed_mean_value": {"div-group-count"},
    "embed_norms_by_label": {"div-nullif-guarded"},
    "json_props_agg": {"div-nullif-guarded"},
    "label_centroid_inertia": {"div-nullif-guarded"},
    "multimodal_meta": {"div-nullif-guarded"},
    "q1_pricing_summary": {"div-nullif-guarded"},
    "text_stats_by_lang": {"div-nullif-guarded"},
    "mixture_resample": {"div-filter-guarded"},
    "priority_sample_weighted": {"div-filter-guarded"},
    "revenue_gini": {"div-positive-sum-product"},
}


def _classify(sig: str) -> str:
    for name, pat in _CLASSES:
        if pat.search(sig):
            return name
    return f"other:{sig[:160]}"


def test_division_census_matches_allowlist(spark):
    # wide Projects truncate at maxToStringFields and would HIDE sites
    prev = spark.conf.get("spark.sql.debug.maxToStringFields", "25")
    spark.conf.set("spark.sql.debug.maxToStringFields", "1000")
    try:
        unexpected: dict[str, object] = {}
        for name, fn in sorted(registry.queries().items()):
            plan = (
                fn(spark, SF_SMOKE)
                ._jdf.queryExecution()
                .analyzed()
                .toString()
            )
            assert "more fields" not in plan, (
                f"{name}: plan string truncated — census would be blind"
            )
            classes = {
                _classify(s)
                for s in division_sites(plan)
                if not is_safe_literal(s)
            }
            extra = classes - ALLOWED.get(name, set())
            if extra:
                unexpected[name] = sorted(extra)
        assert not unexpected, (
            "NEW non-literal division site(s) outside the adjudicated "
            "census — ANSI mode throws DIVIDE_BY_ZERO where DuckDB "
            "returns NULL (the q14/q8 class). Either record a "
            "structurally-nonzero-denominator argument in ALLOWED/"
            "_CLASSES or rewrite the site with F.try_divide: "
            f"{unexpected}"
        )
    finally:
        spark.conf.set("spark.sql.debug.maxToStringFields", prev)


# --- element_at census: the SECOND divergent ANSI class ------------------
#
# Probed r10: DuckDB `list_extract(xs, i)` returns NULL out-of-bounds
# while ANSI `element_at` throws (INVALID_ARRAY_INDEX). The adjacent
# classes are NOT divergent and need no census: decimal-overflow casts
# and temporal parse failures ERROR on BOTH engines (probed:
# `CAST(1e20 AS DECIMAL(24,8))` and `strptime('zz','%Y')` raise in
# DuckDB too), so cross-engine parity is preserved fail-loud there.
#
# Every element_at site is structurally in-range by construction:
# * generator.py:46,270,276 — `(r * len)::int + 1` with r in [0,1)
#   (shiftright-normalized hash) and `pmod(...)+1` page/referrer picks:
#   indices in [1, len].
# * pq.py:186,270-272 — `s+1` over a Python loop / sequence(0, n_sub-1)
#   against arrays built with exactly n_sub entries; the inner LUT
#   lookup `codes[s]+1` is in [1, 256] for any artifact written by
#   encode_pq (8-bit codes). A STALE artifact with wider codes throws
#   LOUDLY here — preferred over DuckDB's silent NULL, which would
#   corrupt distances instead of failing the read.
# * multimodal.py:47 — `doc_id % |types| + 1`; doc_id >= 0 in every
#   source (testdata, fuzz, generator), and Spark's sign-of-dividend %
#   only reaches index 0 for doc_id < 0.
# * maintenance.py:247 — tile = shiftright(morton, ...) of a
#   non-negative grid key: in [0, n_tiles-1].
ELEMENT_AT_ALLOWED = {
    "ann_topk_ivfpq",
    "ann_topk_ivfpq_res",
    "ann_topk_pq",
    "gen_synthetic_events",
    "kafka_payload_roundtrip",
    "media_frame_sample",
    "media_histogram",
}


def test_element_at_census_matches_allowlist(spark):
    found = set()
    for name, fn in sorted(registry.queries().items()):
        plan = (
            fn(spark, SF_SMOKE)
            ._jdf.queryExecution()
            .analyzed()
            .toString()
        )
        if "element_at(" in plan.replace("try_element_at(", ""):
            found.add(name)
    new = found - ELEMENT_AT_ALLOWED
    assert not new, (
        "NEW element_at site(s): ANSI throws on out-of-bounds where "
        "DuckDB list_extract returns NULL — adjudicate the index as "
        "structurally in-range here, or use F.try_element_at: "
        f"{sorted(new)}"
    )


def test_try_divide_sites_still_present(spark):
    """The two r9 fuzz-found fixes stay try_divide (analyzed-plan
    visible) — a refactor back to `/` would reopen the bug."""
    for qname in ("q14_promo_revenue", "q8_market_share"):
        plan = (
            registry.queries()[qname](spark, SF_SMOKE)
            ._jdf.queryExecution()
            .analyzed()
            .toString()
        )
        assert "try_divide(" in plan, f"{qname} lost its try_divide"
