"""Cross-ENGINE fuzz: seeded random hostile frames, Spark vs DuckDB.

The committed adversarial fixture is handcrafted; this fuzz samples the
same hostile space randomly (NULL-dense columns, tiny tie-heavy
timestamp pools, few users, duplicate values) so tie-break and
NULL-placement classes the fixture happens not to spell still get
exercised. Deterministic seeds — a failure reproduces exactly.

Targets are the shapes with the worst cross-engine track record this
round: gap sessionization, interval union, the analytic-function
window suite, and the as-of join.
"""

from __future__ import annotations

import datetime as dt
import os
import random
import shutil

import duckdb
import pytest

import __spark_entry__ as E
from clickstream_pipeline_aws_kafka_docker_airflow__spark.io import TABLES
from clickstream_pipeline_aws_kafka_docker_airflow__spark.testing import compare_frames

from tests.test_layout_invariance import ADV_SF

# default seeds are FIXED (a failure reproduces exactly, CI is
# deterministic); FUZZ_SEEDS=66,77,... runs a fresh campaign without
# touching the committed defaults — used for per-round extended sweeps
SEEDS = [
    int(s)
    for s in os.environ.get("FUZZ_SEEDS", "11,22,33,44,55").split(",")
    if s.strip()
]


def _fuzz_events(rng: random.Random, n: int = 120) -> list[tuple]:
    """Hostile events: 8 users (hot ties), a 40-slot ts pool (forced
    duplicates), ~15% NULLs per nullable column."""
    base = dt.datetime(2024, 1, 1)
    ts_pool = [
        base + dt.timedelta(minutes=rng.randrange(0, 3000)) for _ in range(40)
    ]
    rows = []
    for i in range(n):
        user = None if rng.random() < 0.15 else rng.randrange(8)
        # user 7 NEVER has a timestamp: the all-NULL-ts user is the
        # case that flushes NULL aggregates (NULL recency, no first
        # touch, no sessions) into every downstream ranking — random
        # 15% NULLs alone make this user vanishingly rare
        ts = (
            None
            if (user == 7 or rng.random() < 0.15)
            else rng.choice(ts_pool)
        )
        etype = (
            None
            if rng.random() < 0.15
            else rng.choice(["view", "click", "purchase", "signup", "error"])
        )
        value = None if rng.random() < 0.15 else round(rng.uniform(-5, 50), 2)
        props = None if rng.random() < 0.2 else '{"k": %d}' % rng.randrange(20)
        rows.append((i, ts, user, etype, value, props))
    return rows


def _fuzz_orders(rng: random.Random, n: int = 60) -> list[tuple]:
    # 0..550 days from 1996-01-01 reaches the q10 quarter
    # (1996-10-01..1997-01-01) and crosses the q4/q12 year boundary
    base = dt.datetime(1996, 1, 1)
    date_pool = [base + dt.timedelta(days=rng.randrange(0, 550)) for _ in range(15)]
    pri = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW", None]
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                None if rng.random() < 0.1 else rng.randrange(10),
                rng.choice(["O", "F", None]),
                None if rng.random() < 0.15 else round(rng.uniform(100, 9999), 2),
                None if rng.random() < 0.15 else rng.choice(date_pool),
                rng.choice(pri),
            )
        )
    return rows


def _write_ref_schema(rows, table, path):
    """Write rows under the EXACT committed-fixture arrow schema (the
    loaders only normalize the events table's timestamp unit, so a
    pandas default ns-timestamp would surface as BIGINT elsewhere)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pq.read_schema(f"{ADV_SF}/{table}.parquet")
    cols = list(zip(*rows)) if rows else [[] for _ in schema.names]
    arrays = [pa.array(list(c), type=f.type) for c, f in zip(cols, schema)]
    pq.write_table(pa.Table.from_arrays(arrays, schema=schema), path)


@pytest.fixture(scope="module")
def fuzz_dirs(spark, tmp_path_factory):
    """One sf-dir per seed: adv_sf tables with fuzzed events + orders."""
    dirs = {}
    for seed in SEEDS:
        rng = random.Random(seed)
        root = tmp_path_factory.mktemp(f"fuzz{seed}")
        for t in TABLES:
            shutil.copy(f"{ADV_SF}/{t}.parquet", root / f"{t}.parquet")
        _write_ref_schema(_fuzz_events(rng), "events", root / "events.parquet")
        _write_ref_schema(_fuzz_orders(rng), "orders", root / "orders.parquet")
        dirs[seed] = str(root)
    return dirs


FUZZ_QUERIES = [
    "sessionize_30min",
    "session_transitions",
    "interval_union_coverage",
    "user_journeys",
    "window_funcs_suite",
    "asof_last_purchase",
    "kpi_cube",
    "ewma_hourly",
    "sliding_window_hourly",
    "hll_range_distinct",
    "json_props_agg",
    "session_trigrams",
    # r7 widening — the families the first wave skipped, highest-risk
    # first: order statistics (median/percentile rank arithmetic over
    # tie-heavy NULL-dense values), quantile cuts, rank-weighted sums,
    # window-first attribution, lifecycle digest diffs, range joins,
    # and the census-flagged anomaly screen
    "mad_outliers",
    "value_percentiles",
    "trimmed_mean_value",
    "revenue_gini",
    "rfm_segments",
    "retention_cohorts",
    "funnel_conversion",
    "first_touch_attribution",
    "snapshot_diff",
    "user_erasure_report",
    "scd2_tier_join",
    "hourly_anomalies",
    "range_join_windows",
    "local_tz_daily",
    # r7 second widening: the REST of the events-reading oracled
    # surface, so every events query faces random hostile frames, not
    # only the handcrafted fixture
    "chi2_type_by_weekday",
    "cms_range_topk",
    "date_parse_multi",
    "expectations_audit",
    "join_outer_daily",
    "key_skew_report",
    "kpi_daily",
    "kpi_daily_approx",
    "kpi_grouping_sets",
    "kpi_hourly",
    "kpi_single_day",
    "pagerank_props",
    "pivot_event_counts",
    "rolling_7d_kpis",
    "scalar_suite",
    "setops_users",
    "time_arith_suite",
    "top_tokens",
    "unpivot_kpi_metrics",
    "value_histogram",
    "tumbling_hourly",
    "hll_audience_overlap",
    "cms_heavy_hitters",
    "kafka_payload_roundtrip",
    "value_percentiles_approx",
]


def _fuzz_documents(rng: random.Random, n: int = 50) -> list[tuple]:
    """Hostile documents from a casefold-stable vocabulary (ASCII,
    Latin-1 accents, CJK, emoji — tests/test_unicode_casefold.py pins
    the stability precondition) with NULLs, empties, whitespace soup,
    planted exact duplicates, and ~10% near-duplicates."""
    vocab = (
        "the fast key order sort table scan merge data café naïve "
        "中文 分析 emoji😀 test ALL-CAPS MiXeD 123 !!! a"
    ).split()
    texts: list[str | None] = []
    for i in range(n):
        r = rng.random()
        if r < 0.08:
            texts.append(None)
        elif r < 0.14:
            texts.append(rng.choice(["", "   ", "\t\n"]))
        elif r < 0.24 and texts:
            # near-dup or exact dup of an earlier doc
            prev = next(
                (t for t in reversed(texts) if t), "the fast key"
            )
            texts.append(prev if rng.random() < 0.5 else prev + " extra")
        else:
            texts.append(
                " ".join(rng.choice(vocab) for _ in range(rng.randrange(3, 40)))
            )
    langs = ["en", "es", "de", "fr", "zh", None, "xx"]
    rows = []
    for i, t in enumerate(texts):
        rows.append(
            (
                i,
                t,
                rng.choice(langs),
                None if rng.random() < 0.1 else f"src{rng.randrange(4)}",
                None if t is None else len(t),
            )
        )
    return rows


DOC_FUZZ_QUERIES = [
    "text_stats_by_lang",
    "token_profile",
    "lang_id_heuristic",
    "quality_score",
    "dedup_exact_docs",
    "doc_fingerprint",
    "repetition_score",
    "bigram_top",
    # artifact-served detectors: each fuzz dir builds its own snapshot
    # artifacts (keyed on source identity), so the full banded-MinHash
    # and verified-pair chains race their SQL twins on random input
    "dedup_near_minhash",
    "ngram_jaccard_pairs",
    "incremental_dedup_batch",
    "dedup_clusters",
    # df derived from the (source, token) rollup (one source per doc):
    # fuzz the NULL-source / NULL-text / dup-heavy space against the
    # two-CTE SQL twin
    "tfidf_top_terms",
    # r7 second widening: the REST of the documents-reading oracled
    # surface (text analysis, curation chain, simhash/ppjoin detectors,
    # the sequential packer)
    "chunk_documents",
    "contamination_check",
    "keyword_search_conj",
    "keyword_textrank",
    "pii_scrub",
    "string_suite",
    "token_freq_spectrum",
    "top_tokens_per_lang",
    "vocab_encode",
    "train_split",
    "quota_sample",
    "priority_sample_weighted",
    "mixture_resample",
    "dataset_card",
    "source_curation_stats",
    "corpus_curation",
    "simhash_fingerprints",
    "simhash_near_dup",
    "ppjoin_shingle_pairs",
    "pack_sequences_greedy",
    # r8 widening: the final documents-reading stragglers — the HOF
    # suite and the multimodal family (the forged-container decode and
    # its closed-form oracles race on random doc lengths/NULLs too);
    # after this only gen_synthetic_events stays un-fuzzed (it reads
    # no table — the generator IS its own deterministic input)
    "array_hof_suite",
    "multimodal_meta",
    "media_frame_sample",
    "media_histogram",
]


@pytest.fixture(scope="module")
def doc_fuzz_dirs(spark, tmp_path_factory):
    dirs = {}
    for seed in SEEDS[:3]:
        rng = random.Random(seed + 1000)
        root = tmp_path_factory.mktemp(f"docfuzz{seed}")
        for t in TABLES:
            shutil.copy(f"{ADV_SF}/{t}.parquet", root / f"{t}.parquet")
        _write_ref_schema(
            _fuzz_documents(rng), "documents", root / "documents.parquet"
        )
        dirs[seed] = str(root)
    return dirs


@pytest.mark.parametrize("name", DOC_FUZZ_QUERIES)
def test_crossengine_doc_fuzz(spark, doc_fuzz_dirs, name):
    for seed, sf in doc_fuzz_dirs.items():
        sdf = E.queries()[name](spark, sf).toPandas()
        con = duckdb.connect(":memory:")
        try:
            for t in TABLES:
                con.sql(
                    f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{sf}/{t}.parquet')"
                )
            ddf = con.sql(E.oracle_sql()[name]).df()
        finally:
            con.close()
        problems = compare_frames(sdf, ddf)
        assert not problems, (
            f"[{name}] seed={seed} doc-fuzz mismatch:\n" + "\n".join(problems)
        )


def _fuzz_lineitem(rng: random.Random, n: int = 150) -> list[tuple]:
    """Hostile order lines: NULLs in every nullable column, x.xx5
    decimal knife-edge prices, discount 0/1 bounds, shipdates on the
    q1/q6/q12 filter boundaries, duplicate (orderkey, linenumber) keys
    left VALID (unique) but heavy orderkey fan-in."""
    base = dt.datetime(1995, 6, 1)
    edges = [
        dt.datetime(1996, 1, 1), dt.datetime(1997, 1, 1),
        dt.datetime(1998, 9, 2), dt.datetime(1996, 3, 15),
    ]
    rows = []
    for i in range(n):
        # heavy fan-in onto few orders; ~20% of lines pile onto two HOT
        # orders so the q18 per-order quantity rollup crosses its >300
        # threshold on real input instead of passing vacuously
        ok = rng.randrange(2) if rng.random() < 0.2 else rng.randrange(45)
        ship = (
            None
            if rng.random() < 0.1
            else (
                rng.choice(edges)
                if rng.random() < 0.2
                else base + dt.timedelta(days=rng.randrange(0, 1500))
            )
        )
        price = (
            None
            if rng.random() < 0.1
            else rng.choice([round(rng.uniform(900, 90000), 2), 1000.005, -10.0])
        )
        rows.append(
            (
                ok,
                None if rng.random() < 0.08 else rng.randrange(20),
                None if rng.random() < 0.08 else rng.randrange(12),
                i,  # unique linenumber namespace
                None if rng.random() < 0.08 else float(rng.randrange(0, 51)),
                price,
                None if rng.random() < 0.08 else rng.choice([0.0, 0.05, 0.1, 1.0]),
                None if rng.random() < 0.08 else rng.choice([0.0, 0.03, 0.06]),
                rng.choice(["R", "A", "N", None]),
                rng.choice(["O", "F", None]),
                ship,
            )
        )
    return rows


TPCH_FUZZ_QUERIES = [
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "q12_latency_priority",
    "q18_large_orders",
    "q3_shipping_priority",
    "q4_order_priority",
    # the filter-below-rollup + window-min rewrite: fuzzed lineitem
    # (NULL part/supp keys, knife-edge prices, hot orderkeys) against
    # the hostile fixed dims
    "q2_min_cost_supplier",
    "q11_important_value",
    "q15_top_supplier",
    # lit up by the part/nation/orders fuzz (all were zero-row on every
    # hostile input before it — vacuously green)
    "q7_nation_volume",
    "q9_product_profit",
    "q10_returned_items",
    "q20_volume_share_suppliers",
    # decorrelated (aggregate) rewrite vs the correlated EXISTS oracle;
    # NULL supp keys and hot orders are the hazardous inputs
    "q21_waiting_supplier",
    # r7 second widening: the REST of the TPC-H shapes (some are
    # vacuous on some seeds when their literals miss — the census test
    # tracks the committed-fixture inventory; here non-vacuity varies
    # by seed and the comparison is valid either way)
    "q5_local_supplier_volume",
    "q8_market_share",
    "q13_order_distribution",
    "q14_promo_revenue",
    "q16_supplier_variety",
    "q17_small_quantity",
    "q19_disjunctive_revenue",
    "q22_dormant_value",
    "topn_parts_per_brand",
    "semi_anti_customers",
]


def _fuzz_part(rng: random.Random, n: int = 24) -> list[tuple]:
    """Hostile parts: the EXACT filter literals the q2/q9/q14/q16/q20
    family matches on ('STANDARD', '%red%', 'small%', sizes <= 15)
    present alongside near-miss types (the committed hostile fixture's
    'STANDARD COPPER' never equals 'STANDARD', so q2 was vacuous
    there), NULL types/names/sizes, duplicate retail prices."""
    types = ["STANDARD", "STANDARD COPPER", "PROMO STEEL", "SMALL TIN", None]
    brands = ["Brand#1", "Brand#2", None]
    names = ["part {i}", "red part {i}", "small red tin {i}", "small {i}", None]
    rows = []
    for i in range(n):
        name = rng.choice(names)
        rows.append(
            (
                i,
                None if name is None else name.format(i=i),
                rng.choice(brands),
                rng.choice(types),
                None if rng.random() < 0.1 else rng.randrange(1, 31),
                None if rng.random() < 0.1 else round(rng.uniform(1, 2000), 2),
            )
        )
    return rows


def _fuzz_nation(rng: random.Random) -> list[tuple]:
    """Hostile nations: the q7 pair literals (NATION_6 / NATION_9) and
    the q2-region member keys present alongside NULL names, NULL and
    dangling region keys."""
    names = ["NATION_6", "NATION_9", "CHINA", "FRANCE", None, "ELSEWHERE"]
    rng.shuffle(names)
    rows = []
    for k in range(8):
        nm = names[k] if k < len(names) else f"N{k}"
        reg = rng.choice([0, 1, 2, 3, 3, 4, 99, None])
        rows.append((k, nm, reg))
    return rows


def _fuzz_supplier(rng: random.Random, n: int = 12) -> list[tuple]:
    """Hostile suppliers: NULL nation keys (drop from every region
    join), duplicate acctbals for tie-heavy rankings."""
    bals = [0.0, 100.5, 100.5, -7.25, None]
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                None if rng.random() < 0.1 else f"supp {i}",
                None if rng.random() < 0.15 else rng.randrange(5),
                rng.choice(bals),
            )
        )
    return rows


@pytest.fixture(scope="module")
def tpch_fuzz_dirs(spark, tmp_path_factory):
    dirs = {}
    for seed in SEEDS[:3]:
        rng = random.Random(seed + 3000)
        root = tmp_path_factory.mktemp(f"tpchfuzz{seed}")
        for t in TABLES:
            shutil.copy(f"{ADV_SF}/{t}.parquet", root / f"{t}.parquet")
        _write_ref_schema(
            _fuzz_lineitem(rng), "lineitem", root / "lineitem.parquet"
        )
        _write_ref_schema(_fuzz_orders(rng), "orders", root / "orders.parquet")
        _write_ref_schema(_fuzz_part(rng), "part", root / "part.parquet")
        _write_ref_schema(
            _fuzz_supplier(rng), "supplier", root / "supplier.parquet"
        )
        _write_ref_schema(_fuzz_nation(rng), "nation", root / "nation.parquet")
        dirs[seed] = str(root)
    return dirs


@pytest.mark.parametrize("name", TPCH_FUZZ_QUERIES)
def test_crossengine_tpch_fuzz(spark, tpch_fuzz_dirs, name):
    for seed, sf in tpch_fuzz_dirs.items():
        sdf = E.queries()[name](spark, sf).toPandas()
        con = duckdb.connect(":memory:")
        try:
            for t in TABLES:
                con.sql(
                    f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{sf}/{t}.parquet')"
                )
            ddf = con.sql(E.oracle_sql()[name]).df()
        finally:
            con.close()
        problems = compare_frames(sdf, ddf)
        assert not problems, (
            f"[{name}] seed={seed} tpch-fuzz mismatch:\n" + "\n".join(problems)
        )


def _fuzz_embeddings(rng: random.Random, n: int = 40) -> list[tuple]:
    """Hostile vectors: duplicates, near-duplicates, zero vectors,
    scaled copies (same direction, different norm), NULL labels."""
    dim = 64
    vecs: list[list[float]] = []
    for i in range(n):
        r = rng.random()
        if r < 0.08:
            vecs.append([0.0] * dim)
        elif r < 0.25 and vecs:
            base = rng.choice(vecs)
            if rng.random() < 0.5:
                vecs.append(list(base))  # exact duplicate
            else:
                vecs.append([x * 2.5 for x in base])  # same direction
        else:
            vecs.append(
                [round(rng.uniform(-0.5, 0.5), 6) for _ in range(dim)]
            )
    return [
        (i, v, None if rng.random() < 0.1 else rng.randrange(10))
        for i, v in enumerate(vecs)
    ]


VEC_FUZZ_QUERIES = [
    "embed_norms_by_label",
    "sim_topk_bruteforce",
    "embed_neardup_cosine",
    "label_centroid_inertia",
    # r7 second widening: every ANN serving tier (quantizer + codebooks
    # retrain per fuzz dir — artifacts key on source identity), the
    # projections, and the embedding-side dedup screens
    "ann_topk_lsh",
    "ann_topk_ivf",
    "ann_topk_pq",
    "ann_topk_ivfpq",
    "ann_topk_ivfpq_res",
    "pq_codes",
    "pca_project8",
    "rp_project16",
    "sim_topk_vectorized",
    "neardup_embedding_check",
    "semantic_dedup",
]


@pytest.fixture(scope="module")
def vec_fuzz_dirs(spark, tmp_path_factory):
    dirs = {}
    for seed in SEEDS[:3]:
        rng = random.Random(seed + 2000)
        root = tmp_path_factory.mktemp(f"vecfuzz{seed}")
        for t in TABLES:
            shutil.copy(f"{ADV_SF}/{t}.parquet", root / f"{t}.parquet")
        _write_ref_schema(
            _fuzz_embeddings(rng), "embeddings", root / "embeddings.parquet"
        )
        dirs[seed] = str(root)
    return dirs


@pytest.mark.parametrize("name", VEC_FUZZ_QUERIES)
def test_crossengine_vec_fuzz(spark, vec_fuzz_dirs, name):
    for seed, sf in vec_fuzz_dirs.items():
        sdf = E.queries()[name](spark, sf).toPandas()
        con = duckdb.connect(":memory:")
        try:
            for t in TABLES:
                con.sql(
                    f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{sf}/{t}.parquet')"
                )
            ddf = con.sql(E.oracle_sql()[name]).df()
        finally:
            con.close()
        problems = compare_frames(sdf, ddf)
        assert not problems, (
            f"[{name}] seed={seed} vec-fuzz mismatch:\n" + "\n".join(problems)
        )


def _fuzz_embeddings_nullish(rng: random.Random, n: int = 40) -> list[tuple]:
    """r11 lane (r10 verdict next-round #6): embeddings where the
    VALUES themselves go NULL — whole-row NULL embeddings, vectors
    with a contiguous NULL slice, and one all-NULL vector — the
    cosine-guard edge the zero-vector fixture can't reach. A NULL
    element makes every norm/dot fold NULL on BOTH engines, so the
    ``norm > 0`` guards must drop these rows identically (NULL is not
    > 0); a divergence here means one engine's fold short-circuits
    where the other propagates."""
    dim = 64
    rows: list[tuple] = []
    for i in range(n):
        r = rng.random()
        if r < 0.10:
            v = None  # whole embedding NULL
        elif r < 0.20:
            v = [round(rng.uniform(-0.5, 0.5), 6) for _ in range(dim)]
            start = rng.randrange(dim - 8)
            for j in range(start, start + 8):
                v[j] = None  # contiguous NULL slice
        elif r < 0.24:
            v = [None] * dim  # all-NULL vector
        elif r < 0.30:
            v = [0.0] * dim
        else:
            v = [round(rng.uniform(-0.5, 0.5), 6) for _ in range(dim)]
        rows.append((i, v, None if rng.random() < 0.1 else rng.randrange(10)))
    return rows


# the JVM-fold cosine/norm family — their NULL semantics are defined
# (fold propagates NULL, norm>0 drops it; oracles mirror via
# functions/vectors.py::ns_selfdot_sql). EXCLUDED by documented input
# contract: the quantizer-trained tiers (ann_topk_*, pq_codes,
# semantic_dedup) and the Arrow projection paths (pca_project8,
# rp_project16) — their k-means training defines non-null input, and
# a NULL-element vector fails loudly at train/encode time on both
# engines rather than silently diverging.
NULLISH_VEC_QUERIES = [
    "embed_norms_by_label",
    "sim_topk_bruteforce",
    "embed_neardup_cosine",
    "label_centroid_inertia",
    "neardup_embedding_check",
    "sim_topk_vectorized",
]


@pytest.fixture(scope="module")
def nullish_vec_dirs(spark, tmp_path_factory):
    dirs = {}
    for seed in SEEDS[:2]:
        rng = random.Random(seed + 5000)
        root = tmp_path_factory.mktemp(f"nullvec{seed}")
        for t in TABLES:
            shutil.copy(f"{ADV_SF}/{t}.parquet", root / f"{t}.parquet")
        _write_ref_schema(
            _fuzz_embeddings_nullish(rng),
            "embeddings",
            root / "embeddings.parquet",
        )
        dirs[seed] = str(root)
    return dirs


@pytest.mark.parametrize("name", NULLISH_VEC_QUERIES)
def test_crossengine_nullish_vec_fuzz(spark, nullish_vec_dirs, name):
    for seed, sf in nullish_vec_dirs.items():
        sdf = E.queries()[name](spark, sf).toPandas()
        con = duckdb.connect(":memory:")
        try:
            for t in TABLES:
                con.sql(
                    f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{sf}/{t}.parquet')"
                )
            ddf = con.sql(E.oracle_sql()[name]).df()
        finally:
            con.close()
        problems = compare_frames(sdf, ddf)
        assert not problems, (
            f"[{name}] seed={seed} nullish-vec mismatch:\n"
            + "\n".join(problems)
        )


@pytest.mark.parametrize("name", FUZZ_QUERIES)
def test_crossengine_fuzz(spark, fuzz_dirs, name):
    for seed, sf in fuzz_dirs.items():
        sdf = E.queries()[name](spark, sf).toPandas()
        con = duckdb.connect(":memory:")
        try:
            for t in TABLES:
                con.sql(
                    f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{sf}/{t}.parquet')"
                )
            ddf = con.sql(E.oracle_sql()[name]).df()
        finally:
            con.close()
        problems = compare_frames(sdf, ddf)
        assert not problems, (
            f"[{name}] seed={seed} cross-engine mismatch:\n" + "\n".join(problems)
        )


# ---------------------------------------------------------------------------
# Direct asof_join fuzz — raw frames vs DuckDB's native ASOF JOIN.
#
# The registered asof_last_purchase query aggregates the right side
# with MAX(value) first, which makes NULL-valued right rows rare; this
# fuzz feeds the OPERATOR hostile frames directly: ~25% NULL value
# columns on the right (so the most recent match often carries NULLs —
# the row-wise-carry class), two value columns (so a column-wise carry
# that mixes rows would split them), NULL keys/timestamps on both
# sides, and tie-heavy timestamp pools.


@pytest.mark.parametrize("seed", SEEDS)
def test_asof_join_fuzz_vs_duckdb_asof(spark, tmp_path, seed):
    import pandas as pd

    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.asof import (
        asof_join,
    )

    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    ts_pool = [base + dt.timedelta(minutes=5 * i) for i in range(30)]

    left_rows = [
        (
            i,
            None if rng.random() < 0.15 else rng.randrange(6),
            None if rng.random() < 0.15 else rng.choice(ts_pool),
        )
        for i in range(80)
    ]
    # right side unique per (key, ts) — the operator's documented
    # precondition (nondeterministic otherwise in any engine)
    right_keys = set()
    right_rows = []
    while len(right_rows) < 40:
        k = None if rng.random() < 0.1 else rng.randrange(6)
        ts = None if rng.random() < 0.1 else rng.choice(ts_pool)
        if (k, ts) in right_keys:
            continue
        right_keys.add((k, ts))
        right_rows.append(
            (
                k,
                ts,
                None if rng.random() < 0.25 else round(rng.uniform(0, 99), 2),
                None if rng.random() < 0.25 else rng.choice(["a", "b", "c"]),
            )
        )

    lpdf = pd.DataFrame(left_rows, columns=["event_id", "user_id", "ts"])
    rpdf = pd.DataFrame(right_rows, columns=["user_id", "ts", "pvalue", "label"])
    lpath, rpath = str(tmp_path / "l.parquet"), str(tmp_path / "r.parquet")
    lpdf.to_parquet(lpath)
    rpdf.to_parquet(rpath)

    ldf = spark.createDataFrame(
        left_rows, "event_id bigint, user_id bigint, ts timestamp"
    )
    rdf = spark.createDataFrame(
        right_rows, "user_id bigint, ts timestamp, pvalue double, label string"
    )
    sdf = asof_join(
        ldf, rdf, key="user_id", left_ts="ts", right_ts="ts",
        value_cols=["pvalue", "label"],
    ).toPandas()

    con = duckdb.connect(":memory:")
    try:
        # the operator's NULL rules spelled explicitly: NULL key/ts on
        # the left never matches (DuckDB ASOF would match a NULL-ts
        # left row to the LATEST right row); NULL key/ts right rows
        # are dropped
        ddf = con.sql(
            f"""
            WITH l AS (SELECT * FROM read_parquet('{lpath}')),
                 r AS (SELECT * FROM read_parquet('{rpath}')
                       WHERE user_id IS NOT NULL AND ts IS NOT NULL)
            SELECT l.event_id, l.user_id, l.ts,
                   r.pvalue AS asof_pvalue, r.label AS asof_label
            FROM (SELECT * FROM l
                  WHERE user_id IS NOT NULL AND ts IS NOT NULL) l
            ASOF LEFT JOIN r
              ON l.user_id = r.user_id AND l.ts >= r.ts
            UNION ALL
            SELECT event_id, user_id, ts, NULL, NULL
            FROM l WHERE user_id IS NULL OR ts IS NULL
            """
        ).df()
    finally:
        con.close()
    problems = compare_frames(sdf, ddf)
    assert not problems, (
        f"seed={seed} asof fuzz mismatch:\n" + "\n".join(problems)
    )
