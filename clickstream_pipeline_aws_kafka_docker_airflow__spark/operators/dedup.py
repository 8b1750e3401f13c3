"""Near-duplicate detection operators (LLM-data-pipeline extension):
MinHash + LSH banding, SimHash fingerprints, n-gram Jaccard
verification.

Portability-by-construction: the hash family is ``md5`` over seeded
strings with **string-ordered mins** instead of engine-specific integer
hashes (Spark's xxhash64 and DuckDB's hash() disagree), so every stage
— signatures, band keys, candidate pairs, exact Jaccard — has a
byte-equivalent DuckDB oracle.

Scale shape (the reason MinHash exists): exact pairwise Jaccard over N
docs is O(N^2); here only docs **colliding in a band bucket** are
paired, and the expensive shingle-join verification runs on that small
candidate set. All stages are shuffles on short hash strings, never on
document text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SHINGLE_N = 3
NUM_HASHES = 8
BAND_SIZE = 2  # 8 hashes -> 4 bands of 2: P(candidate) = 1-(1-J^2)^4

HEX = "0123456789abcdef"


def tokens(c) -> F.Column:
    return F.split(F.trim(F.lower(c)), r"\s+")


def shingle_table(docs: DataFrame, n: int = SHINGLE_N) -> DataFrame:
    """(doc_id, shingle) — distinct word n-grams of the lowercased text.
    Docs shorter than n tokens produce no shingles (and thus never pair).
    """
    from .scale import widen

    base = widen(docs).select("doc_id", tokens(F.col("text")).alias("t"))
    # sequence(a,b) DESCENDS when b<a — guard short docs to an empty list
    grams = F.when(
        F.size(F.col("t")) >= n,
        F.expr(
            f"transform(sequence(1, size(t) - {n - 1}), "
            f"i -> concat_ws(' ', slice(t, i, {n})))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    return base.select("doc_id", F.explode(grams).alias("shingle")).distinct()


def minhash_signatures(shingles: DataFrame, k: int = NUM_HASHES) -> DataFrame:
    """doc_id -> k minhashes: ``min(md5('<i>|' || shingle))`` per seed.
    One hash-aggregate pass computes all k mins (map-side partial agg)."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"mh{i}")
        for i in range(k)
    ]
    return shingles.groupBy("doc_id").agg(*aggs)


def band_table(
    sigs: DataFrame, k: int = NUM_HASHES, band_size: int = BAND_SIZE
) -> DataFrame:
    """(doc_id, band, bkey) — the banded signature. One explode instead
    of an n_bands-way union: a single pass over the signatures, one
    scan, one stage. bkey is a 16-byte md5 — uniform, so no skew."""
    n_bands = k // band_size
    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat(
                        *[F.col(f"mh{b * band_size + j}") for j in range(band_size)]
                    )
                ).alias("bkey"),
            )
            for b in range(n_bands)
        ]
    )
    return sigs.select("doc_id", F.explode(band_arr).alias("bb")).select(
        "doc_id", "bb.band", "bb.bkey"
    )


# The at-scale bucket bound for lsh_candidate_pairs(band_df_cap=...):
# buckets larger than this are duplicate floods the exact pass must
# collapse first (probe: docs/PROBE_DUPFLOOD.json). None in the
# registered queries — their oracles recompute the uncapped detector.
BAND_DF_CAP_DEFAULT = 200


def lsh_candidate_pairs(
    sigs: DataFrame,
    k: int = NUM_HASHES,
    band_size: int = BAND_SIZE,
    band_df_cap: int | None = None,
) -> DataFrame:
    """Band the signature, self-join on (band, band_key): docs agreeing
    on ALL hashes of any band become candidates.

    ``band_df_cap`` is the duplicate-FLOOD guard: md5 band keys keep
    the bucket HASHING uniform, but D byte-identical documents land in
    the same bucket of EVERY band regardless — D^2 candidate pairs (a
    boilerplate page shared by 1M docs is 10^12 pairs; measured 100x
    pair growth for 10x docs in docs/PROBE_DUPFLOOD.json). With the
    cap, buckets larger than ``band_df_cap`` are dropped before the
    self-join, bounding per-bucket work at cap^2 like the shingle
    path's SHINGLE_DF_CAP. Recall effect: a pair supported ONLY by
    over-cap buckets is not paired — by design, because such buckets
    are exact-duplicate floods that the cheaper exact pass
    (dedup_exact_docs / a distinct-text pre-pass) must collapse FIRST;
    the registered MinHash queries keep cap=None (their oracle
    recomputes the uncapped detector), and the probe demonstrates the
    capped + exact-first compositions for the at-scale path."""
    bands = band_table(sigs, k, band_size)
    if band_df_cap is not None:
        sizes = bands.groupBy("band", "bkey").agg(
            F.count(F.lit(1)).alias("_bn")
        )
        bands = (
            bands.join(
                sizes.where(F.col("_bn") <= band_df_cap), ["band", "bkey"]
            ).drop("_bn")
        )
    a = bands.select(
        F.col("doc_id").alias("id_a"), "band", "bkey"
    )
    b_ = bands.select(F.col("doc_id").alias("id_b"), "band", "bkey")
    return (
        a.join(b_, ["band", "bkey"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_verify(shingles: DataFrame, candidates: DataFrame) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs only:
    |A ∩ B| / (|A| + |B| - |A ∩ B|), via a shingle equi-join restricted
    to the candidate set (left-semi style blow-up control)."""
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    s1 = shingles.select(F.col("doc_id").alias("id_a"), "shingle")
    s2 = shingles.select(F.col("doc_id").alias("id_b"), "shingle")
    common = (
        candidates.join(s1, "id_a")
        .join(s2, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    na = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("n_b"))
    return (
        candidates.join(common, ["id_a", "id_b"], "left")
        .withColumn("n_common", F.coalesce("n_common", F.lit(0)))
        .join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                4,
            ).alias("jaccard"),
        )
    )


def minhash_near_dup(
    docs: DataFrame,
    n: int = SHINGLE_N,
    k: int = NUM_HASHES,
    band_size: int = BAND_SIZE,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Full pipeline: shingle -> minhash -> band -> candidate -> exact
    Jaccard. Returns (id_a, id_b, jaccard) for every candidate pair.

    The shingle table feeds four consumers (signatures, sizes, both
    sides of the common-shingle join), so it must be materialized ONCE
    instead of re-running the tokenize + explode + distinct chain per
    branch — measured 2x end-to-end at sf0.1. The production path
    passes ``shingles`` (the build-once parquet artifact,
    queries/dedup_q.py::shingles_table — a dedup JOB materializes the
    shingle staging table, downstream consumers scan it); the ad-hoc
    fallback lazily localCheckpoints, so plan-only callers (explain,
    tests) pay nothing and the first action materializes once for all
    branches.

    Tier choice: README "Choosing a dedup tier" decision table.
    """
    sh = (
        shingles
        if shingles is not None
        else shingle_table(docs, n).localCheckpoint(eager=False)
    )
    cands = lsh_candidate_pairs(minhash_signatures(sh, k), k, band_size)
    return jaccard_verify(sh, cands)


SHINGLE_DF_CAP = 50  # shingles in more docs than this are boilerplate


def ngram_jaccard_all_pairs(
    docs: DataFrame,
    n: int = SHINGLE_N,
    threshold: float = 0.05,
    df_cap: int = SHINGLE_DF_CAP,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard for every pair sharing >=1 (non-boilerplate)
    shingle — the LSH-free variant of near-dup detection.

    SCALE BOUNDARY — when to use this tier vs MinHash/SimHash: the
    blocking key here is the shingle itself, so every shingle with
    document frequency f contributes an f^2 join group; total work is
    sum(f_i^2) over the (capped) vocabulary, which grows with corpus
    size even under the cap (more shingles hit the cap as N grows;
    each contributes up to df_cap^2). This is the right tool when the
    corpus is small enough to afford EXACT all-pairs semantics
    (<~10^6 docs), or as the verify stage behind LSH blocking. Past
    that, use MinHash+LSH (collision probability tuned by bands, work
    independent of vocabulary DF) or SimHash banding — both in this
    module — which trade exactness for per-pair work that does not
    grow with corpus size.

    The skew guard that makes the cap work: shingles whose document
    frequency exceeds ``df_cap`` are dropped BEFORE the self-join (and
    from the size denominators, so the Jaccard is over the capped
    vocabulary on both sides). A boilerplate shingle shared by f
    documents otherwise creates an O(f^2) join group — one hot "click
    here to unsubscribe" 3-gram at corpus scale is a quadratic blowup
    on a single key. With the cap, per-shingle join work is bounded by
    df_cap^2 regardless of corpus size, and frequent shingles carry no
    near-dup signal anyway (that is exactly what makes them frequent).
    RECALL EFFECT of the cap: a pair whose overlap consists ONLY of
    over-cap boilerplate shingles is not paired (by design — that
    overlap is not duplication signal); pairs sharing at least one
    under-cap shingle are always found, and their Jaccard is computed
    over the capped vocabulary on both sides
    (tests/test_dedup.py pins the capped-vs-uncapped delta).

    ``shingles``: pass the materialized shingle artifact
    (queries/dedup_q.py::shingles_table) to skip the tokenize/explode/
    distinct rebuild; ad-hoc callers let it default to a lazy
    localCheckpoint.

    Tier choice: README "Choosing a dedup tier" decision table.
    """
    sh = (
        shingles
        if shingles is not None
        else shingle_table(docs, n).localCheckpoint(eager=False)
    )
    # anti-join against the HOT list: shingles over the cap are few by
    # construction (the cap exists because they are pathological), so
    # the exclusion broadcasts and the shingle table never shuffles for
    # the filter — joining the keep-list instead would shuffle the
    # whole vocabulary
    hot = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > df_cap)
        .select("shingle")
    )
    # the capped table feeds three consumers (sizes, both join sides),
    # but it is a broadcast anti-join away from the materialized ``sh``
    # — map-side, no shuffle — so re-deriving it per branch is cheaper
    # than a second materialization
    shk = sh.join(F.broadcast(hot), "shingle", "left_anti")
    sizes = shk.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    s1 = shk.select(F.col("doc_id").alias("id_a"), "shingle")
    s2 = shk.select(F.col("doc_id").alias("id_b"), "shingle")
    common = (
        s1.join(s2, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    na = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("n_b"))
    jac = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        common.join(na, "id_a")
        .join(nb, "id_b")
        .where(jac >= threshold)
        .select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# SimHash


# Incremental-admission Jaccard threshold as an exact rational
# (1/2 = 0.5): the admission verdict is decided by integer
# cross-multiplication, never by comparing a rounded float — a true J
# of 0.49996 must NOT round up to 0.5000 and flip the verdict.
J_ADMIT_NUM = 1
J_ADMIT_DEN = 2
J_ADMIT = J_ADMIT_NUM / J_ADMIT_DEN  # reported-column convenience only


def incremental_admission(
    new_ids: DataFrame,
    shingles: DataFrame,
    old_bands: DataFrame,
    t_num: int = J_ADMIT_NUM,
    t_den: int = J_ADMIT_DEN,
    k: int = NUM_HASHES,
    band_size: int = BAND_SIZE,
    sizes: DataFrame | None = None,
) -> DataFrame:
    """Batch admission of an incoming document batch against an EXISTING
    corpus: sign the new docs, probe the persisted band index of the old
    zone, exact-verify only the colliding pairs, and emit one verdict row
    per new doc — ``(doc_id, admitted, dup_of, jaccard)`` where
    ``dup_of``/``jaccard`` name the best old-zone match at or above
    ``t_num/t_den`` (decided by integer cross-multiplication
    ``t_den*n_common >= t_num*(n_a+n_b-n_common)`` exactly as
    ``ppjoin_pairs`` does — the rounded float ``jaccard`` is a REPORT
    column, never the verdict; ties broken by lowest old doc_id) and
    ``admitted`` is true when no such match exists.

    This is the batch twin of the streaming online dedup
    (streaming/corpus_ingest.py): the existing zone is touched only
    through its band index (``old_bands`` — a build-once artifact, NOT
    re-signed per batch), so per-batch work scales with the batch plus
    its collisions, never with corpus size. At 100 TB the old zone's
    shingle table is the materialized staging artifact and the verify
    join reads only the candidate docs' shingles.

    ``new_ids``: (doc_id) of the incoming batch. ``shingles``:
    (doc_id, shingle) covering both zones (the snapshot staging table).
    ``old_bands``: (doc_id, band, bkey) for the existing zone.
    ``sizes``: optional (doc_id, n) per-doc shingle counts — pass the
    persisted artifact a production zone keeps next to its band index
    (queries.dedup_q.doc_sizes_table); without it the counts are
    grouped from ``shingles`` at admission time, a full-corpus shuffle
    the artifact exists to avoid.

    Tier choice: README "Choosing a dedup tier" decision table.
    """
    from pyspark.sql import Window

    # sh_new feeds the signing chain AND the verify join's batch leg;
    # unpinned, the second consumer re-scans + re-explodes the corpus
    # staging table (measured sf0.1: a duplicated 69-task scan job).
    # Bounded: batch docs x shingles-per-doc. Same no-unpersist cost
    # contract as ``cand`` below (tests/test_cache_census.py).
    sh_new = shingles.join(
        new_ids.select("doc_id"), "doc_id", "left_semi"
    ).persist()
    bands_new = band_table(minhash_signatures(sh_new, k), k, band_size)
    # ``cand`` is referenced twice below (verify join, jac left join)
    # and, measured at HEAD, exchange REUSE does NOT fire — the
    # executed plan carries two copies of the signing chain
    # (ReusedExchange: 0, 12 scans). persist() pins ONE evaluation
    # (bounded: batch x collisions rows) WITHOUT the job boundaries a
    # localCheckpoint adds — the r8 measurement that rejected pinning
    # used localCheckpoint (sf0.1 1.38 s / 13 jobs vs 1.49 s / 17 jobs
    # pinned, sf1 4.38 vs 4.82-4.90 s); the cache instead materializes
    # inside the first consuming stage and repeat calls reuse it —
    # measured r9: sf0.1 13 -> 10 warm jobs, 2.67 -> 1.57 s bench
    # min-of-2, identical rows. Determinism is not at stake
    # (unlike rankstats' boundary-sampling pin) — the pin is purely a
    # cost contract.
    cand = (
        bands_new.select(F.col("doc_id").alias("id_new"), "band", "bkey")
        .join(
            old_bands.select(F.col("doc_id").alias("id_old"), "band", "bkey"),
            ["band", "bkey"],
        )
        .select("id_new", "id_old")
        .distinct()
        .persist()
    )
    if sizes is None:
        sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    # verify join shape: (candidate pairs x the NEW side's shingles) is
    # bounded by the batch and its collisions, so it is the
    # broadcast/build side; the corpus staging table is only ever the
    # probe side (one scan, no corpus shuffle under AQE broadcast —
    # with an SMJ fallback it shuffles once, never re-aggregates)
    s1 = sh_new.select(F.col("doc_id").alias("id_new"), "shingle")
    s2 = shingles.select(F.col("doc_id").alias("id_old"), "shingle")
    common = (
        cand.join(s1, "id_new")
        .join(s2, ["id_old", "shingle"])
        .groupBy("id_new", "id_old")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    def _size_or_raise(side: str) -> F.Column:
        # LEFT join + raise: an INNER join here would silently DROP any
        # candidate pair whose doc is missing from a stale / old-zone-only
        # ``sizes`` artifact — and a dropped pair is an admitted duplicate.
        # A missing size must fail the batch loudly, never admit.
        return (
            F.when(F.col(f"n_{side}").isNotNull(), F.col(f"n_{side}"))
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "incremental_admission: sizes artifact has no row"
                            " for candidate doc_id "
                        ),
                        F.col("id_new" if side == "a" else "id_old").cast(
                            "string"
                        ),
                        F.lit(" — rebuild doc_sizes for BOTH zones"),
                    )
                ).cast("bigint")
            )
        )

    jac = (
        cand.join(common, ["id_new", "id_old"], "left")
        .withColumn("n_common", F.coalesce("n_common", F.lit(0)))
        .join(sizes.select(F.col("doc_id").alias("id_new"), F.col("n").alias("n_a")), "id_new", "left")
        .join(sizes.select(F.col("doc_id").alias("id_old"), F.col("n").alias("n_b")), "id_old", "left")
        .withColumn("n_a", _size_or_raise("a"))
        .withColumn("n_b", _size_or_raise("b"))
        .withColumn("n_union", F.col("n_a") + F.col("n_b") - F.col("n_common"))
        .select(
            "id_new",
            "id_old",
            "n_common",
            "n_union",
            # exact double for deterministic ordering; ROUND only in the
            # reported column below — never in a comparison
            (F.col("n_common") / F.col("n_union")).alias("j_exact"),
        )
    )
    best = (
        jac.where(F.col("n_common") * t_den >= F.col("n_union") * t_num)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("id_new").orderBy(
                    F.desc("j_exact"), F.asc("id_old")
                )
            ),
        )
        .where(F.col("rn") == 1)
        .withColumn("j", F.round(F.col("j_exact"), 4))
    )
    return (
        new_ids.select("doc_id")
        # verdict table is one row per rejected new doc — broadcast so
        # the batch side never shuffles for the verdict stitch
        .join(F.broadcast(best), new_ids["doc_id"] == best["id_new"], "left")
        .select(
            "doc_id",
            F.col("id_new").isNull().alias("admitted"),
            F.col("id_old").alias("dup_of"),
            F.col("j").alias("jaccard"),
        )
    )


SIMHASH_BITS = 32


def _hex_val(col: str, pos: int) -> str:
    """SQL fragment: value of hex nibble ``pos`` (0-based) of column
    expression ``col`` — portable (Spark locate == DuckDB strpos-swapped).
    BIGINT cast up front: locate returns int32 and the 16^7 scale
    overflows under ANSI arithmetic otherwise."""
    return f"(CAST(locate(substr({col}, {pos + 1}, 1), '{HEX}') AS BIGINT) - 1)"


def token_hash_sql(col: str = "token", n_nibbles: int = 8) -> str:
    """Portable SQL: first ``n_nibbles`` md5 hex nibbles of the value as
    an integer, built from per-nibble positions (no engine-specific hex
    cast). 15 nibbles = 60 bits is the widest that stays safely inside
    BIGINT on both engines."""
    assert n_nibbles <= 15, "more than 15 nibbles overflows BIGINT"
    h = f"md5({col})"
    terms = " + ".join(
        f"{_hex_val(h, p)} * {16 ** (n_nibbles - 1 - p)}" for p in range(n_nibbles)
    )
    return f"({terms})"


def token_hash32_sql(col: str = "token") -> str:
    """First 8 md5 hex nibbles as a 32-bit int (see token_hash_sql)."""
    return token_hash_sql(col, 8)


SIMHASH_ND_BITS = 60  # pairing uses a WIDE fingerprint: 4 bands of 15
SIMHASH_BANDS = 4  # n_bands > max_hamming -> pigeonhole full recall
SIMHASH_MAX_HAMMING = 3
SIMHASH_BAND_DF_CAP = 1000  # skew guard on degenerate band values


def simhash_near_dup(
    docs: DataFrame,
    bits: int = SIMHASH_ND_BITS,
    n_bands: int = SIMHASH_BANDS,
    max_hamming: int = SIMHASH_MAX_HAMMING,
    band_df_cap: int = SIMHASH_BAND_DF_CAP,
    fps: DataFrame | None = None,
) -> DataFrame:
    """SimHash near-dup pairing: (id_a, id_b, hamming) for every pair
    within ``max_hamming`` bit flips, found via band blocking.

    Pigeonhole guarantee: with ``n_bands`` > ``max_hamming``, any pair
    within the distance agrees EXACTLY on at least one band — so the
    candidate set (pairs colliding on any band value) has full recall,
    and the exact popcount verify (``bit_count(a ^ b)``) filters it
    down with zero false positives. The classic simhash-at-scale
    shape: each band join shuffles (band, band-value) keys, never
    text; per-key join work is collision-group^2.

    The PAIRING fingerprint is wide (60 bits -> 15-bit bands, 32k
    values per band) precisely because band width controls collision
    group size: an 8-bit band collides corpus/256 ways — quadratic
    blowup at any real corpus — while 15-bit bands keep groups near 1
    at 50k docs and the df cap bounds the pathological values beyond
    that. (The 32-bit ``simhash_fingerprints`` query keeps its own
    width for compact storage comparisons; width is a per-use dial.)

    Skew guard: a degenerate band value shared by more than
    ``band_df_cap`` documents (e.g. the all-zeros band of
    near-empty docs) is excluded from CANDIDATE GENERATION on that
    band — such pairs are still found through their other bands unless
    every band is degenerate (at that point the docs are near-empty
    boilerplate, exactly what upstream quality filters remove). The
    oracle mirrors the cap, so both engines see the same pairs.

    Tier choice: README "Choosing a dedup tier" decision table.
    """
    # the fingerprint aggregate (``bits`` SUM columns over the token
    # explode) feeds every band branch — it must be materialized once
    # (one skinny row per doc); without that it re-runs per branch
    # (measured 4x end-to-end at sf0.1). Production passes ``fps`` (the
    # build-once parquet artifact, queries/dedup_q.py::simhash_fps_table);
    # the ad-hoc fallback lazily localCheckpoints.
    if fps is None:
        fps = simhash_fingerprints(docs, bits).localCheckpoint(eager=False)
    w = bits // n_bands
    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.expr(f"(simhash div {1 << (b * w)}) % {1 << w}").alias("bval"),
            )
            for b in range(n_bands)
        ]
    )
    # the fingerprint rides WITH the band rows, so hamming is computed
    # inside the band join and non-near pairs are dropped BEFORE the
    # distinct — the shuffle then carries only true near-dup pairs
    # (multi-band duplicates of them), not every collision
    bands = fps.select("doc_id", "simhash", F.explode(band_arr).alias("bb")).select(
        "doc_id", "simhash", "bb.band", "bb.bval"
    )
    hot = (
        bands.groupBy("band", "bval")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > band_df_cap)
        .select("band", "bval")
    )
    bk = bands.join(F.broadcast(hot), ["band", "bval"], "left_anti")
    a = bk.select(
        F.col("doc_id").alias("id_a"), F.col("simhash").alias("fa"), "band", "bval"
    )
    b_ = bk.select(
        F.col("doc_id").alias("id_b"), F.col("simhash").alias("fb"), "band", "bval"
    )
    ham = F.bit_count(F.col("fa").bitwiseXOR(F.col("fb")))
    return (
        a.join(b_, ["band", "bval"])
        .where(F.col("id_a") < F.col("id_b"))
        .where(ham <= max_hamming)
        .select("id_a", "id_b", ham.cast("bigint").alias("hamming"))
        .distinct()
    )


def simhash_fingerprints(docs: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """doc_id -> SimHash over distinct lowercased tokens: per bit j, sum
    +1/-1 by bit value of the token hash; fingerprint sets bit j iff the
    sum is positive. One explode + one aggregate. The token hash is
    sized to the fingerprint width (ceil(bits/4) md5 nibbles, max 60
    bits)."""
    from .scale import widen

    n_nibbles = max(8, -(-bits // 4))
    tok = (
        widen(docs).select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
        .where(F.col("token") != "")
        .distinct()
        .withColumn("h32", F.expr(token_hash_sql("token", n_nibbles)))
    )
    bit_aggs = [
        F.sum(
            F.when(F.expr(f"(h32 div {1 << j}) % 2") == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(bits)
    ]
    agg = tok.groupBy("doc_id").agg(*bit_aggs)
    fp = None
    for j in range(bits):
        term = F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return agg.select("doc_id", fp.cast("bigint").alias("simhash"))


# ---------------------------------------------------------------------------
# Prefix-filtered EXACT set-similarity join (PPJoin-style)
# ---------------------------------------------------------------------------

# Jaccard admission threshold as an exact rational (3/5 = 0.6) — every
# comparison below is integer cross-multiplication, never a float.
PPJ_T_NUM = 3
PPJ_T_DEN = 5


def token_set_table(docs: DataFrame) -> DataFrame:
    """(doc_id, token) — distinct lowercased word tokens (the UNIT-gram
    twin of shingle_table; empty tokens from blank docs dropped)."""
    from .scale import widen

    return (
        widen(docs)
        .select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
        .where(F.col("token") != "")
        .distinct()
    )


def ppjoin_prefix_table(
    toks: DataFrame, t_num: int = PPJ_T_NUM, t_den: int = PPJ_T_DEN
) -> DataFrame:
    """(doc_id, token, n) — each document's prefix under the global
    df-ascending token order: the first ``n - ceil(t*n) + 1`` of its n
    tokens, rarest first (ties by token string — deterministic on both
    engines). This is the INDEX of the prefix-filter join; build it
    once per (snapshot, threshold) and materialize. The df-rank stage
    is one vocabulary aggregate plus one per-doc window — both shuffles
    on short strings, never on document text."""
    from pyspark.sql import Window

    df_tbl = toks.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    ceil_tn = F.expr(f"CAST(({t_num}*n + {t_den - 1}) div {t_den} AS BIGINT)")
    w = Window.partitionBy("doc_id").orderBy("df", "token")
    return (
        toks.join(df_tbl, "token")
        .join(sizes, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= F.col("n") - ceil_tn + F.lit(1))
        .select("doc_id", "token", "n")
    )


def ppjoin_pairs(
    docs: DataFrame,
    t_num: int = PPJ_T_NUM,
    t_den: int = PPJ_T_DEN,
    toks: DataFrame | None = None,
    prefix: DataFrame | None = None,
) -> DataFrame:
    """EXACT token-set Jaccard join at threshold t = t_num/t_den via
    prefix filtering (the PPJoin family, Xiao et al., WWW'08) — the
    third blocking strategy next to MinHash-LSH (probabilistic) and the
    shingle-DF-cap all-pairs tier (capped-exact): full recall AND full
    precision with no df cap, because the blocking key is not "any
    shared token" but "a shared token among each document's RAREST
    few".

    How the candidate space stays small at 100 TB: tokens are globally
    ordered by ascending document frequency (ties by token string —
    deterministic on both engines); a document of n tokens exposes only
    its first ``n - ceil(t*n) + 1`` tokens in that order (its PREFIX).
    The prefix-filter lemma guarantees any pair with J >= t shares a
    prefix token, so the self-join runs on prefixes only — and prefixes
    are dominated by RARE tokens (df-ascending order puts "click here
    to unsubscribe" words last), so per-token join groups are small by
    construction rather than by a recall-trading cap. The length filter
    ``t_den*min(n) >= t_num*max(n)`` prunes size-incompatible pairs
    before the verify. Worst case remains adversarial (a corpus of
    near-identical docs has rare tokens shared corpus-wide), which is a
    duplicate-mass pathology every exact join shares — route such
    corpora through MinHash first.

    All arithmetic is integer: prefix length uses ceil(t*n) =
    (t_num*n + t_den - 1) div t_den, admission is
    ``t_den*overlap >= t_num*(na+nb-overlap)``, and the reported
    similarity is a BIGINT permille. Output: (doc_a, doc_b, n_a, n_b,
    n_overlap, j_permille) for every pair with J >= t, exactly.

    ``toks``: pass the materialized token-set artifact to skip the
    tokenize/explode/distinct rebuild (mirrors the shingle artifact
    plumbing of the other tiers). ``prefix``: pass the materialized
    ppjoin_prefix_table to also skip the df-rank stage (the index half
    of the join — built once per snapshot like the LSH band index).

    Tier choice: README "Choosing a dedup tier" decision table.
    """
    tk = toks if toks is not None else token_set_table(docs).localCheckpoint(
        eager=False
    )
    if prefix is None:
        prefix = ppjoin_prefix_table(tk, t_num, t_den)
    a = prefix.select(
        F.col("doc_id").alias("doc_a"), "token", F.col("n").alias("n_a")
    )
    b = prefix.select(
        F.col("doc_id").alias("doc_b"), "token", F.col("n").alias("n_b")
    )
    cands = (
        a.join(b, "token")
        .where(F.col("doc_a") < F.col("doc_b"))
        .where(
            F.least("n_a", "n_b") * t_den >= F.greatest("n_a", "n_b") * t_num
        )
        .select("doc_a", "doc_b", "n_a", "n_b")
        .distinct()
    )
    x = tk.select(F.col("doc_id").alias("doc_a"), "token")
    y = tk.select(F.col("doc_id").alias("doc_b"), "token")
    overlap = (
        cands.join(x, "doc_a")
        .join(y, ["doc_b", "token"])
        .groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    union = F.col("n_a") + F.col("n_b") - F.col("n_overlap")
    return (
        overlap.where(F.col("n_overlap") * t_den >= union * t_num)
        .select(
            "doc_a",
            "doc_b",
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.col("n_overlap").cast("bigint").alias("n_overlap"),
            F.expr("CAST((1000 * n_overlap) div (n_a + n_b - n_overlap) AS BIGINT)")
            .alias("j_permille"),
        )
    )
