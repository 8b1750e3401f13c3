"""Near-dup queries + DuckDB oracles.

The oracle SQL is generated from the SAME constants
(shingle width, hash count, band size, bit count) as the Spark
operators, so the two implementations cannot drift apart silently.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_table
from ..operators.dedup import (
    BAND_SIZE,
    NUM_HASHES,
    SHINGLE_DF_CAP,
    SHINGLE_N,
    SIMHASH_BITS,
    minhash_near_dup,
    simhash_fingerprints,
    token_hash32_sql,
)
from ..registry import register

_TOKS = r"regexp_split_to_array(trim(lower(text)), '\s+')"


def shingles_table(spark, sf_dir, n: int = SHINGLE_N):
    """Materialized distinct word-n-gram table (doc_id, shingle) — the
    dedup job's staging table, built once per corpus snapshot and
    scanned by every consumer (MinHash signatures, Jaccard sizes, both
    sides of the common-shingle join) instead of re-running the
    tokenize + explode + distinct chain per query. Width-keyed: the
    near-dup detectors share the 3-gram table, the contamination
    screen its 5-gram one."""
    import os

    from ..operators.artifacts import materialized
    from ..operators.dedup import shingle_table

    return materialized(
        spark,
        os.path.join(sf_dir, "documents.parquet"),
        "shingles",
        lambda: shingle_table(load_table(spark, sf_dir, "documents"), n),
        params=f"n{n}",
    )


def doc_sizes_table(spark, sf_dir, n: int = SHINGLE_N):
    """Materialized (doc_id, n) distinct-shingle counts — the companion
    artifact a production zone keeps next to its band index so Jaccard
    verification never re-aggregates the corpus staging table per
    batch. One bigint per doc; built in the same snapshot job as
    shingles_table."""
    import os

    from ..operators.artifacts import materialized

    return materialized(
        spark,
        os.path.join(sf_dir, "documents.parquet"),
        "doc_sizes",
        lambda: shingles_table(spark, sf_dir, n)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n")),
        params=f"n{n}",
    )


def minhash_pairs_table(spark, sf_dir):
    """Materialized MinHash candidate-pair table (id_a, id_b, jaccard)
    — the near-dup DETECTOR job's raw output, before any threshold.
    Downstream consumers (the thresholded dup list, cluster labeling,
    cross-modal checks, this round's admission screen) filter or join
    it instead of re-running sign/band/verify per query."""
    import os

    from ..operators.artifacts import materialized

    return materialized(
        spark,
        os.path.join(sf_dir, "documents.parquet"),
        "minhash_pairs",
        lambda: minhash_near_dup(
            load_table(spark, sf_dir, "documents"),
            shingles=shingles_table(spark, sf_dir),
        ),
        params=f"n{SHINGLE_N}k{NUM_HASHES}b{BAND_SIZE}",
    )


def simhash_fps_table(spark, sf_dir, bits):
    """Materialized SimHash fingerprint table (doc_id, simhash) at the
    given width — built once per snapshot; pairing and storage queries
    read it instead of re-hashing every token."""
    import os

    from ..operators.artifacts import materialized

    return materialized(
        spark,
        os.path.join(sf_dir, "documents.parquet"),
        "simhash_fps",
        lambda: simhash_fingerprints(
            load_table(spark, sf_dir, "documents"), bits
        ),
        params=f"b{bits}",
    )


def _minhash_base_ctes() -> str:
    """Shared oracle prefix — tokenize, shingle, sign, band. Ends in
    ``bands(doc_id, band, bkey)`` and also exposes ``sh(doc_id,
    shingle)`` for the verify stages of its consumers."""
    mins = ",\n           ".join(
        f"min(md5('{i}|' || shingle)) AS mh{i}" for i in range(NUM_HASHES)
    )
    n_bands = NUM_HASHES // BAND_SIZE
    band_rows = "\n    UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({key}) AS bkey FROM sig".format(
            b=b,
            key=" || ".join(
                f"mh{b * BAND_SIZE + j}" for j in range(BAND_SIZE)
            ),
        )
        for b in range(n_bands)
    )
    return f"""toks AS (
    SELECT doc_id, {_TOKS} AS t FROM documents
), sh AS (
    SELECT DISTINCT doc_id,
           unnest(list_transform(generate_series(1, len(t) - {SHINGLE_N - 1}),
                  i -> array_to_string(list_slice(t, i, i + {SHINGLE_N - 1}), ' '))) AS shingle
    FROM toks
    WHERE len(t) >= {SHINGLE_N}
), sig AS (
    SELECT doc_id, {mins}
    FROM sh GROUP BY doc_id
), bands AS (
    {band_rows}
)"""


def _minhash_oracle() -> str:
    return f"""
WITH {_minhash_base_ctes()}, cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
                             AND a.doc_id < b.doc_id
), sizes AS (
    SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), common AS (
    SELECT c.id_a, c.id_b, COUNT(*) AS n_common
    FROM cand c
    JOIN sh s1 ON s1.doc_id = c.id_a
    JOIN sh s2 ON s2.doc_id = c.id_b AND s2.shingle = s1.shingle
    GROUP BY 1, 2
)
SELECT c.id_a, c.id_b,
       ROUND(CAST(COALESCE(n_common, 0) AS DOUBLE)
             / (sa.n + sb.n - COALESCE(n_common, 0)), 4) AS jaccard
FROM cand c
LEFT JOIN common USING (id_a, id_b)
JOIN sizes sa ON sa.doc_id = c.id_a
JOIN sizes sb ON sb.doc_id = c.id_b
"""


@register("dedup_near_minhash", oracle=_minhash_oracle())
def dedup_near_minhash(spark, sf_dir):
    """ext_dedup_near: MinHash signatures -> LSH bands -> candidate
    pairs -> exact n-gram Jaccard on candidates only. Served from the
    MATERIALIZED pair table (minhash_pairs_table) — the detector runs
    once per snapshot; every consumer reads its output."""
    return minhash_pairs_table(spark, sf_dir)


# Zone split for the incremental-admission demo: every 5th doc plays
# the incoming batch, the rest the existing corpus. Same constant feeds
# the Spark predicate and the oracle.
_NEW_MOD = 5


def old_zone_bands_table(spark, sf_dir):
    """Materialized (doc_id, band, bkey) LSH band index of the EXISTING
    zone — the persisted signature zone a production pipeline keeps
    next to the corpus so each incoming batch probes an index instead
    of re-signing history."""
    import os

    from ..operators.artifacts import materialized
    from ..operators.dedup import band_table, minhash_signatures

    def _build():
        sh_old = shingles_table(spark, sf_dir).where(
            F.col("doc_id") % _NEW_MOD != 0
        )
        return band_table(minhash_signatures(sh_old))

    return materialized(
        spark,
        os.path.join(sf_dir, "documents.parquet"),
        "minhash_bands_old",
        _build,
        params=f"n{SHINGLE_N}k{NUM_HASHES}b{BAND_SIZE}mod{_NEW_MOD}",
    )


def _incremental_oracle() -> str:
    # Admission decided by integer cross-multiplication against the
    # exact rational threshold (never a rounded float); ROUND appears
    # only in the reported jaccard column — mirrors
    # operators/dedup.py::incremental_admission.
    from ..operators.dedup import J_ADMIT_DEN, J_ADMIT_NUM

    return f"""
WITH {_minhash_base_ctes()}, cand AS (
    SELECT DISTINCT a.doc_id AS id_new, b.doc_id AS id_old
    FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
    WHERE a.doc_id % {_NEW_MOD} = 0 AND b.doc_id % {_NEW_MOD} <> 0
), sizes AS (
    SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), common AS (
    SELECT c.id_new, c.id_old, COUNT(*) AS n_common
    FROM cand c
    JOIN sh s1 ON s1.doc_id = c.id_new
    JOIN sh s2 ON s2.doc_id = c.id_old AND s2.shingle = s1.shingle
    GROUP BY 1, 2
), jac AS (
    SELECT c.id_new, c.id_old,
           COALESCE(n_common, 0) AS n_common,
           sa.n + sb.n - COALESCE(n_common, 0) AS n_union,
           CAST(COALESCE(n_common, 0) AS DOUBLE)
                 / (sa.n + sb.n - COALESCE(n_common, 0)) AS j_exact
    FROM cand c
    LEFT JOIN common USING (id_new, id_old)
    JOIN sizes sa ON sa.doc_id = c.id_new
    JOIN sizes sb ON sb.doc_id = c.id_old
), best AS (
    SELECT id_new, id_old, ROUND(j_exact, 4) AS j,
           ROW_NUMBER() OVER (PARTITION BY id_new
                              ORDER BY j_exact DESC, id_old) AS rn
    FROM jac WHERE n_common * {J_ADMIT_DEN} >= n_union * {J_ADMIT_NUM}
)
SELECT d.doc_id,
       b.id_new IS NULL AS admitted,
       b.id_old AS dup_of,
       b.j AS jaccard
FROM documents d
LEFT JOIN best b ON b.id_new = d.doc_id AND b.rn = 1
WHERE d.doc_id % {_NEW_MOD} = 0
"""


@register("incremental_dedup_batch", oracle=_incremental_oracle())
def incremental_dedup_batch(spark, sf_dir):
    """Batch admission of an incoming doc batch against the existing
    corpus: new docs are signed and probed against the PERSISTED band
    index of the old zone (old_zone_bands_table artifact), colliding
    pairs are exact-Jaccard-verified, and each new doc gets a verdict —
    admitted, or rejected with its best old-zone match. The batch twin
    of the streaming online dedup (streaming/corpus_ingest.py); per-
    batch cost scales with the batch, not the corpus."""
    from ..operators.dedup import incremental_admission

    docs = load_table(spark, sf_dir, "documents")
    new_ids = docs.where(F.col("doc_id") % _NEW_MOD == 0).select("doc_id")
    return incremental_admission(
        new_ids,
        shingles_table(spark, sf_dir),
        old_zone_bands_table(spark, sf_dir),
        sizes=doc_sizes_table(spark, sf_dir),
    )


def _simhash_ctes(bits: int = SIMHASH_BITS) -> str:
    # identical per-bit +1/-1 construction; DuckDB strpos(str, ch) ==
    # Spark locate(ch, str), handled inside token_hash_sql via locate
    # on Spark — here we inline the DuckDB spelling. Ends in
    # ``fps(doc_id, simhash)`` for composition. The token hash is
    # ceil(bits/4) nibbles, mirroring simhash_fingerprints.
    n_nibbles = max(8, -(-bits // 4))
    h = "md5(token)"
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr({h}, {p + 1}, 1)) - 1)"
        f" * {16 ** (n_nibbles - 1 - p)}"
        for p in range(n_nibbles)
    )
    bit_sums = ",\n           ".join(
        f"SUM(CASE WHEN (h32 // {1 << j}) % 2 = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(bits)
    )
    fp = " + ".join(
        f"CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(bits)
    )
    return f"""tok AS (
    SELECT DISTINCT doc_id, token
    FROM (SELECT doc_id, unnest({_TOKS}) AS token FROM documents)
), th AS (
    SELECT doc_id, ({terms}) AS h32 FROM tok WHERE token <> ''
), agg AS (
    SELECT doc_id, {bit_sums}
    FROM th GROUP BY doc_id
), fps AS (
    SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM agg
)"""


def _simhash_oracle() -> str:
    return f"WITH {_simhash_ctes()} SELECT doc_id, simhash FROM fps"


@register("simhash_fingerprints", oracle=_simhash_oracle())
def simhash_q(spark, sf_dir):
    """ext SimHash: 32-bit sign-sum fingerprint over distinct tokens —
    served from the materialized fingerprint artifact (built once per
    snapshot by the dedup job; values round-trip exactly)."""
    return simhash_fps_table(spark, sf_dir, SIMHASH_BITS)


def _simhash_near_dup_oracle() -> str:
    from ..operators.dedup import (
        SIMHASH_BANDS,
        SIMHASH_BAND_DF_CAP,
        SIMHASH_MAX_HAMMING,
        SIMHASH_ND_BITS,
    )

    w = SIMHASH_ND_BITS // SIMHASH_BANDS
    band_rows = "\n    UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, (simhash // {1 << (b * w)}) % {1 << w}"
        f" AS bval FROM fps"
        for b in range(SIMHASH_BANDS)
    )
    return f"""
WITH {_simhash_ctes(SIMHASH_ND_BITS)},
bands AS (
    {band_rows}
), keep AS (
    SELECT band, bval FROM bands GROUP BY band, bval
    HAVING COUNT(*) <= {SIMHASH_BAND_DF_CAP}
), bk AS (
    SELECT bands.* FROM bands JOIN keep USING (band, bval)
), cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bk a JOIN bk b ON a.band = b.band AND a.bval = b.bval
                       AND a.doc_id < b.doc_id
)
SELECT c.id_a, c.id_b,
       CAST(bit_count(xor(fa.simhash, fb.simhash)) AS BIGINT) AS hamming
FROM cand c
JOIN fps fa ON fa.doc_id = c.id_a
JOIN fps fb ON fb.doc_id = c.id_b
WHERE bit_count(xor(fa.simhash, fb.simhash)) <= {SIMHASH_MAX_HAMMING}
"""


def simhash_pairs_table(spark, sf_dir):
    """Materialized SimHash near-dup pair table — the banded-blocking
    detector's output, built once per snapshot from the fingerprint
    artifact like its MinHash/exact-Jaccard siblings; consumers read
    the pair list."""
    import os

    from ..operators.artifacts import materialized
    from ..operators.dedup import (
        SIMHASH_BANDS,
        SIMHASH_MAX_HAMMING,
        SIMHASH_ND_BITS,
        simhash_near_dup,
    )

    return materialized(
        spark,
        os.path.join(sf_dir, "documents.parquet"),
        "simhash_pairs",
        lambda: simhash_near_dup(
            load_table(spark, sf_dir, "documents"),
            fps=simhash_fps_table(spark, sf_dir, SIMHASH_ND_BITS),
        ),
        params=f"b{SIMHASH_ND_BITS}x{SIMHASH_BANDS}h{SIMHASH_MAX_HAMMING}",
    )


@register("simhash_near_dup", oracle=_simhash_near_dup_oracle())
def simhash_near_dup_q(spark, sf_dir):
    """ext_dedup_near (SimHash variant): banded fingerprint blocking —
    with n_bands > max_hamming any within-distance pair collides on at
    least one band (pigeonhole), so candidates have full recall and the
    exact popcount verify has zero false positives. Completes the
    SimHash path from fingerprint-only to end-to-end pairing. Served
    from the MATERIALIZED pair table (simhash_pairs_table), itself
    built from the wide-fingerprint artifact (simhash_fps_table)."""
    return simhash_pairs_table(spark, sf_dir)


def _ngram_jaccard_oracle() -> str:
    """Candidate generation by shared shingle (no LSH): any pair with
    >=1 common non-boilerplate 3-gram gets an exact Jaccard. The
    document-frequency cap mirrors operators/dedup.py::
    ngram_jaccard_all_pairs — capped vocabulary on both engines."""
    return f"""
WITH toks AS (
    SELECT doc_id, {_TOKS} AS t FROM documents
), sh0 AS (
    SELECT DISTINCT doc_id,
           unnest(list_transform(generate_series(1, len(t) - {SHINGLE_N - 1}),
                  i -> array_to_string(list_slice(t, i, i + {SHINGLE_N - 1}), ' '))) AS shingle
    FROM toks
    WHERE len(t) >= {SHINGLE_N}
), keep AS (
    SELECT shingle FROM sh0 GROUP BY shingle HAVING COUNT(*) <= {SHINGLE_DF_CAP}
), sh AS (
    SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN keep USING (shingle)
), sizes AS (
    SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), common AS (
    SELECT s1.doc_id AS id_a, s2.doc_id AS id_b, COUNT(*) AS n_common
    FROM sh s1 JOIN sh s2 ON s1.shingle = s2.shingle AND s1.doc_id < s2.doc_id
    GROUP BY 1, 2
)
SELECT c.id_a, c.id_b,
       ROUND(CAST(c.n_common AS DOUBLE) / (sa.n + sb.n - c.n_common), 4) AS jaccard
FROM common c
JOIN sizes sa ON sa.doc_id = c.id_a
JOIN sizes sb ON sb.doc_id = c.id_b
WHERE CAST(c.n_common AS DOUBLE) / (sa.n + sb.n - c.n_common) >= 0.05
"""


def ngram_pairs_table(spark, sf_dir):
    """Materialized exact all-pairs Jaccard table (id_a, id_b, jaccard)
    — the exact detector's output, built once per corpus snapshot like
    its MinHash sibling (minhash_pairs_table); consumers read the pair
    list instead of re-running the shingle self-join per query."""
    import os

    from ..operators.artifacts import materialized
    from ..operators.dedup import SHINGLE_DF_CAP, ngram_jaccard_all_pairs

    threshold = 0.05
    return materialized(
        spark,
        os.path.join(sf_dir, "documents.parquet"),
        "ngram_pairs",
        lambda: ngram_jaccard_all_pairs(
            load_table(spark, sf_dir, "documents"),
            threshold=threshold,
            shingles=shingles_table(spark, sf_dir),
        ),
        params=f"n{SHINGLE_N}cap{SHINGLE_DF_CAP}t{threshold}",
    )


@register("ngram_jaccard_pairs", oracle=_ngram_jaccard_oracle())
def ngram_jaccard_pairs(spark, sf_dir):
    """ext_dedup_near (exact variant): all-pairs n-gram Jaccard with
    shared-shingle blocking and a shingle document-frequency cap — the
    skew guard that keeps the self-join's per-key group size bounded at
    100 TB (see operators/dedup.py::ngram_jaccard_all_pairs — incl.
    the documented scale boundary of the all-pairs tier). Served from
    the MATERIALIZED pair table (ngram_pairs_table): the exact detector
    runs once per snapshot, consumers read its output."""
    return ngram_pairs_table(spark, sf_dir)


def _ppjoin_oracle() -> str:
    from ..operators.dedup import PPJ_T_DEN, PPJ_T_NUM

    tn, td = PPJ_T_NUM, PPJ_T_DEN
    return f"""
WITH toks0 AS (
    SELECT doc_id, {_TOKS} AS t FROM documents
), tk AS (
    SELECT DISTINCT doc_id,
           unnest(list_transform(generate_series(1, len(t) - {SHINGLE_N - 1}),
                  i -> array_to_string(list_slice(t, i, i + {SHINGLE_N - 1}), ' '))) AS token
    FROM toks0
    WHERE len(t) >= {SHINGLE_N}
), df AS (
    SELECT token, COUNT(*) AS df FROM tk GROUP BY token
), sizes AS (
    SELECT doc_id, COUNT(*) AS n FROM tk GROUP BY doc_id
), ranked AS (
    SELECT t.doc_id, t.token, s.n,
           ROW_NUMBER() OVER (PARTITION BY t.doc_id
                              ORDER BY d.df, t.token) AS rn
    FROM tk t JOIN df d USING (token) JOIN sizes s USING (doc_id)
), prefix AS (
    SELECT doc_id, token, n FROM ranked
    WHERE rn <= n - ({tn}*n + {td - 1}) // {td} + 1
), cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.n AS n_a, b.n AS n_b
    FROM prefix a JOIN prefix b ON a.token = b.token
                              AND a.doc_id < b.doc_id
    WHERE {td}*LEAST(a.n, b.n) >= {tn}*GREATEST(a.n, b.n)
), overlap AS (
    SELECT c.doc_a, c.doc_b, c.n_a, c.n_b, COUNT(*) AS o
    FROM cand c
    JOIN tk x ON x.doc_id = c.doc_a
    JOIN tk y ON y.doc_id = c.doc_b AND y.token = x.token
    GROUP BY 1, 2, 3, 4
)
SELECT doc_a, doc_b,
       CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b,
       CAST(o AS BIGINT) AS n_overlap,
       CAST((1000 * o) // (n_a + n_b - o) AS BIGINT) AS j_permille
FROM overlap
WHERE {td}*o >= {tn}*(n_a + n_b - o)
"""


@register("ppjoin_shingle_pairs", oracle=_ppjoin_oracle())
def ppjoin_shingle_pairs(spark, sf_dir):
    """ext_dedup_near (prefix-filter variant): EXACT 3-gram-shingle
    Jaccard join at t = 0.6 with full recall, full precision, and no
    df cap — candidates blocked on each document's df-RAREST prefix
    shingles only (PPJoin family; see operators/dedup.py::ppjoin_pairs
    for the scale argument). The shingle universe (not unit tokens) is
    the right set representation for templated corpora: unit-token sets
    of boilerplate docs are near-identical (measured 7.1M pairs >= 0.6
    at sf0.1) while their 3-gram sets separate cleanly (~300 pairs).
    Reads the same materialized shingle staging table as the MinHash
    tier — one artifact, three detectors."""
    import os

    from ..operators.artifacts import materialized
    from ..operators.dedup import PPJ_T_DEN, PPJ_T_NUM, ppjoin_pairs

    def _build():
        toks = shingles_table(spark, sf_dir).withColumnRenamed(
            "shingle", "token"
        )
        return ppjoin_pairs(
            load_table(spark, sf_dir, "documents"), toks=toks
        )

    return materialized(
        spark,
        os.path.join(sf_dir, "documents.parquet"),
        "ppjoin_pairs",
        _build,
        params=f"n{SHINGLE_N}t{PPJ_T_NUM}d{PPJ_T_DEN}",
    )


# keep the generated-SQL helper importable for tests
_ = token_hash32_sql
