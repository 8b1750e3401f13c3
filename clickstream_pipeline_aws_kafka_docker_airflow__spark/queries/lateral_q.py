"""Lateral explode + outer-join coverage."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load_table
from ..registry import register

TOP_TOKENS_K = 25


@register(
    "top_tokens",
    oracle=f"""
SELECT token, n, CAST(rn AS BIGINT) AS rn
FROM (
    SELECT token, n,
           ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rn
    FROM (
        SELECT token, COUNT(*) AS n
        FROM (
            SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
            FROM documents
        )
        WHERE token <> ''
        GROUP BY token
    )
)
WHERE rn <= {TOP_TOKENS_K}
""",
)
def top_tokens(spark, sf_dir):
    """Lateral explode -> global top-k: corpus-wide token frequencies.

    Scale shape: ``orderBy(...).limit(K)`` compiles to
    TakeOrderedAndProject — per-partition top-K heaps merged at the
    driver — so the full vocabulary (itself huge at 100 TB) is never
    globally sorted and never funneled through one WindowExec
    partition. Ranks are then assigned on the K survivors WITHOUT a
    window: rn = 1 + count of survivors strictly ahead in the sort
    order, via a K x K broadcast self-join — no Window node anywhere in
    the plan, so nothing ever moves 'all data to a single partition'."""
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select(
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token")
        )
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    topk = counts.orderBy(F.col("n").desc(), F.col("token")).limit(TOP_TOKENS_K)
    other = topk.select(F.col("n").alias("n2"), F.col("token").alias("token2"))
    ahead = (F.col("n2") > F.col("n")) | (
        (F.col("n2") == F.col("n")) & (F.col("token2") < F.col("token"))
    )
    return (
        topk.join(F.broadcast(other))
        .groupBy("token", "n")
        .agg((F.sum(ahead.cast("int")) + 1).cast("bigint").alias("rn"))
    )


@register(
    "join_outer_daily",
    oracle="""
WITH p AS (
    SELECT CAST(ts AS DATE) AS dt, COUNT(*) AS n_purchases
    FROM events WHERE event_type = 'purchase' GROUP BY 1
), e AS (
    SELECT CAST(ts AS DATE) AS dt, COUNT(*) AS n_errors
    FROM events WHERE event_type = 'error' GROUP BY 1
)
SELECT coalesce(p.dt, e.dt) AS dt,
       coalesce(n_purchases, 0) AS n_purchases,
       coalesce(n_errors, 0) AS n_errors
FROM p FULL OUTER JOIN e ON p.dt = e.dt
""",
)
def join_outer_daily(spark, sf_dir):
    """FULL OUTER join coverage: daily purchase vs error counts with
    either side possibly absent.

    r12 shape: both join inputs were conditional rollups of ONE fact
    table keyed the same way, so one scan + conditional counts replaces
    two scans + a full-outer sort-merge join
    (docs/REUSE_CENSUS_r12.json flagged the duplicate scans). The one
    place the join is NOT a per-key zip is the NULL key — a full outer
    join never matches NULL to NULL, so a NULL date with both purchases
    and errors yields TWO half-rows — reproduced exactly by the
    NULL-split explode below (exercised by the NULL-dense fuzz,
    tests/test_crossengine_fuzz.py)."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "error")
    )
    g = ev.groupBy(F.to_date("ts").alias("dt")).agg(
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("np"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("ne"),
    )
    zero = F.lit(0).cast("bigint")
    pair = lambda a, b: F.struct(a.alias("np"), b.alias("ne"))  # noqa: E731
    empty = F.array().cast("array<struct<np:bigint,ne:bigint>>")
    null_split = F.concat(
        F.when(F.col("np") > 0, F.array(pair(F.col("np"), zero))).otherwise(
            empty
        ),
        F.when(F.col("ne") > 0, F.array(pair(zero, F.col("ne")))).otherwise(
            empty
        ),
    )
    rows = F.when(
        F.col("dt").isNotNull(), F.array(pair(F.col("np"), F.col("ne")))
    ).otherwise(null_split)
    return g.select("dt", F.explode(rows).alias("r")).select(
        "dt",
        F.col("r.np").alias("n_purchases"),
        F.col("r.ne").alias("n_errors"),
    )


TOP_PER_LANG_K = 10


@register(
    "top_tokens_per_lang",
    oracle=f"""
SELECT lang, token, n, CAST(rn AS BIGINT) AS rn
FROM (
    SELECT lang, token, n,
           ROW_NUMBER() OVER (PARTITION BY lang
                              ORDER BY n DESC, token) AS rn
    FROM (
        SELECT lang, token, COUNT(*) AS n
        FROM (
            SELECT lang,
                   unnest(regexp_split_to_array(trim(lower(text)), '\\s+'))
                       AS token
            FROM documents
        )
        WHERE token <> ''
        GROUP BY lang, token
    )
)
WHERE rn <= {TOP_PER_LANG_K}
""",
)
def top_tokens_per_lang(spark, sf_dir):
    """Per-language top-k tokens — the GROUPED complement of
    ``top_tokens``: here the rank IS a window, but partitioned by
    ``lang``, so the rank<={TOP_PER_LANG_K} predicate compiles to
    WindowGroupLimit (per-partition top-k heaps BEFORE the shuffle —
    the same plan shape pinned for topn_parts_per_brand) and no single
    reducer ever sees more than one language's survivors. The global
    variant deliberately avoids Window entirely; this one shows the
    partitioned form scales where the unpartitioned form would not.
    """
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select(
            "lang",
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token"),
        )
        .where(F.col("token") != "")
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("token"))
    return (
        counts.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= TOP_PER_LANG_K)
    )
