"""Behavioral analytics over the clickstream: ordered conversion
funnels and first-touch retention cohorts.

These extend the reference's per-day KPI counts (daily_kpis.py:118-140)
to the cross-day questions a product team asks next: "of the users who
viewed, how many clicked *after* viewing, then purchased *after*
clicking?" and "of the users first seen on day D, how many came back on
day D+n?". Neither exists in the reference; both are derivable from the
same events table, so they register with full DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.scalars import (
    dec_sum_round2,
    is_purchase,
    norm_event_type,
    price_or_zero,
)
from ..io import load_table
from ..registry import register


@register(
    "funnel_conversion",
    oracle="""
WITH v AS (
    SELECT user_id, MIN(ts) AS t1 FROM events
    WHERE lower(coalesce(event_type,'')) = 'view' GROUP BY 1
), c AS (
    SELECT e.user_id, MIN(e.ts) AS t2
    FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
    WHERE lower(coalesce(e.event_type,'')) = 'click' GROUP BY 1
), p AS (
    SELECT e.user_id, MIN(e.ts) AS t3
    FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
    WHERE lower(coalesce(e.event_type,'')) = 'purchase' GROUP BY 1
)
SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name, COUNT(*) AS n_users FROM v
UNION ALL
SELECT CAST(2 AS BIGINT), 'view_click', COUNT(*) FROM c
UNION ALL
SELECT CAST(3 AS BIGINT), 'view_click_purchase', COUNT(*) FROM p
""",
)
def funnel_conversion(spark, sf_dir):
    """Strictly-ordered 3-step funnel (view -> click -> purchase): each
    step counts users whose step event happened AFTER their previous
    step's first occurrence, not merely users who ever did both.

    Scale: every aggregate and join keys on ``user_id``, so Catalyst
    reuses one hash partitioning across the whole chain — the per-step
    min-timestamp frames are already co-partitioned with the events
    they filter, and each step's type filter pushes down to its scan.
    All three counts come from ONE final aggregate over the chained
    per-user frame (p ⊆ c ⊆ v), unpivoted to rows with ``explode`` —
    the per-step count-row + union formulation launched three extra
    single-row aggregation stages for the same answer. (Measured
    negative results, interleaved min-of-5 at sf0.1 AND sf1: a shared
    ``repartition("user_id")`` base — Catalyst pushes the type filters
    through it, splitting it into three exchanges — and a lazy
    localCheckpoint pin of that base — under AQE the LogicalRDD loses
    its partitioning metadata, so every consumer re-exchanges — are
    both within noise of this form while costing plan complexity.)
    No window over the raw events: a hot user's events stream through
    joins and partial aggs instead of buffering in a WindowExec frame.
    No broadcast: at 100 TB the per-step user sets are themselves
    fact-sized.

    v and c are PINNED (r11): each is consumed twice (the next step's
    derivation joins it INNER — inferring ``isnotnull(user_id)`` that
    pushes into that copy's scan — while the final count chain joins it
    LEFT with no such inference; the asymmetric filter makes the two
    copies canonicalize differently, so AQE exchange reuse cannot fire
    and the final plan re-aggregated each frame from a fresh events
    scan: 6 exchanges, 8 warm jobs). An explicit isnotnull on both
    sides would fix reuse but CHANGE results — the oracle counts the
    NULL-user group in step 1. The pins compute each frame once — 6
    warm jobs, one events pass per step; bounded by |users| rows (the
    rfm_segments pin class). This supersedes the r8-measured negatives
    above only in mechanism — the repartition base and the checkpoint
    pin both failed for reasons (filter-split, job boundaries) the
    CacheManager pin does not share.
    """
    e = load_table(spark, sf_dir, "events")
    et = norm_event_type("event_type")

    v = (
        e.where(et == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
        .persist()
    )
    c = (
        e.where(et == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
        .persist()
    )
    p = (
        e.where(et == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    # p ⊆ c ⊆ v by construction, so the chained left joins build one
    # per-user row whose t2/t3 are NULL where the user fell out of the
    # funnel — one exchange-free pass counts every step at once.
    # Step 1 must count ROWS of v, not non-null t1: a user whose view
    # events all carry NULL ts still forms a group (t1 = MIN(ts) =
    # NULL) and the oracle's COUNT(*) counts it (fuzz-caught). t2/t3
    # are never NULL inside their frames — they are minima over rows
    # that survived a ``ts > prev`` comparison — so counting them
    # counts exactly the c/p memberships.
    counts = (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .agg(
            F.count(F.lit(1)).alias("n1"),
            F.count("t2").alias("n2"),
            F.count("t3").alias("n3"),
        )
    )
    step = F.explode(
        F.array(
            F.struct(
                F.lit(1).cast("bigint").alias("step"),
                F.lit("view").alias("step_name"),
                F.col("n1").alias("n_users"),
            ),
            F.struct(
                F.lit(2).cast("bigint").alias("step"),
                F.lit("view_click").alias("step_name"),
                F.col("n2").alias("n_users"),
            ),
            F.struct(
                F.lit(3).cast("bigint").alias("step"),
                F.lit("view_click_purchase").alias("step_name"),
                F.col("n3").alias("n_users"),
            ),
        )
    )
    return counts.select(step.alias("_s")).select("_s.*")


@register(
    "retention_cohorts",
    oracle="""
WITH f AS (
    SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_dt
    FROM events GROUP BY 1
)
SELECT f.cohort_dt AS cohort_dt,
       CAST(date_diff('day', f.cohort_dt, CAST(e.ts AS DATE)) AS BIGINT) AS day_n,
       COUNT(DISTINCT e.user_id) AS n_users
FROM events e JOIN f ON e.user_id = f.user_id
GROUP BY 1, 2
""",
)
def retention_cohorts(spark, sf_dir):
    """First-touch retention triangle: cohort = a user's first active
    date; each (cohort, day-offset) cell counts distinct users active
    that many days after first touch.

    Scale (r12 single-pass shape): the r11 formulation joined events
    back to a first-touch rollup — two fact scans (the inner join's
    inferred ``isnotnull(user_id)`` split the scan subtrees, census
    docs/REUSE_CENSUS_r12.json) — but everything each cell needs is a
    function of one user's DISTINCT active dates, which are bounded by
    the calendar, so ONE aggregation per user collects that date set
    (map-side partials dedup before the only fact shuffle), the cohort
    and day-offsets fall out per row, and the final cell count is a
    plain COUNT over (user, day_n)-unique rows — exactly the join
    formulation's COUNT(DISTINCT user): 1 scan / 2 exchanges instead
    of 2 scans / join / distinct-expand. NULL users never survive the
    original inner join, so the explicit filter is identity; a user's
    NULL-ts activity keeps its (cohort, NULL) cell via the has_null
    channel (collect_set drops NULLs)."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    per_user = e.groupBy("user_id").agg(
        F.sort_array(F.collect_set(F.to_date("ts"))).alias("ds"),
        F.max(F.to_date("ts").isNull()).alias("has_null"),
    )
    cohort = F.get("ds", 0)  # min active date; NULL when all-ts-NULL
    day_ns = F.transform(
        "ds", lambda d: F.datediff(d, cohort).cast("bigint")
    )
    entries = F.when(
        F.col("has_null"),
        F.concat(day_ns, F.array(F.lit(None).cast("bigint"))),
    ).otherwise(day_ns)
    return (
        per_user.select(
            cohort.alias("cohort_dt"), F.explode(entries).alias("day_n")
        )
        .groupBy("cohort_dt", "day_n")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


RFM_ANCHOR = "2024-02-01"  # day after the testdata range; fixed so
# recency is deterministic (a now() anchor would break replay/oracles)
_RFM_PU = "lower(coalesce(event_type,'')) IN ('purchase','order','checkout')"
_RFM_REV = (
    f"CAST(ROUND(SUM(CAST(CASE WHEN {_RFM_PU} THEN "
    "coalesce(TRY_CAST(value AS DOUBLE), 0.0) ELSE 0.0 END "
    "AS DECIMAL(24,8))), 2) AS DOUBLE)"
)


@register(
    "rfm_segments",
    oracle=f"""
WITH u AS (
    SELECT user_id,
           date_diff('day', MAX(CAST(ts AS DATE)), DATE '{RFM_ANCHOR}')
               AS recency_days,
           COUNT(*) AS f_events,
           {_RFM_REV} AS m_revenue
    FROM events
    WHERE user_id IS NOT NULL
    GROUP BY 1
), q AS (
    SELECT *,
           -- NULLS LAST spelled: a user whose every event is NULL-ts
           -- has NULL recency (stalest quartile on both engines);
           -- Spark's ASC default would put them FIRST instead
           NTILE(4) OVER (ORDER BY recency_days NULLS LAST, user_id) AS r_q,
           NTILE(4) OVER (ORDER BY f_events DESC, user_id) AS f_q,
           NTILE(4) OVER (ORDER BY m_revenue DESC, user_id) AS m_q
    FROM u
)
SELECT user_id, recency_days, f_events, m_revenue, r_q, f_q, m_q,
       r_q * 100 + f_q * 10 + m_q AS rfm_segment
FROM q
""",
)
def rfm_segments(spark, sf_dir):
    """RFM (recency/frequency/monetary) quartile segmentation — the
    user-level marketing cut of the same purchase semantics as the
    daily KPI job (daily_kpis.py:123-131), against a fixed anchor date
    so the result is replay-deterministic.

    Scale: the events table collapses to one row per user FIRST (one
    shuffle on user_id with map-side partials); the three quartile
    assignments then ride ``exact_ntile_broadcast``
    (operators/rankstats.py) — the EXACT 3x3 cut composites are derived
    once from a skinny (user_id, dim, key) range-partitioned frame
    (bounded driver state, memoized per source identity) and buckets
    are assigned as broadcast-literal comparisons, NO WindowExec and
    ZERO exchanges beyond the user aggregation itself (plan-pinned in
    tests/test_plans_rankstats.py / test_plans_r4.py) — because an
    unpartitioned ``ntile`` window is a single-partition sort of the
    whole user table, the one corpus-growing reducer in the r7 plan.
    Tie-break on user_id makes every quartile assignment (and the
    oracle's) a total order, which the cut derivation requires.

    Measured (sf0.1, local[32], same-window min-of-2, r9): r8's
    ``exact_ntile_multi`` shape (wide explode x3 -> persist -> pivot
    groupBy over every base column) benched 2.34 s / 5 warm jobs; this
    shape benches 0.86 s / 1 warm job (cut derivation runs once per
    source identity — ~10 jobs on the first call including the u-cache
    materialization and AQE stages — then memoized; the warm pass is
    one cached-scan projection). Oracle unchanged, hash-green at
    sf0.001/0.01/0.1/adv/sf1 (r9 audit).
    """
    e = load_table(spark, sf_dir, "events")
    u = (
        e.where(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.datediff(
                F.lit(RFM_ANCHOR).cast("date"), F.max(F.to_date("ts"))
            )
            .cast("bigint")
            .alias("recency_days"),
            F.count(F.lit(1)).alias("f_events"),
            dec_sum_round2(
                F.when(is_purchase("event_type"), price_or_zero("value"))
                .otherwise(0.0)
            ).alias("m_revenue"),
        )
        # one materialization serves BOTH the cut derivation's sample +
        # counts passes and the final assignment scan (bounded:
        # user-level, never the corpus); correctness does not depend on
        # the pin — cuts are value-literals valid against any
        # recomputation of the same deterministic aggregate
        .persist()
    )
    from ..operators.rankstats import exact_ntile_broadcast

    # all three quartile orderings derived from ONE skinny range
    # shuffle (each key normalized to an order-exact double): NULL
    # recency (user has no dated events) pinned LAST = stalest quartile
    # on both engines via the +inf sentinel (Spark ASC default is
    # nulls-FIRST); DESC frequency/monetary via negation (no -0.0/0.0
    # mix arises: every m_revenue is a ROUND()ed decimal cast, so zero
    # is always +0.0 before negation)
    q = exact_ntile_broadcast(
        u,
        4,
        [
            (
                "r_q",
                F.coalesce(
                    F.col("recency_days").cast("double"),
                    F.lit(float("inf")),
                ),
            ),
            ("f_q", -F.col("f_events").cast("double")),
            ("m_q", -F.col("m_revenue")),
        ],
        "user_id",
        # memo-key file identity from the raw events scan: u itself is
        # persisted, and inputFiles() on a cached plan is empty (see
        # ntile_cuts_multi docstring)
        fingerprint_frame=e,
    )
    return q.select(
        "user_id",
        "recency_days",
        "f_events",
        "m_revenue",
        "r_q",
        "f_q",
        "m_q",
        (F.col("r_q") * 100 + F.col("f_q") * 10 + F.col("m_q")).alias(
            "rfm_segment"
        ),
    )


@register(
    "first_touch_attribution",
    oracle="""
WITH first_touch AS (
    -- a NULL-ts event has no position in the stream and cannot be the
    -- first touch (Spark ASC sorts NULL ts FIRST, DuckDB LAST — the
    -- engines would pick different "first" events for any user with a
    -- NULL-ts row); users whose every event is NULL-ts have no first
    -- touch and their purchases drop from the attribution join
    SELECT user_id,
           CAST(TRY_CAST(regexp_extract(props, '"k"\\s*:\\s*(-?\\d+)', 1) AS BIGINT)
                // 10 AS BIGINT) AS ft_bucket
    FROM (SELECT user_id, props,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM events WHERE ts IS NOT NULL)
    WHERE rn = 1
)
SELECT f.ft_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_buyers,
       CAST(ROUND(SUM(CAST(e.value AS DECIMAL(24,8))), 2) AS DOUBLE)
           AS attributed_value
FROM events e
JOIN first_touch f USING (user_id)
WHERE e.event_type = 'purchase'
GROUP BY f.ft_bucket
""",
)
def first_touch_attribution(spark, sf_dir):
    """First-touch attribution: every purchase credits its value to
    the segment (props-k decile) of the user's FIRST-ever event — the
    batch argmin/attribution pattern (the streaming twin is
    streaming/joins.py::attribution_join). Deterministic first pick
    via ROW_NUMBER with event_id tie-break, never min_by (whose tie
    behavior differs across engines).

    Scale: the first-touch table is one row PER USER — it grows with
    the corpus, so it is deliberately NOT broadcast; the purchase side
    is filtered before the shuffle and both sides hash-partition on
    user_id (AQE picks SMJ/shuffled-hash and handles skew). Revenue
    accumulates in DECIMAL.
    Hot-key note: like every user_id-windowed query, a bot-grade user
    concentrates this plan's shuffle into one task; the bounded-state
    remedy (bucket phase 1 by time, merge bounded per-user lists) is
    implemented and probe-measured in operators/sessionize.py +
    docs/SKEW_PROBE.json and applies to this shape unchanged.
    """
    from pyspark.sql import Window

    from ..functions.scalars import dec_sum_round2, props_int

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # NULL-ts rows can't be the first touch — dropped on both engines
    # (cross-engine NULL ordering divergence; see the oracle comment)
    first = (
        e.where(F.col("ts").isNotNull())
        .select("user_id", "ts", "event_id", props_int("props", "k").alias("ft_k"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", F.expr("CAST(ft_k div 10 AS BIGINT)").alias("ft_bucket"))
    )
    purchases = e.where(F.col("event_type") == "purchase")
    return (
        purchases.join(first, "user_id")
        .groupBy("ft_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.countDistinct("user_id").alias("n_buyers"),
            dec_sum_round2("value").alias("attributed_value"),
        )
    )
