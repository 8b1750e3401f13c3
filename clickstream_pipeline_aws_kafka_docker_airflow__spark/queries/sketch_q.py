"""Mergeable-sketch pre-aggregation: the pattern that makes distinct
counts incremental at 100 TB.

``COUNT(DISTINCT user_id)`` over an arbitrary date range normally
re-scans every day of raw events, because daily distincts don't add.
The scalable alternative — what the reference's daily KPI job
(daily_kpis.py:109-140) would grow into at warehouse scale — is a
*sketch zone*: one HyperLogLog sketch per day, built once at ingest
time, then merged (register-wise max) over any range in O(days) instead
of O(events). ``hll_union_agg`` is associative and commutative, so the
merge is partition-order deterministic and re-aggregates freely across
rollup levels (day -> week -> month) without touching raw data again.

Cross-engine contract (same scheme as ``kpi_daily_approx``): the HLL
estimate is engine-specific, so the query emits the exact figures plus
an in-query boolean asserting the merged sketch landed within the error
band, and the oracle asserts that boolean TRUE. lgConfigK=14 gives
rsd ~= 1.04/sqrt(2^14) = 0.8%, so the 5% band is a >6-sigma margin.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

HLL_LG_CONFIG_K = 14


@register(
    "hll_range_distinct",
    oracle="""
SELECT date_trunc('week', CAST(ts AS DATE)) AS wk,
       CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
       COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS hll_within_5pct
FROM events
GROUP BY 1
""",
)
def hll_range_distinct(spark, sf_dir):
    """Weekly distinct users via daily-sketch merge.

    Plan shape: phase 1 collapses events to (dt, user_id) partials
    (the same dedup-first shape as ``kpi_daily_approx``); phase 2
    builds ONE sketch per day from the deduplicated keys; phase 3
    merges the 7 daily sketches per ISO week with ``hll_union_agg`` —
    the step that at 100 TB reads a sketch table of a few KB/day
    instead of re-scanning raw events. The exact weekly distinct is
    computed alongside only to feed the contract boolean; production
    drops it and keeps the sketch path (one narrow shuffle over
    (dt, user) keys, then O(days) rows).
    """
    e = load_table(spark, sf_dir, "events")
    day_user = e.groupBy(F.to_date("ts").alias("dt"), "user_id").agg(
        F.count(F.lit(1)).alias("_n")
    )
    wk = F.date_trunc("week", F.col("dt")).cast("date").alias("wk")
    # the daily sketch zone: one row per day, mergeable forever after
    daily = day_user.groupBy("dt").agg(
        F.hll_sketch_agg("user_id", F.lit(HLL_LG_CONFIG_K)).alias("sk")
    )
    weekly_est = daily.groupBy(wk).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_est"),
    )
    weekly_exact = (
        day_user.select(wk, "user_id")
        .distinct()
        .groupBy("wk")
        # count(user_id), not count(*): COUNT DISTINCT excludes nulls
        .agg(F.count("user_id").alias("exact_users"))
    )
    return weekly_est.join(weekly_exact, "wk").select(
        "wk",
        "n_days",
        "exact_users",
        (
            F.abs(F.col("_est") - F.col("exact_users"))
            <= F.col("exact_users") * 0.05
        ).alias("hll_within_5pct"),
    )
