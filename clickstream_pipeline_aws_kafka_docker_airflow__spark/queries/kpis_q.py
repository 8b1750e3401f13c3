"""KPI queries over the driver ``events`` table + DuckDB oracles.

Maps the reference's daily-KPI semantics (daily_kpis.py:109-140) onto
the driver schema: ``ts`` for event time, ``user_id`` distinct,
``value`` as price. The driver events carry no session column, so
``unique_sessions`` is exercised separately in the clickstream unit
tests (tests/test_kpis.py) on reference-shaped data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_table
from ..operators.kpis import daily_kpis, hourly_rollup, single_day_kpis
from ..registry import register

# CASE-insensitive classification, exactly daily_kpis.py:123-127.
_PV = "lower(coalesce(event_type,'')) IN ('page_view','pageview','view')"
_PU = "lower(coalesce(event_type,'')) IN ('purchase','order','checkout')"
# decimal accumulation -> order-independent (see scalars.dec_sum_round2)
_REV = (
    f"CAST(ROUND(SUM(CAST(CASE WHEN {_PU} THEN coalesce(TRY_CAST(value AS DOUBLE),0.0) "
    "ELSE 0.0 END AS DECIMAL(24,8))), 2) AS DOUBLE)"
)

_KPI_COLS = f"""
    COUNT(*) AS total_events,
    COUNT(DISTINCT user_id) AS unique_users,
    COUNT(CASE WHEN {_PV} THEN 1 END) AS pageviews,
    COUNT(CASE WHEN {_PU} THEN 1 END) AS purchases,
    {_REV} AS revenue_usd"""


@register(
    "kpi_daily",
    oracle=f"""
SELECT CAST(ts AS DATE) AS dt,{_KPI_COLS}
FROM events
GROUP BY CAST(ts AS DATE)
""",
)
def kpi_daily(spark, sf_dir):
    """Flagship: agg_groupby_day + all of §2.3 in one pass."""
    return daily_kpis(load_table(spark, sf_dir, "events"))


@register(
    "kpi_single_day",
    oracle=f"""
SELECT{_KPI_COLS}, '2024-01-15' AS dt
FROM events
WHERE CAST(ts AS DATE) = DATE '2024-01-15'
""",
)
def kpi_single_day(spark, sf_dir):
    """The reference's true unit of work: one run-date per invocation
    (daily_kpis.py:142-174), exercising the partition-pruning filter."""
    return single_day_kpis(load_table(spark, sf_dir, "events"), "2024-01-15")


@register(
    "kpi_hourly",
    oracle=f"""
SELECT CAST(ts AS DATE) AS dt, hour(ts) AS hh,{_KPI_COLS}
FROM events
GROUP BY 1, 2
""",
)
def kpi_hourly(spark, sf_dir):
    """agg_groupby_bucket: the ingest (date,hour) bucketing as a rollup."""
    return hourly_rollup(load_table(spark, sf_dir, "events"))


_UNPIVOT_METRICS = (
    "total_events",
    "unique_users",
    "pageviews",
    "purchases",
    "revenue_usd",
)


@register(
    "unpivot_kpi_metrics",
    oracle=f"""
WITH k AS (
    SELECT CAST(ts AS DATE) AS dt,{_KPI_COLS}
    FROM events
    GROUP BY CAST(ts AS DATE)
)
"""
    + "\nUNION ALL\n".join(
        f"SELECT dt, '{m}' AS metric, CAST({m} AS DOUBLE) AS value FROM k"
        for m in _UNPIVOT_METRICS
    ),
)
def unpivot_kpi_metrics(spark, sf_dir):
    """The KPI row melted long — (dt, metric, value) — the shape a
    metrics store / dashboard timeseries ingests (the inverse of
    ``pivot_event_counts``).

    Scale: ``unpivot`` is the Expand operator — a 5x map-side row
    fan-out of the ALREADY-AGGREGATED daily table (O(days) rows), zero
    extra shuffles. Counts are integer-valued doubles (exact in IEEE)
    and revenue is the 2-dp decimal round, so the long values hash
    identically cross-engine.
    """
    k = daily_kpis(load_table(spark, sf_dir, "events"))
    wide = k.select(
        "dt", *[F.col(m).cast("double").alias(m) for m in _UNPIVOT_METRICS]
    )
    return wide.unpivot("dt", list(_UNPIVOT_METRICS), "metric", "value")


@register(
    "rolling_7d_kpis",
    oracle="""
WITH daily AS (
    -- a NULL-ts event belongs to no calendar day; keeping the NULL
    -- group would also put a NULL ordering key inside the RANGE frame,
    -- where the engines' NULL-placement defaults differ
    SELECT CAST(ts AS DATE) AS dt,
           CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day_no,
           COUNT(*) AS n,
           SUM(CAST(value AS DECIMAL(24,8))) AS revd
    FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
)
SELECT dt,
       CAST(SUM(n) OVER w AS BIGINT) AS n_events_7d,
       CAST(ROUND(SUM(revd) OVER w, 2) AS DOUBLE) AS revenue_7d
FROM daily
WINDOW w AS (ORDER BY day_no RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
)
def rolling_7d_kpis(spark, sf_dir):
    """Trailing-7-day KPI window: per day, events and revenue over the
    last 7 calendar days — a RANGE frame keyed on the integer day
    number, so GAPS in the calendar shrink the frame (unlike a
    6-ROWS-PRECEDING frame, which would silently reach further back).

    Scale: the frame runs over the AGGREGATED day table (one row per
    day — bounded), not the corpus; the single unpartitioned window is
    over O(days) rows by construction. Revenue accumulates in DECIMAL
    inside the frame — order-independent, exact under the driver hash.
    """
    from pyspark.sql import Window

    # NULL-ts events belong to no calendar day — dropped on both
    # engines (and a NULL day_no inside the RANGE frame would hit the
    # cross-engine NULL-placement divergence; see the oracle comment)
    e = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    daily = e.groupBy(
        F.to_date("ts").alias("dt"),
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("day_no"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(24,8)")).alias("revd"),
    )
    w = Window.orderBy("day_no").rangeBetween(-6, 0)
    return daily.select(
        "dt",
        F.sum("n").over(w).cast("bigint").alias("n_events_7d"),
        F.round(F.sum("revd").over(w), 2).cast("double").alias("revenue_7d"),
    )
