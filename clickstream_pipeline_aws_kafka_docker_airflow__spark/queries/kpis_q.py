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
