"""Time-arithmetic query (f_time_arith, f_strftime_fmt):
the reference's timedelta/stepping/formatting idioms
(produce_events.py:58-69, ingest_healthcheck.py:17-18,
daily_kpis.py:152) as one projected suite."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register


@register(
    "time_arith_suite",
    oracle="""
SELECT event_id,
       ts + INTERVAL 7 DAY AS ts_plus_7d,
       ts - INTERVAL 20 MINUTE AS ts_minus_20m,
       CAST(date_diff('minute', CAST(CAST(ts AS DATE) AS TIMESTAMP), ts) AS BIGINT) AS minutes_into_day,
       strftime(ts, '%Y%m%dT%H%M%S') AS compact_ts,
       CAST(date_diff('day', TIMESTAMP '2024-01-01', ts) AS BIGINT) AS days_since_epoch0
FROM events
""",
)
def time_arith_suite(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        (F.col("ts") + F.expr("INTERVAL 7 DAYS")).alias("ts_plus_7d"),
        (F.col("ts") - F.expr("INTERVAL 20 MINUTES")).alias("ts_minus_20m"),
        F.floor(
            (F.unix_micros("ts") - F.unix_micros(F.to_date("ts").cast("timestamp")))
            / 60_000_000
        ).cast("bigint").alias("minutes_into_day"),
        F.date_format("ts", "yyyyMMdd'T'HHmmss").alias("compact_ts"),
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since_epoch0"),
    )


@register("kpi_daily_approx", oracle=None)  # HLL estimates differ from DuckDB
def kpi_daily_approx(spark, sf_dir):
    """agg_distinct_users at 100 TB: the approx_count_distinct (HLL)
    variant — one shuffle instead of two, bounded state; rows-only
    check because the estimate is engine-specific (exactness is covered
    by kpi_daily, accuracy by tests/test_clickstream_kpis.py)."""
    from ..operators.kpis import daily_kpis

    return daily_kpis(load_table(spark, sf_dir, "events"), approx_distinct=True)
