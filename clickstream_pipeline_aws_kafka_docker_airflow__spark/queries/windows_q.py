"""Sliding event-time windows + multi-format date parsing + generator.

The sliding-window oracle reconstructs Spark's ``window(ts, '1 hour',
'30 minutes')`` semantics by hand in SQL: every event belongs to
exactly two 1-hour windows whose starts are the enclosing 30-minute
epoch buckets — integer-microsecond arithmetic on both sides so bucket
edges agree exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.scalars import dec_sum_round2, parse_date_multi
from ..io import load_table
from ..registry import register
from ..sources import generator as G

SLIDE_US = 30 * 60 * 1_000_000
WINDOW_US = 2 * SLIDE_US

# -- gen_synthetic_events (registered first: full-oracle determinism) -------

GEN_N = 10_000
GEN_START = "2025-09-01"
GEN_START_US = 1_756_684_800_000_000  # 2025-09-01T00:00:00Z
GEN_DAYS = 7


@register(
    "gen_synthetic_events",
    oracle=G.gen_events_oracle_sql(GEN_N, GEN_START_US, GEN_DAYS),
)
def gen_synthetic_events(spark, sf_dir):
    """gen_synthetic_events (produce_events.py:23-74): deterministic
    hash-draw variant — every field a pure function of the row index, so
    the generator itself is value-checked against DuckDB (the rand()
    twin keeps the reference's nondeterminism and is distribution-tested
    in tests/test_generator.py)."""
    return G.generate_events_batch_deterministic(
        spark, GEN_N, start_date=GEN_START, days=GEN_DAYS
    )


@register(
    "sliding_window_hourly",
    oracle=f"""
WITH b AS (
    SELECT (epoch_us(ts) // {SLIDE_US}) * {SLIDE_US} AS b0, value FROM events
), x AS (
    SELECT make_timestamp(b0) AS window_start, value FROM b
    UNION ALL
    SELECT make_timestamp(b0 - {SLIDE_US}), value FROM b
)
SELECT window_start,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(24,8))), 2) AS DOUBLE) AS total_value
FROM x
GROUP BY window_start
""",
)
def sliding_window_hourly(spark, sf_dir):
    """ext_window_tumbling (sliding variant): 1-hour windows advancing
    every 30 minutes via the native ``window`` operator — each event
    feeds 2 overlapping windows."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum_round2("value").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


@register(
    "date_parse_multi",
    oracle="""
SELECT event_id,
       CAST(COALESCE(try_strptime(clean, '%Y-%m-%d'),
                     try_strptime(clean, '%Y-%m-%d %H:%M:%S')) AS DATE) AS dt
FROM (
    SELECT event_id,
           trim(regexp_replace(CASE event_id % 3
               WHEN 0 THEN strftime(ts, '%Y-%m-%d')
               WHEN 1 THEN strftime(ts, '%Y-%m-%d %H:%M:%S')
               ELSE '"' || strftime(ts, '%Y-%m-%d') || '" '
           END, '["'']', '', 'g')) AS clean
    FROM events
)
""",
)
def date_parse_multi(spark, sf_dir):
    """f_date_parse_multi (daily_kpis.py:27-44): accept plain dates,
    full timestamps, and quote/space-wrapped values."""
    e = load_table(spark, sf_dir, "events")
    raw = (
        F.when(F.col("event_id") % 3 == 0, F.date_format("ts", "yyyy-MM-dd"))
        .when(F.col("event_id") % 3 == 1, F.date_format("ts", "yyyy-MM-dd HH:mm:ss"))
        .otherwise(F.concat(F.lit('"'), F.date_format("ts", "yyyy-MM-dd"), F.lit('" ')))
    )
    return e.select("event_id", parse_date_multi(raw).alias("dt"))


