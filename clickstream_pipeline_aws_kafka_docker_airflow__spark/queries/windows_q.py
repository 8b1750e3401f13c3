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
    -- a NULL-ts event lands in no window (Spark's window() likewise
    -- emits nothing for it once filtered; unfiltered, the engines
    -- disagree: one NULL group vs two NULL union branches)
    SELECT (epoch_us(ts) // {SLIDE_US}) * {SLIDE_US} AS b0, value
    FROM events WHERE ts IS NOT NULL
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
    feeds 2 overlapping windows. NULL-ts events land in no window."""
    e = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
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




# -- integer-exact EWMA smoothing -------------------------------------------


def _ewma_oracle() -> str:
    from ..operators.timeseries import EWMA_DEN, EWMA_NUM, EWMA_SCALE

    return f"""
WITH RECURSIVE hc AS MATERIALIZED (
    -- NULL-ts events have no hour; dropped on both engines (the NULL
    -- hour would also sort differently across engines in the walk)
    SELECT event_type, date_trunc('hour', ts) AS hh, COUNT(*) AS cnt
    FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
), idx AS MATERIALIZED (
    SELECT event_type, hh, cnt,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hh) AS i
    FROM hc
), r AS (
    SELECT event_type, hh, cnt, i,
           CAST(cnt * {EWMA_SCALE} AS BIGINT) AS ewma
    FROM idx WHERE i = 1
    UNION ALL
    SELECT n.event_type, n.hh, n.cnt, n.i,
           CAST(({EWMA_NUM} * n.cnt * {EWMA_SCALE}
                 + {EWMA_DEN - EWMA_NUM} * r.ewma) // {EWMA_DEN} AS BIGINT)
    -- null-safe series join: a NULL event_type is one series like any
    -- other GROUP BY key (the Spark fold walks it); a plain equality
    -- would strand that series at its first tick
    FROM r JOIN idx n ON n.event_type IS NOT DISTINCT FROM r.event_type
                     AND n.i = r.i + 1
)
SELECT event_type, hh, cnt, ewma FROM r
"""


@register("ewma_hourly", oracle=_ewma_oracle())
def ewma_hourly(spark, sf_dir):
    """Integer-exact EWMA (alpha = 1/4, 10^6 fixed-point) over each
    event type's hourly count series — the smoothing stage behind
    rate-anomaly alerting. A sequential recurrence with no window-
    function form: the Spark side runs it as a per-series engine-side
    ``aggregate()`` fold (operators/timeseries.py), the oracle as a
    recursive CTE stepping hour by hour. Exact BIGINT at every step,
    so the fold and the recursion hash-match."""
    from ..operators.timeseries import ewma_series

    e = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hh")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return ewma_series(hourly, ["event_type"], "hh", "cnt")
