"""Streaming KPI aggregation — the continuous variant of the daily
batch job (``daily_kpis.py:109-140``).

Semantic difference, documented per SURVEY.md §2.4
(stream_late_data_policy): the reference has no watermark anywhere —
late-data correctness comes from re-running the whole day (Airflow
``catchup=True``). Streaming state cannot be unbounded, so this variant
admits late data up to ``watermark`` and emits per-window updates;
events later than the watermark are the re-run batch job's business.

``unique_users``/``unique_sessions`` use ``approx_count_distinct``
(HLL): exact distinct over an unbounded stream would keep one hash set
per window forever — the same unbounded Python ``set``s the reference
holds in memory (daily_kpis.py:111), which is exactly what doesn't
scale. The batch job remains the exact-count source of truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.scalars import (
    dec_sum_round2,
    is_pageview,
    is_purchase,
    price_or_zero,
)


def windowed_kpis(
    events: DataFrame,
    window: str = "1 day",
    watermark: str = "1 day",
    ts_col: str = "ts",
    user: str = "user_id",
    etype: str = "event_type",
    price: str = "value",
    session: str | None = None,
) -> DataFrame:
    """Event-time tumbling-window KPIs with a late-data watermark."""
    aggs = [
        F.count(F.lit(1)).alias("total_events"),
        F.approx_count_distinct(user).alias("unique_users"),
    ]
    if session is not None:
        aggs.append(F.approx_count_distinct(session).alias("unique_sessions"))
    aggs += [
        F.count(F.when(is_pageview(etype), 1)).alias("pageviews"),
        F.count(F.when(is_purchase(etype), 1)).alias("purchases"),
        # decimal accumulation, NOT round2(sum(double)): partial-agg
        # summation order differs between micro-batch replays, and a
        # sum within an ulp of a .005 boundary would round differently
        # — the same instability the batch tier fixed in
        # functions/scalars.py::dec_sum_round2. Stream and batch
        # revenue now agree exactly.
        dec_sum_round2(
            F.when(is_purchase(etype), price_or_zero(price)).otherwise(0.0)
        ).alias("revenue_usd"),
    ]
    out_cols = (
        ["total_events", "unique_users"]
        + (["unique_sessions"] if session is not None else [])
        + ["pageviews", "purchases", "revenue_usd"]
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"))
        .agg(*aggs)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *out_cols,
        )
    )


def streaming_sessions(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    user: str = "user_id",
) -> DataFrame:
    """Streaming sessionization via the built-in ``session_window`` —
    the stateful twin of the batch lag/cumsum operator
    (queries/events_q.py::sessionize_30min)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("sw"), F.col(user))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(user),
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )
