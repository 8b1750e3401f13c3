"""The KPI core: the reference's single-pass daily aggregation
(``/root/reference/airflow/dags/daily_kpis.py:109-140``) as one Spark
``groupBy().agg()``.

Scale notes (100 TB): one declarative agg = one shuffle with map-side
partial aggregation; the reference's two unbounded Python ``set``s for
exact distincts become Spark's distributed hash aggregate (two-phase
shuffle for COUNT DISTINCT). For dashboards that tolerate ~2% error,
:func:`daily_kpis_approx` swaps in HLL ``approx_count_distinct`` and
drops the second shuffle entirely.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.scalars import dec_sum_round2, is_pageview, is_purchase, price_or_zero


def kpi_aggs(
    user: str = "user_id",
    etype: str = "event_type",
    price: str = "value",
    session: str | None = None,
    approx_distinct: bool = False,
) -> list[Column]:
    """The six KPI aggregate expressions of daily_kpis.py:133-140 with
    exact reference semantics: nulls excluded from distincts (:111,
    117-122), case-normalized classification (:123-127), null/cast-safe
    revenue (:128-131), 2-dp rounding (:139)."""
    distinct = (
        (lambda c: F.approx_count_distinct(c))
        if approx_distinct
        else (lambda c: F.countDistinct(c))
    )
    aggs = [
        F.count(F.lit(1)).alias("total_events"),
        distinct(user).alias("unique_users"),
    ]
    if session is not None:
        aggs.append(distinct(session).alias("unique_sessions"))
    aggs += [
        F.count(F.when(is_pageview(etype), 1)).alias("pageviews"),
        F.count(F.when(is_purchase(etype), 1)).alias("purchases"),
        dec_sum_round2(
            F.when(is_purchase(etype), price_or_zero(price)).otherwise(0.0)
        ).alias("revenue_usd"),
    ]
    return aggs


def daily_kpis(events: DataFrame, ts: str = "ts", **kw) -> DataFrame:
    """All days in one query — generalizes the reference's
    one-day-per-DAG-run loop (daily_kpis.py:151-163) into a single
    ``groupBy(dt)``; day-level parallelism comes from the shuffle, not
    from 16 concurrent Airflow runs (daily_kpis.py:187-188)."""
    return events.groupBy(F.to_date(ts).alias("dt")).agg(*kpi_aggs(**kw))


def single_day_kpis(events: DataFrame, day: str, ts: str = "ts", **kw) -> DataFrame:
    """The reference's actual unit of work — one run-date per invocation
    (daily_kpis.py:142-174). The day filter prunes to one event-time
    partition when the source is date-partitioned."""
    return (
        events.where(F.to_date(ts) == F.lit(day).cast("date"))
        .agg(*kpi_aggs(**kw))
        .withColumn("dt", F.lit(day))
    )


def hourly_rollup(events: DataFrame, ts: str = "ts", **kw) -> DataFrame:
    """Ingest-side (date,hour) bucketing (ingest_clickstream_to_s3.py:27,41)
    upgraded from a write-layout concern to a queryable rollup."""
    return events.groupBy(
        F.to_date(ts).alias("dt"), F.hour(ts).cast("bigint").alias("hh")
    ).agg(*kpi_aggs(**kw))
