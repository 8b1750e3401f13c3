"""Unit tests of KPI semantics on reference-shaped clickstream data —
every defensive branch of daily_kpis.py exercised (SURVEY.md §5.3):
null price, mixed-case event types, null user/session, classification
sets, rounding.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.kpis import (
    daily_kpis,
    hourly_rollup,
    single_day_kpis,
)


def _mk_events(spark):
    d = dt.datetime(2025, 9, 1, 10, 0, 0)
    rows = [
        # day 1: 2 users, one null user (excluded from distinct)
        Row(ts=d, user_id="u1", session_id="s1", event_type="page_view", price=None),
        Row(ts=d, user_id="u1", session_id="s1", event_type="PAGEVIEW", price=None),
        Row(ts=d, user_id="u2", session_id="s2", event_type="View", price=None),
        Row(ts=d, user_id=None, session_id=None, event_type="purchase", price=10.555),
        Row(ts=d, user_id="u2", session_id="s3", event_type="CHECKOUT", price=None),
        Row(ts=d, user_id="u1", session_id="s1", event_type="order", price=5.0),
        Row(ts=d, user_id="u1", session_id="s1", event_type="weird_event", price=99.0),
        Row(ts=d, user_id="u1", session_id="s1", event_type=None, price=None),
        # day 2
        Row(
            ts=d + dt.timedelta(days=1),
            user_id="u3",
            session_id="s9",
            event_type="purchase",
            price=1.004,
        ),
    ]
    return spark.createDataFrame(rows)


def test_daily_kpis_reference_semantics(spark):
    out = {
        r["dt"].isoformat(): r.asDict()
        for r in daily_kpis(
            _mk_events(spark), ts="ts", user="user_id", session="session_id",
            etype="event_type", price="price",
        ).collect()
    }
    d1 = out["2025-09-01"]
    assert d1["total_events"] == 8  # weird + null types still counted (:116)
    assert d1["unique_users"] == 2  # null excluded (:117-120)
    assert d1["unique_sessions"] == 3  # null excluded (:121-122)
    assert d1["pageviews"] == 3  # page_view/PAGEVIEW/View (:124-125)
    assert d1["purchases"] == 3  # purchase/CHECKOUT/order (:126-127)
    # revenue: 10.555 + 0.0 (null price on CHECKOUT) + 5.0, rounded 2dp (:128-139)
    assert d1["revenue_usd"] == 15.56
    d2 = out["2025-09-02"]
    assert d2["total_events"] == 1
    assert d2["revenue_usd"] == 1.0  # round(1.004, 2)


def test_single_day_filters(spark):
    row = single_day_kpis(
        _mk_events(spark), "2025-09-02", ts="ts", user="user_id",
        session="session_id", etype="event_type", price="price",
    ).collect()[0]
    assert row["dt"] == "2025-09-02"
    assert row["total_events"] == 1


def test_hourly_rollup_buckets(spark):
    rows = hourly_rollup(
        _mk_events(spark), ts="ts", user="user_id", etype="event_type", price="price"
    ).collect()
    assert {(r["dt"].isoformat(), r["hh"]) for r in rows} == {
        ("2025-09-01", 10),
        ("2025-09-02", 10),
    }


def test_approx_distinct_variant(spark):
    row = daily_kpis(
        _mk_events(spark), ts="ts", user="user_id", etype="event_type",
        price="price", approx_distinct=True,
    ).where("dt = '2025-09-01'").collect()[0]
    # HLL on 2 distinct values is exact
    assert row["unique_users"] == 2
