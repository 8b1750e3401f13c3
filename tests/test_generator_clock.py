"""Edge-timestamp parity for the fast-forward clock.

``ff_schedule`` claims bit-exact parity with the reference producer's
``sim_timestamps`` (``/root/reference/kafka/producer/produce_events.py:48-70``)
at the window edges: first timestamp, last timestamp, step arithmetic
(timedelta rounding, NOT truncation) and the ``while t < end`` event
count (ceil, NOT the target). This file pins that against a literal
Python twin of the reference generator.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from clickstream_pipeline_aws_kafka_docker_airflow__spark.sources.generator import (
    ff_schedule,
    generate_events_batch_deterministic,
)

UTC = dt.timezone.utc


def _twin_sim_timestamps(
    start_date: str, days: int, events_target: int, rate: float | None = None
) -> list[dt.datetime]:
    """Behavioral twin of the reference ``sim_timestamps()``
    (produce_events.py:48-70): datetime/timedelta arithmetic exactly as
    the reference performs it, fast-forward branch only."""
    try:
        start = dt.datetime.fromisoformat(start_date)
    except ValueError:
        start = dt.datetime.strptime(start_date, "%Y-%m-%d")
    if start.tzinfo is None:
        start = start.replace(tzinfo=UTC)
    end = start + dt.timedelta(days=days)
    duration = end - start
    if events_target > 0:
        step = duration / events_target
    else:
        step = dt.timedelta(seconds=1.0 / (rate if rate and rate > 0 else 1.0))
    out = []
    t = start
    while t < end:
        out.append(t)
        t += step
    return out


CASES = [
    # (start_date, days, target) — divisible and non-divisible windows
    ("2025-09-01", 7, 10_000),  # divisible: the registered GEN_N config
    ("2025-09-01", 3, 97),      # step rounds down -> yields 98 for target 97
    ("2025-09-01", 1, 7),       # large remainder
    ("2025-09-01", 1, 86_401),  # step rounds to 999988 us, count != target
    ("2025-09-01", 2, 1),       # single event: step == whole window
    ("2024-02-28", 2, 3),       # leap-day window
    ("2025-09-01", 1, 12_345_679),  # ties/parity-sensitive rounding
]


@pytest.mark.parametrize("start_date,days,target", CASES)
def test_ff_schedule_matches_reference_twin(start_date, days, target):
    twin = _twin_sim_timestamps(start_date, days, target)
    step_us, n_events = ff_schedule(target, days)

    # step: exact timedelta-division (half-even) microseconds
    if len(twin) > 1:
        assert (twin[1] - twin[0]) == dt.timedelta(microseconds=step_us)
    # count: the `while t < end` ceil, not the target
    assert n_events == len(twin)
    # window edges
    start = twin[0]
    assert start + (n_events - 1) * dt.timedelta(microseconds=step_us) == twin[-1]
    end = start + dt.timedelta(days=days)
    assert twin[-1] < end <= twin[-1] + dt.timedelta(microseconds=step_us)
    # step remainder never pushes the last event out of the window
    assert (n_events - 1) * step_us < days * 86_400_000_000


@pytest.mark.parametrize("rate,days", [(0.5, 1), (20.0, 1), (3.0, 2)])
def test_ff_schedule_rate_mode_matches_twin(rate, days):
    """FF_EVENTS_TARGET <= 0 -> step = timedelta(seconds=1/rate)
    (produce_events.py:62-63), same rounding rules."""
    step_us, n_events = ff_schedule(0, days, rate=rate)
    step_td = dt.timedelta(seconds=1.0 / rate)
    assert step_us == round(step_td.total_seconds() * 1e6)
    duration_us = days * 86_400_000_000
    assert n_events == -(-duration_us // step_us)
    # spot-check the loop count for the small-step case without
    # materializing millions of datetimes
    if n_events <= 100_000:
        twin = _twin_sim_timestamps("2025-09-01", days, 0, rate=rate)
        assert n_events == len(twin)


def test_zero_step_clamped():
    """target > 2x window-in-us would hang the reference loop (step
    rounds to 0); we clamp to 1 us and document the divergence."""
    step_us, n_events = ff_schedule(10**18, 1)
    assert step_us == 1
    assert n_events == 86_400_000_000


def test_spark_generator_edges_match_twin(spark):
    """The distributed generator's first/last event_ts equal the twin's
    first/last yields for a non-divisible (target=97, days=3) window."""
    target, days, start_date = 97, 3, "2025-09-01"
    twin = _twin_sim_timestamps(start_date, days, target)
    df = generate_events_batch_deterministic(
        spark, target, start_date=start_date, days=days
    )
    got = df.agg(
        F.min("event_ts").alias("lo"),
        F.max("event_ts").alias("hi"),
        F.count("*").alias("n"),
    ).first()
    fmt = "%Y-%m-%dT%H:%M:%S.%fZ"
    assert got.n == len(twin) == 98  # one more than the 97 target
    assert got.lo == twin[0].replace(tzinfo=None).strftime(fmt)
    assert got.hi == twin[-1].replace(tzinfo=None).strftime(fmt)
