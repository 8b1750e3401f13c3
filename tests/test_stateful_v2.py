"""transformWithStateInPandas (state-v2): profiles accumulate across
micro-batches; cents-integer state keeps spend exact."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import Row

try:  # the state-v2 runner speaks protobuf to the JVM state server
    from google.protobuf import descriptor as _descriptor  # noqa: F401

    _HAS_PROTOBUF = True
except ImportError:
    # Impossible in this container: google.protobuf is not baked in and
    # installs are prohibited; transformWithStateInPandas needs the real
    # protobuf wire protocol (a vendored stub cannot speak to the JVM
    # state server). The v1 applyInPandasWithState operator covers the
    # stateful-streaming surface in test_stateful.py.
    _HAS_PROTOBUF = False

# same state-store startup cost as the v1 operator test — on-demand
pytestmark = [
    pytest.mark.skipif(
        not os.environ.get("RUN_SLOW"),
        reason="slow: state-store startup (RUN_SLOW=1 to enable)",
    ),
    pytest.mark.skipif(
        not _HAS_PROTOBUF,
        reason="transformWithStateInPandas needs google.protobuf at runtime",
    ),
]

from clickstream_pipeline_aws_kafka_docker_airflow__spark.streaming.stateful_v2 import (
    streaming_user_profiles,
)


def test_profiles_accumulate_across_batches(spark, tmp_path):
    t0 = dt.datetime(2025, 9, 1, 12, 0, 0)
    src = tmp_path / "src"
    src.mkdir()
    b1 = spark.createDataFrame(
        [
            Row(user_id=1, value=10.10, ts=t0),
            Row(user_id=2, value=5.05, ts=t0 + dt.timedelta(minutes=1)),
        ]
    )
    b1.coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame(
        [Row(user_id=1, value=2.50, ts=t0 + dt.timedelta(hours=1))]
    ).coalesce(1).write.parquet(str(src / "b2"))

    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        streaming_user_profiles(stream)
        .writeStream.format("memory")
        .queryName("profiles")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    assert q.awaitTermination(240), "stream did not drain"

    latest = {}
    for r in spark.sql("SELECT * FROM profiles").collect():
        prev = latest.get(r.user_id)
        if prev is None or r.n_events >= prev.n_events:
            latest[r.user_id] = r
    u1, u2 = latest[1], latest[2]
    assert u1.n_events == 2 and u1.total_spend == 12.60
    assert u2.n_events == 1 and u2.total_spend == 5.05
    us = lambda d: int(d.timestamp() * 1_000_000)  # noqa: E731
    assert u1.first_seen_us == us(t0)
    assert u1.last_seen_us == us(t0 + dt.timedelta(hours=1))
