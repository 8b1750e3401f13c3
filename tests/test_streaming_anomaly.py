"""Streaming anomaly monitor: a planted spike hour must flag once its
trailing window fills; steady hours must not."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.anomaly import (
    ANOM_WINDOW_H,
)
from clickstream_pipeline_aws_kafka_docker_airflow__spark.streaming.anomaly import (
    load_flags,
    start_anomaly_monitor,
)


def test_streaming_spike_flagged(spark, tmp_path):
    base = dt.datetime(2025, 9, 1, 0, 0)
    rows = []
    # 24 steady hours at ~4 events/h (slight jitter so variance > 0,
    # keeping the z-test's denominator meaningful), then a 40x spike
    for h in range(ANOM_WINDOW_H):
        n = 4 + (h % 2)
        for i in range(n):
            rows.append(
                Row(ts=base + dt.timedelta(hours=h, minutes=i), user_id=f"u{i}")
            )
    spike_h = ANOM_WINDOW_H  # == 2025-09-02 hour 0
    for i in range(200):
        rows.append(
            Row(
                ts=base
                + dt.timedelta(
                    hours=spike_h, minutes=(i * 17) % 60, seconds=i % 60
                ),
                user_id=f"s{i}",
            )
        )
    src = tmp_path / "src"
    df = spark.createDataFrame(rows)
    # stream the written directory itself — the file source does not
    # recurse into write.parquet's output subdirectories
    df.coalesce(1).write.parquet(str(src))

    stream = spark.readStream.schema(df.schema).parquet(str(src))
    q = start_anomaly_monitor(
        stream, str(tmp_path / "mon"), str(tmp_path / "ckpt")
    )
    assert q.awaitTermination(180), "stream did not drain within timeout"

    flags = {
        (r["dt"], r["hh"]): r["is_anomaly"]
        for r in load_flags(spark, str(tmp_path / "mon")).collect()
    }
    # only hours with a FULL trailing window are scored: the spike hour
    # (hour 24 == next day, hour 0), which must flag
    assert flags == {("2025-09-02", 0): True}
