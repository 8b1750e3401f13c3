"""load_table must normalize events.ts to a session-TZ TIMESTAMP for
every parquet physical type the driver testdata has shipped:
timestamp[ns] (read as int64 via nanosAsLong), timestamp[us] (read as
TIMESTAMP_NTZ), and plain TIMESTAMP — downstream queries use
unix_micros() and interval arithmetic that reject NTZ at analysis
time, so a missed branch here is a round-killer (it voided the entire
round-2 bench artifact)."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from clickstream_pipeline_aws_kafka_docker_airflow__spark.io import load_table

_ROWS = [
    dt.datetime(2025, 9, 1, 10, 0, 0, 123456),
    dt.datetime(2025, 9, 2, 23, 59, 59, 999999),
]


def _write_events(path, unit):
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(_ROWS, pa.timestamp(unit)),
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["page_view", "purchase"]),
            "value": pa.array([1.5, 2.5], pa.float64()),
            "props": pa.array(["{}", "{}"]),
        }
    )
    pq.write_table(tbl, path)


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_ts_normalized_to_timestamp(spark, tmp_path, unit):
    _write_events(str(tmp_path / "events.parquet"), unit)
    df = load_table(spark, str(tmp_path), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = sorted(r["ts"] for r in df.select("ts").collect())
    assert got == _ROWS  # wall-clock values preserved exactly (UTC session)
    # downstream arithmetic that rejects NTZ must analyze cleanly
    df.selectExpr("unix_micros(ts)").collect()
