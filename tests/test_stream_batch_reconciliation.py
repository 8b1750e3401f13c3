"""Dual-path reconciliation: the STREAMING ingest and the BATCH ingest
of the same payloads must land byte-identical rows in their zones —
proved with snapshot_diff returning an empty change set. This is the
audit a migration (or a lambda-architecture dual-write) runs before
trusting either path."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from clickstream_pipeline_aws_kafka_docker_airflow__spark.io import (
    write_jsonl_partitioned,
)
from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.lifecycle import (
    snapshot_diff,
)
from clickstream_pipeline_aws_kafka_docker_airflow__spark.sources.jsonl import (
    parse_kafka_value,
    with_partition_cols,
)
from clickstream_pipeline_aws_kafka_docker_airflow__spark.streaming.ingest import (
    start_ingest,
)

_COMPARE_COLS = [
    "event_ts",
    "session_id",
    "event_type",
    "page",
    "product_id",
    "price",
    "currency",
    "referrer",
    "user_agent",
    "date",
    "hour",
]


def _payloads(n=40):
    out = []
    for i in range(n):
        out.append(
            json.dumps(
                {
                    "event_ts": f"2025-09-{1 + i % 3:02d}T{i % 24:02d}:15:30Z",
                    "user_id": f"u_{i}",
                    "session_id": f"s_{i}",
                    "event_type": "purchase" if i % 5 == 0 else "page_view",
                    "page": "/",
                    "product_id": f"sku_{i % 7}",
                    "price": 10.0 + i if i % 5 == 0 else None,
                    "currency": "USD",
                    "referrer": "google",
                    "user_agent": "UA",
                }
            )
        )
    return out


def _normalize(df):
    return df.select(
        "user_id",
        *[F.col(c).cast("string").alias(c) for c in _COMPARE_COLS],
    )


def test_streaming_and_batch_ingest_reconcile(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "payloads.txt").write_text("\n".join(_payloads()) + "\n")

    # path A: streaming ingest (file-source Kafka stand-in)
    zone_a = str(tmp_path / "zone_a")
    q = start_ingest(
        spark.readStream.schema(
            StructType([StructField("value", StringType())])
        ).text(str(src)),
        zone_a,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    # path B: batch ingest of the same payload file
    zone_b = str(tmp_path / "zone_b")
    batch = with_partition_cols(
        parse_kafka_value(spark.read.text(str(src)), value_col="value")
    )
    write_jsonl_partitioned(batch, zone_b)

    a = _normalize(spark.read.json(zone_a))
    b = _normalize(spark.read.json(zone_b))
    assert a.count() == 40 and b.count() == 40
    diff = snapshot_diff(a, b, "user_id").collect()
    assert diff == [], diff
