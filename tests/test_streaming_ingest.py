"""End-to-end streaming ingest on a file-source stand-in for Kafka:
JSON payload lines stream in, typed events + (date,hour) partitions
stream out; malformed lines are kept (corrupt column + processing-time
bucket) exactly like ingest_clickstream_to_s3.py:33-51.
"""

from __future__ import annotations

import json
import pathlib

from pyspark.sql.types import StringType, StructField, StructType

from clickstream_pipeline_aws_kafka_docker_airflow__spark.sources.jsonl import (
    read_jsonl_drop_malformed,
    read_jsonl_keep_malformed,
)
from clickstream_pipeline_aws_kafka_docker_airflow__spark.streaming.ingest import (
    start_ingest,
)

GOOD = {
    "event_ts": "2025-09-01T10:15:30.123456Z",
    "user_id": "u_1",
    "session_id": "aaaa-bbbb",
    "event_type": "purchase",
    "page": "/checkout",
    "product_id": "sku_7",
    "price": 42.5,
    "currency": "USD",
    "referrer": "google",
    "user_agent": "UA",
}


def _write_payloads(dirpath: pathlib.Path, lines: list[str]) -> None:
    dirpath.mkdir(parents=True, exist_ok=True)
    (dirpath / "batch1.txt").write_text("\n".join(lines) + "\n")


def test_ingest_stream_end_to_end(spark, tmp_path):
    src = tmp_path / "src"
    out = tmp_path / "raw"
    ckpt = tmp_path / "ckpt"
    late = dict(GOOD, event_ts="2025-08-31T23:59:59Z", user_id="u_2")
    lines = [json.dumps(GOOD), json.dumps(late), "{not json at all"]
    _write_payloads(src, lines)

    raw = (
        spark.readStream.schema(StructType([StructField("value", StringType())]))
        .text(str(src))
        .withColumnRenamed("value", "value")
    )
    q = start_ingest(raw, str(out), str(ckpt))
    q.awaitTermination(120)

    result = spark.read.json(str(out))
    rows = {r["user_id"]: r.asDict() for r in result.collect() if r["user_id"]}
    # good event landed in its event-time partition (partition col types
    # are re-inferred on read: date -> DateType, hour -> LongType)
    assert str(rows["u_1"]["date"]) == "2025-09-01" and int(rows["u_1"]["hour"]) == 10
    # late event back-fills its own (older) event-time partition — never dropped
    assert str(rows["u_2"]["date"]) == "2025-08-31" and int(rows["u_2"]["hour"]) == 23
    # malformed line KEPT, bucketed by processing time, payload preserved
    corrupt = [r for r in result.collect() if r["user_id"] is None]
    assert len(corrupt) == 1
    assert corrupt[0]["corrupt_payload"] == "{not json at all"
    assert corrupt[0]["date"] is not None  # processing-time bucket

    # exactly-once: restarting the drained stream must not duplicate
    q2 = start_ingest(
        spark.readStream.schema(
            StructType([StructField("value", StringType())])
        ).text(str(src)),
        str(out),
        str(ckpt),
    )
    q2.awaitTermination(60)
    assert spark.read.json(str(out)).count() == 3


def test_batch_jsonl_policies(spark, tmp_path):
    p = tmp_path / "files"
    p.mkdir()
    (p / "a.jsonl").write_text(json.dumps(GOOD) + "\nnot-json\n")
    # cache() required: Spark refuses a query that reads ONLY the
    # corrupt column straight off a raw JSON scan
    kept = read_jsonl_keep_malformed(spark, str(p)).cache()
    assert kept.count() == 2  # ingest path keeps malformed (:44-51)
    assert kept.where("_corrupt_record IS NOT NULL").count() == 1
    dropped = read_jsonl_drop_malformed(spark, str(p))
    assert dropped.count() == 1  # KPI path skips malformed (daily_kpis.py:104-107)
