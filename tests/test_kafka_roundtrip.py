"""Kafka payload parity with the reference producer
(produce_events.py:28-45,82): 10 keys in producer order, explicit null
price on non-purchases, Z-suffixed ISO-8601 microsecond timestamps,
and a lossless serialize -> parse -> serialize fixpoint."""

from __future__ import annotations

import json
import re

from pyspark.sql import functions as F

from clickstream_pipeline_aws_kafka_docker_airflow__spark.schemas import (
    CLICKSTREAM_EVENT_RAW,
    CORRUPT_COL,
)
from clickstream_pipeline_aws_kafka_docker_airflow__spark.sources.generator import (
    generate_events_batch_deterministic,
)
from clickstream_pipeline_aws_kafka_docker_airflow__spark.sources.jsonl import (
    parse_kafka_value,
)
from clickstream_pipeline_aws_kafka_docker_airflow__spark.sources.kafka import (
    to_kafka_payload,
)

FIELDS = [f.name for f in CLICKSTREAM_EVENT_RAW.fields]

_REF_EVENT = {
    "event_ts": "2025-09-01T10:02:03.004005Z",
    "user_id": "u_17",
    "session_id": "0a1b2c3d-4e5f-6071-8293-a4b5c6d7e8f9",
    "event_type": "page_view",
    "page": "/search",
    "product_id": "sku_42",
    "price": None,  # json.dumps keeps the key: "price": null
    "currency": "USD",
    "referrer": "google",
    "user_agent": "Mozilla/5.0",
}


def test_payload_matches_reference_shape_bytes(spark):
    """Payload == compact json.dumps of the reference dict: same keys,
    same order, null price key PRESENT (Spark's default to_json would
    drop it)."""
    df = spark.createDataFrame([tuple(_REF_EVENT.values())], CLICKSTREAM_EVENT_RAW)
    payload = to_kafka_payload(df).collect()[0]["value"]
    assert payload == json.dumps(_REF_EVENT, separators=(",", ":"))
    # purchase event serializes the price as a JSON number
    purchase = dict(_REF_EVENT, event_type="purchase", price=64.25)
    df2 = spark.createDataFrame([tuple(purchase.values())], CLICKSTREAM_EVENT_RAW)
    p2 = to_kafka_payload(df2).collect()[0]["value"]
    assert p2 == json.dumps(purchase, separators=(",", ":"))


def test_generated_payloads_reference_format(spark):
    """Generated events serialize with all 10 keys in producer order and
    Z-suffixed ISO micros; null price appears exactly on non-purchases."""
    ev = generate_events_batch_deterministic(spark, 500)
    rows = to_kafka_payload(ev).collect()
    key_re = re.compile(r'"(\w+)"\s*:')
    ts_re = re.compile(r'"event_ts":"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{6}Z"')
    n_null_price = 0
    for r in rows:
        assert key_re.findall(r["value"]) == FIELDS, r["value"]
        assert ts_re.search(r["value"]), r["value"]
        if '"price":null' in r["value"]:
            n_null_price += 1
            assert '"event_type":"purchase"' not in r["value"]
        else:
            assert '"event_type":"purchase"' in r["value"]
    assert 0 < n_null_price < len(rows)


def test_roundtrip_fixpoint_and_field_identity(spark):
    """serialize -> parse -> serialize is byte-identical, and parsed
    fields equal the source fields row-for-row."""
    ev = generate_events_batch_deterministic(spark, 1_000)
    payload = to_kafka_payload(ev)
    parsed = parse_kafka_value(payload)
    assert parsed.where(F.col(CORRUPT_COL).isNotNull()).count() == 0
    re_serialized = to_kafka_payload(parsed.select(*FIELDS))
    diff = payload.exceptAll(re_serialized)
    assert diff.isEmpty()
    # field-for-field identity vs the generated source
    src = ev.orderBy("session_id").collect()
    out = parsed.select(*FIELDS).orderBy("session_id").collect()
    assert src == out


def test_malformed_payload_kept(spark):
    """A non-JSON message survives the parse with the raw bytes in the
    corrupt column — the ingest keep-malformed policy."""
    df = spark.createDataFrame([("not json {",), ('{"user_id":"u_1"}',)], "value string")
    parsed = parse_kafka_value(df)
    bad = parsed.where(F.col(CORRUPT_COL).isNotNull()).collect()
    assert len(bad) == 1 and bad[0][CORRUPT_COL] == "not json {"
    good = parsed.where(F.col("user_id") == "u_1").collect()
    assert len(good) == 1 and good[0][CORRUPT_COL] is None
