"""Real-connector Kafka coverage, presence-gated.

The sandbox ships no spark-sql-kafka jar and no broker, so the Kafka
path is covered by recorded-segment fixtures (test_kafka_wire.py).
These tests light up AUTOMATICALLY when the environment improves:

* connector jar present       -> pin that our hand-maintained wire
  schema (KAFKA_SOURCE_SCHEMA[_HEADERS]) equals the schema the real
  ``format("kafka")`` source emits — the contract every stand-in
  fixture silently assumes.
* jar + KAFKA_BOOTSTRAP set   -> full produce/consume byte round-trip
  of the recorded segment through a real broker.

Both skip with an explicit reason otherwise; neither needs code
changes to activate.
"""

from __future__ import annotations

import os

import pytest

from clickstream_pipeline_aws_kafka_docker_airflow__spark.sources.kafka import (
    KAFKA_SOURCE_SCHEMA,
    KAFKA_SOURCE_SCHEMA_HEADERS,
    consume_projection,
    kafka_connector_available,
    read_kafka_batch,
    to_kafka_payload,
)


def _require_connector(spark):
    if not kafka_connector_available(spark):
        pytest.skip(
            "spark-sql-kafka connector not on classpath (sandbox ships "
            "no jar); recorded-segment fixtures cover the wire schema"
        )


def test_wire_schema_matches_real_connector(spark):
    """The recorded-segment fixtures are only as honest as the schema
    they replicate: when the real connector is present, its source
    frame schema must equal KAFKA_SOURCE_SCHEMA (and the includeHeaders
    variant must equal KAFKA_SOURCE_SCHEMA_HEADERS). The Kafka source
    schema is static — building the streaming frame never contacts the
    (absent) broker."""
    _require_connector(spark)
    base = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", "localhost:1")
        .option("subscribe", "t")
        .load()
    )
    assert base.schema == KAFKA_SOURCE_SCHEMA, base.schema
    with_headers = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", "localhost:1")
        .option("subscribe", "t")
        .option("includeHeaders", "true")
        .load()
    )
    assert with_headers.schema == KAFKA_SOURCE_SCHEMA_HEADERS, (
        with_headers.schema
    )
    # and the consume projection accepts the real frame (the TypeError
    # guard that keeps file-source stand-ins honest)
    consume_projection(base)


def test_broker_roundtrip(spark, tmp_path):
    """Byte round-trip through a REAL broker: produce the reference
    payload shape, read it back with the batch consumer, compare
    verbatim values. Needs both the connector jar and a reachable
    broker named in KAFKA_BOOTSTRAP."""
    _require_connector(spark)
    bootstrap = os.environ.get("KAFKA_BOOTSTRAP")
    if not bootstrap:
        pytest.skip("no broker: set KAFKA_BOOTSTRAP=host:port to enable")
    topic = "spark_graft_roundtrip"
    payloads = spark.createDataFrame(
        [(i, f"u_{i}", "view", 1.5 + i) for i in range(20)],
        "event_id long, user_id string, event_type string, value double",
    )
    (
        to_kafka_payload(payloads)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .save()
    )
    got = consume_projection(
        read_kafka_batch(spark, bootstrap, topic=topic)
    )
    vals = {r["value"] for r in got.collect()}
    want = {
        r["value"] for r in to_kafka_payload(payloads).collect()
    }
    assert want <= {
        v.decode("utf-8") if isinstance(v, (bytes, bytearray)) else v
        for v in vals
    }
