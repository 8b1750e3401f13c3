"""Streaming generator: rate-source variant builds a valid streaming
plan with the full event schema (one micro-batch driven to a sink)."""

from __future__ import annotations

from clickstream_pipeline_aws_kafka_docker_airflow__spark.sources.generator import (
    generate_events_stream,
)


def test_stream_generator_schema_and_batch(spark, tmp_path):
    df = generate_events_stream(spark, rows_per_second=200)
    assert df.isStreaming
    assert df.columns == [
        "event_ts", "user_id", "session_id", "event_type", "page",
        "product_id", "price", "currency", "referrer", "user_agent",
    ]
    q = (
        df.writeStream.format("memory")
        .queryName("gen_stream")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        # wait for at least one non-empty micro-batch
        import time

        rows = []
        for _ in range(60):
            time.sleep(1)
            rows = spark.sql("SELECT * FROM gen_stream").collect()
            if rows:
                break
    finally:
        q.stop()
    assert rows, "rate source produced no events"
    r = rows[0].asDict()
    assert r["event_ts"].endswith("Z") and r["user_id"].startswith("u_")
    assert r["currency"] == "USD"
