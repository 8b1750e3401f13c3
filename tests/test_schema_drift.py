"""Schema-drift tolerance — the reference's 'dynamic schema, inferred
defensively' contract (SURVEY §1: consumers .get() every field with
fallbacks, daily_kpis.py:117-129). Our schema-pinned scans must give
the same tolerance: producer versions that DROP fields yield nulls,
versions that ADD fields are ignored, and the KPI semantics
(null-excluded distincts, price-or-zero) absorb both."""

from __future__ import annotations

import json

from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.kpis import (
    daily_kpis,
)
from clickstream_pipeline_aws_kafka_docker_airflow__spark.sources.jsonl import (
    read_jsonl_drop_malformed,
    read_jsonl_keep_malformed,
)
from pyspark.sql import functions as F


def _write_mixed_zone(tmp_path):
    """Three producer generations in one zone: v1 lacks referrer, v2 is
    the reference shape, v3 adds an unknown field."""
    v1 = {
        "event_ts": "2024-01-01T10:00:00Z",
        "user_id": "u_1",
        "session_id": "s1",
        "event_type": "page_view",
        "price": None,
    }
    v2 = {
        "event_ts": "2024-01-01T11:00:00Z",
        "user_id": "u_2",
        "session_id": "s2",
        "event_type": "purchase",
        "price": 10.5,
        "currency": "USD",
        "referrer": "google",
        "user_agent": "ua",
        "page": "/",
        "product_id": "sku_1",
    }
    v3 = dict(v2, event_ts="2024-01-01T12:00:00Z", user_id="u_3", price=4.5,
              experiment_bucket="B", referrer="ads")
    p = tmp_path / "zone"
    p.mkdir()
    (p / "v1.jsonl").write_text(json.dumps(v1) + "\n")
    (p / "v2.jsonl").write_text(json.dumps(v2) + "\n")
    (p / "v3.jsonl").write_text(json.dumps(v3) + "\n")
    return str(p)


def test_dropped_and_added_fields_read_clean(spark, tmp_path):
    zone = _write_mixed_zone(tmp_path)
    df = read_jsonl_drop_malformed(spark, zone)
    rows = {r["user_id"]: r for r in df.collect()}
    assert set(rows) == {"u_1", "u_2", "u_3"}  # no generation dropped
    assert rows["u_1"]["referrer"] is None  # missing field -> null
    assert rows["u_3"]["referrer"] == "ads"  # known fields still land
    assert "experiment_bucket" not in df.columns  # unknown field ignored


def test_kpis_identical_across_generations(spark, tmp_path):
    """The KPI aggregate over the mixed zone matches the reference's
    defensive semantics: all three rows count, both purchases sum."""
    zone = _write_mixed_zone(tmp_path)
    parsed = read_jsonl_drop_malformed(spark, zone).withColumn(
        "ts", F.to_timestamp("event_ts")
    )
    out = daily_kpis(
        parsed, ts="ts", user="user_id", session="session_id",
        etype="event_type", price="price",
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["total_events"] == 3
    assert r["unique_users"] == 3
    assert r["pageviews"] == 1
    assert r["purchases"] == 2
    assert r["revenue_usd"] == 15.0


def test_permissive_path_keeps_unknown_field_rows_intact(spark, tmp_path):
    """The ingest path must not classify a v3 (extra-field) line as
    corrupt: it parses, so it keeps its event-time bucket."""
    zone = _write_mixed_zone(tmp_path)
    df = read_jsonl_keep_malformed(spark, zone)
    corrupt = df.where(F.col("_corrupt_record").isNotNull()).count()
    assert corrupt == 0
    assert df.count() == 3
