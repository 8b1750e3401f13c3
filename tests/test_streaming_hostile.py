"""Hostile inputs through the STREAMING tier.

The batch tier's adversarial audit (tests/test_adversarial.py) proved
oracle parity on NULL-ridden data; the streaming operators have no
DuckDB oracle, so this file pins the same semantics contract directly:

* a NULL event-time row is dropped by event-time windowing and
  session_window — the SAME rule the batch tier applies explicitly
  (operators/sessionize.py), so the stream/batch pair reconciles on
  hostile data too;
* NULL user/event_type/value must not crash the stateful operators,
  and the NULL user sessionizes as its own group exactly like the
  batch sessionizer;
* decimal revenue accumulation survives a x.xx5 knife-edge in a
  micro-batch (the dec_sum_round2 contract, streaming side).
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from clickstream_pipeline_aws_kafka_docker_airflow__spark.streaming.kpis_stream import (
    streaming_sessions,
    windowed_kpis,
)

_SCHEMA = "ts timestamp, user_id string, event_type string, value double"


def _write_jsonl(dirpath, rows):
    dirpath.mkdir(parents=True, exist_ok=True)
    with open(dirpath / "events.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


HOSTILE = [
    # one closed day of hostile shapes
    {"ts": "2024-01-01T10:00:00", "user_id": "u1", "event_type": "purchase", "value": 2.675},
    {"ts": "2024-01-01T10:00:01", "user_id": "u1", "event_type": "purchase", "value": 1.005},
    {"ts": None, "user_id": "u2", "event_type": "purchase", "value": 99.0},
    {"ts": "2024-01-01T11:00:00", "user_id": None, "event_type": "page_view", "value": None},
    {"ts": "2024-01-01T12:00:00", "user_id": "u3", "event_type": None, "value": 5.0},
    {"ts": "2024-01-01T23:59:59.999999", "user_id": "u4", "event_type": "page_view", "value": 0.0},
    # watermark pusher: far enough ahead that the 1-day watermark
    # closes the 2024-01-01 window under append mode
    {"ts": "2024-01-05T00:00:00", "user_id": "u9", "event_type": "page_view", "value": 1.0},
]


def _drain(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_windowed_kpis_hostile_day(spark, tmp_path):
    _write_jsonl(tmp_path / "src", HOSTILE)
    src = spark.readStream.schema(_SCHEMA).json(str(tmp_path / "src"))
    _drain(windowed_kpis(src, window="1 day", watermark="1 day"), "hostile_kpis")
    rows = {
        r["window_start"].isoformat(): r
        for r in spark.sql("SELECT * FROM hostile_kpis").collect()
    }
    day1 = rows["2024-01-01T00:00:00"]
    # the NULL-ts purchase (value 99.0) is in NO window — same rule as
    # the batch tier; 5 rows carry day-1 event times
    assert day1["total_events"] == 5
    assert day1["purchases"] == 2
    # decimal knife-edge: 2.675 + 1.005 rounds as exact decimal 3.68,
    # never the float-sum 3.6799999... -> 3.68-vs-3.67 coin flip
    assert day1["revenue_usd"] == 3.68
    # NULL event_type is neither pageview nor purchase
    assert day1["pageviews"] == 2
    # approx_count_distinct excludes the NULL user
    assert day1["unique_users"] == 3


def test_streaming_sessions_hostile(spark, tmp_path):
    _write_jsonl(tmp_path / "src", HOSTILE)
    src = spark.readStream.schema(_SCHEMA).json(str(tmp_path / "src"))
    _drain(streaming_sessions(src, gap="30 minutes", watermark="1 day"), "hostile_sessions")
    got = {
        (r["user_id"], r["session_start"].isoformat(), r["n_events"])
        for r in spark.sql("SELECT * FROM hostile_sessions").collect()
    }
    # u1's two purchases 1s apart collapse into one session; the NULL
    # user sessionizes as its own group (matching the batch
    # sessionizer); the NULL-ts row (u2) appears nowhere
    assert ("u1", "2024-01-01T10:00:00", 2) in got
    assert (None, "2024-01-01T11:00:00", 1) in got
    assert not any(u == "u2" for u, _, _ in got)


def test_corpus_ingest_hostile_docs(spark, tmp_path):
    """Online dedup over hostile documents: NULL and empty text are
    ADMITTED (no shingles -> never a duplicate of anything, matching
    the batch incremental_admission rule), exact duplicates are
    rejected, unicode survives, and PII is redacted before the corpus
    zone ever sees it."""
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.streaming.corpus_ingest import (
        load_corpus,
        start_dedup_corpus_ingest,
    )

    src = tmp_path / "src"
    _write_jsonl(
        src,
        [
            {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog"},
            {"doc_id": 2, "text": None},
            {"doc_id": 3, "text": ""},
            {"doc_id": 4, "text": "the quick brown fox jumps over the lazy dog"},
            {"doc_id": 5, "text": "短 文"},
            {"doc_id": 6, "text": "mail me a@b.io"},
        ],
    )
    # the file is named events.jsonl by the helper; the schema is what
    # matters to the json source
    stream = spark.readStream.schema("doc_id bigint, text string").json(str(src))
    q = start_dedup_corpus_ingest(
        stream, str(tmp_path / "corpus"), str(tmp_path / "ck"), redact=True
    )
    q.awaitTermination()
    got = dict(
        (r["doc_id"], r["text"])
        for r in load_corpus(spark, str(tmp_path / "corpus")).collect()
    )
    assert set(got) == {1, 2, 3, 5, 6}  # 4 is the rejected exact dup
    assert got[2] is None and got[3] == ""
    assert got[5] == "短 文"
    assert got[6] == "mail me <EMAIL>"


def test_stream_matches_batch_on_hostile_day(spark, tmp_path):
    """The closed day's streaming KPIs equal the batch aggregation of
    the same frame under the shared NULL rules — the hostile-data
    extension of the stream/batch reconciliation contract."""
    _write_jsonl(tmp_path / "src", HOSTILE)
    src = spark.readStream.schema(_SCHEMA).json(str(tmp_path / "src"))
    _drain(windowed_kpis(src, window="1 day", watermark="1 day"), "hostile_recon")
    stream_day1 = [
        r
        for r in spark.sql("SELECT * FROM hostile_recon").collect()
        if r["window_start"].isoformat() == "2024-01-01T00:00:00"
    ][0]
    batch = (
        spark.read.schema(_SCHEMA)
        .json(str(tmp_path / "src"))
        .where(F.col("ts").isNotNull())  # the shared NULL-ts rule
        .where(F.to_date("ts") == "2024-01-01")
    )
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.functions.scalars import (
        dec_sum_round2,
        is_purchase,
        price_or_zero,
    )

    b = batch.agg(
        F.count(F.lit(1)).alias("total_events"),
        dec_sum_round2(
            F.when(is_purchase("event_type"), price_or_zero("value")).otherwise(0.0)
        ).alias("revenue_usd"),
    ).collect()[0]
    assert stream_day1["total_events"] == b["total_events"]
    assert stream_day1["revenue_usd"] == b["revenue_usd"]
