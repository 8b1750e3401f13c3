"""At-least-once replay dedup: the reference's crash-between-upload-and-
commit produces duplicate deliveries with no downstream dedup
(SURVEY.md §2.4 stream_at_least_once). The Spark answer when consuming
from an at-least-once producer is dropDuplicatesWithinWatermark on a
delivery key."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row


def test_stream_dedup_within_watermark(spark, tmp_path):
    base = dt.datetime(2025, 9, 1, 0, 0)
    rows = [
        Row(event_id="e1", ts=base, user_id="u1"),
        Row(event_id="e1", ts=base, user_id="u1"),  # redelivery
        Row(event_id="e2", ts=base + dt.timedelta(minutes=1), user_id="u1"),
        Row(event_id="e2", ts=base + dt.timedelta(minutes=1), user_id="u1"),
        Row(event_id="e3", ts=base + dt.timedelta(minutes=2), user_id="u2"),
    ]
    df = spark.createDataFrame(rows)
    src = tmp_path / "src"
    df.coalesce(1).write.parquet(str(src / "p"))
    stream = spark.readStream.schema(df.schema).parquet(str(src / "p"))

    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT event_id FROM dedup_stream").collect()
    assert sorted(r["event_id"] for r in out) == ["e1", "e2", "e3"]


def test_batch_dedup_exact_rows(spark):
    """ext_dedup_exact batch form: dropDuplicates on the delivery key."""
    rows = [
        Row(event_id="e1", v=1),
        Row(event_id="e1", v=1),
        Row(event_id="e2", v=2),
    ]
    out = spark.createDataFrame(rows).dropDuplicates(["event_id"]).collect()
    assert len(out) == 2
