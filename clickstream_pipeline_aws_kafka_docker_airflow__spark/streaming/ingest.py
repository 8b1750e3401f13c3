"""Streaming ingest job: source -> parse -> event-time partition cols ->
hive-partitioned JSONL raw zone.

Replaces the reference's per-minute Airflow poll loop
(``ingest_clickstream_to_s3.py:7-81``) with one Structured Streaming
query:

* the 60 s wall-clock consume window -> ``processingTime`` trigger (or
  ``AvailableNow`` for an orchestrated run-to-completion);
* hand-committed Kafka offsets (at-least-once, duplicates on crash,
  :20-23,52-56) -> checkpointed offsets + file-sink commit log =
  exactly-once (strictly stronger; duplicates simply cannot happen);
* the ``{(day,hour): [lines]}`` bucket dict (:27,41) -> ``partitionBy``
  on derived event-time columns;
* malformed lines kept and bucketed by processing time (:44-51) ->
  PERMISSIVE parse + ``coalesce(event_ts, current_timestamp())``;
* the empty-batch guard (:60-63) is implicit — an empty micro-batch
  writes nothing.

The source is pluggable so tests drive the identical pipeline from a
file stream (no broker in the test env) while production uses Kafka.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..schemas import CORRUPT_COL
from ..sources.jsonl import parse_kafka_value, with_partition_cols

# Raw-zone name for the kept-malformed payload: a field named
# `_corrupt_record` inside data files would collide with Spark's
# reserved corrupt-column on read-back and silently null out.
CORRUPT_OUT_COL = "corrupt_payload"

# Raw-zone name for the verbatim source line (see build_ingest_frame).
PAYLOAD_COL = "payload"


def build_ingest_frame(
    raw: DataFrame, value_col: str = "value", keep_payload: bool = True
) -> DataFrame:
    """The transformation shared by batch/stream/test paths:
    payload -> typed event columns (+corrupt_payload) -> (date,hour).

    ``keep_payload=True`` (default) carries the VERBATIM source line in
    a ``payload`` column — the reference's raw zone is the byte-exact
    line list bucketed by (date,hour) (ingest_clickstream_to_s3.py:
    41-51,70-79), so a lossless raw zone must keep the original bytes:
    the typed columns alone drop unknown fields and malformed-but-
    parseable detail. tests/test_ingest_fidelity.py pins the byte
    equality. Set False to halve raw-zone volume when byte fidelity is
    not required (typed columns + corrupt_payload still preserve every
    schema field and every malformed line)."""
    from pyspark.sql import functions as F

    if keep_payload:
        src = raw.withColumn(PAYLOAD_COL, F.col(value_col).cast("string"))
        parsed = parse_kafka_value(src, value_col, passthrough=(PAYLOAD_COL,))
    else:
        parsed = parse_kafka_value(raw, value_col)
    return with_partition_cols(parsed.withColumnRenamed(CORRUPT_COL, CORRUPT_OUT_COL))


def start_ingest(
    raw_stream: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    trigger: dict | None = None,
    value_col: str = "value",
    keep_payload: bool = True,
) -> StreamingQuery:
    """Start the raw-zone ingest. ``trigger`` defaults to AvailableNow —
    drain everything then stop, the orchestrated-batch mode; pass
    ``{"processingTime": "60 seconds"}`` for the reference's cadence."""
    events = build_ingest_frame(raw_stream, value_col, keep_payload)
    writer = (
        events.writeStream.format("json")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("date", "hour")
    )
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()
