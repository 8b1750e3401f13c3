"""Raw-zone payload fidelity, byte-for-byte.

The reference's raw zone is the verbatim line list bucketed by
(date,hour) — a consumed line is appended unmodified and written as-is
(ingest_clickstream_to_s3.py:41-51,70-79). These tests drive
producer-shaped payloads (the real generator through the real Kafka
serializer) plus the malformed-line taxonomy through the streaming
ingest and assert the raw zone's FILE CONTENTS, not just counts:

* every input line reappears exactly once, byte-for-byte, in the
  ``payload`` column;
* lines that ``json.loads`` to a dict are NOT marked corrupt; all
  others carry the original bytes in ``corrupt_payload`` too
  (keep-malformed);
* parseable-``event_ts`` lines land in their event-time (date,hour)
  bucket; missing/garbage timestamps and non-object lines land in a
  processing-time bucket (never dropped).
"""

from __future__ import annotations

import json
import pathlib

from pyspark.sql.types import StringType, StructField, StructType

from clickstream_pipeline_aws_kafka_docker_airflow__spark.sources.generator import (
    generate_events_batch_deterministic,
)
from clickstream_pipeline_aws_kafka_docker_airflow__spark.sources.kafka import (
    to_kafka_payload,
)
from clickstream_pipeline_aws_kafka_docker_airflow__spark.streaming.ingest import (
    start_ingest,
)

# the reference's except-branch taxonomy: json.loads raises -> corrupt;
# loads to a non-dict -> .get raises -> same branch -> corrupt; loads
# to a dict -> valid, bucketed by event_ts or processing time
EDGE_LINES = [
    "{}",  # valid, field-less -> processing-time bucket, NOT corrupt
    '{"event_ts": "garbage-ts", "user_id": "u_garbage"}',  # valid obj, bad ts
    '{"user_id": "u_nots"}',  # valid obj, no ts
    "[1, 2]",
    "5",
    '"a string"',
    "null",
    "   ",
    "{not json at all",
]


def test_raw_zone_byte_fidelity(spark, tmp_path: pathlib.Path):
    ev = generate_events_batch_deterministic(
        spark, 40, start_date="2025-09-01", days=2
    )
    produced = [r["value"] for r in to_kafka_payload(ev).collect()]
    lines = produced + EDGE_LINES

    src = tmp_path / "src"
    src.mkdir()
    (src / "batch1.txt").write_text("\n".join(lines) + "\n", encoding="utf-8")
    out, ckpt = tmp_path / "raw", tmp_path / "ckpt"

    raw = spark.readStream.schema(
        StructType([StructField("value", StringType())])
    ).text(str(src))
    q = start_ingest(raw, str(out), str(ckpt))
    q.awaitTermination(120)

    rows = [r.asDict() for r in spark.read.json(str(out)).collect()]

    # every line byte-identical in the payload column, exactly once
    assert sorted(r["payload"] for r in rows) == sorted(lines)
    by_payload = {r["payload"]: r for r in rows}

    for line in lines:
        row = by_payload[line]
        try:
            parsed = json.loads(line)
            is_obj = isinstance(parsed, dict)
        except ValueError:
            is_obj = False

        if not is_obj:
            # keep-malformed: original bytes preserved, processing-time
            # bucket assigned (never dropped)
            assert row["corrupt_payload"] == line
            assert row["date"] is not None and row["hour"] is not None
            continue

        # valid object: not corrupt, every schema field value-identical
        # to what the reference's json.loads would see
        assert row["corrupt_payload"] is None
        for field in (
            "user_id", "session_id", "event_type", "page",
            "product_id", "currency", "referrer", "user_agent",
        ):
            assert row.get(field) == parsed.get(field), (field, line)
        # the JSON sink drops null fields, so a price key may be absent
        # from the read-back schema entirely when no purchase occurred
        if parsed.get("price") is None:
            assert row.get("price") is None
        else:
            assert row.get("price") == parsed["price"]

        ets = parsed.get("event_ts")
        if ets and not ets.startswith("garbage"):
            # event-time bucket: date/hour derived from event_ts
            assert str(row["date"]) == ets[:10], line
            assert int(row["hour"]) == int(ets[11:13]), line
        else:
            # missing/garbage ts -> processing-time bucket, still kept
            assert row["date"] is not None and row["hour"] is not None


def test_empty_object_is_not_corrupt_but_nonobjects_are(spark, tmp_path):
    """The exact classification boundary of the reference loop:
    ``{}`` parses (valid; fallback bucket only because event_ts is
    missing) while non-object JSON scalars/arrays hit the same except
    branch as unparseable text (``.get`` raises)."""
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.sources.jsonl import (
        read_jsonl_keep_malformed,
    )

    p = tmp_path / "files"
    p.mkdir()
    (p / "a.jsonl").write_text(
        '{}\n{"user_id": "u1"}\n5\n[1]\n"s"\nnull\njunk\n'
    )
    kept = read_jsonl_keep_malformed(spark, str(p)).cache()
    assert kept.count() == 7
    corrupt = [
        r["_corrupt_record"]
        for r in kept.where("_corrupt_record IS NOT NULL").collect()
    ]
    assert sorted(corrupt) == sorted(["5", "[1]", '"s"', "null", "junk"])
