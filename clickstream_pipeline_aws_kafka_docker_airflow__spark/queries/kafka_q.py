"""Kafka payload round-trip, value-checked end to end.

The reference producer serializes one JSON object per message
(``produce_events.py:82``) with the exact shape of ``make_event``
(``produce_events.py:28-45``): 10 fields in fixed order, ``event_ts``
as Z-suffixed ISO-8601 with microseconds, ``price`` explicitly null
except on purchases. This query drives the engine's serialize -> parse
path (``sources/kafka.py::to_kafka_payload`` ->
``sources/jsonl.py::parse_kafka_value``) over deterministically
generated events and returns the parsed fields — the oracle is the
generator itself, so any field the round trip loses or mangles
(dropped null keys, timestamp reformatting, double mangling) fails the
hash compare. Byte-level payload-shape assertions (key order, null
price key present, micros+Z) live in tests/test_kafka_roundtrip.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import register
from ..schemas import CLICKSTREAM_EVENT_RAW, CORRUPT_COL
from ..sources import generator as G
from ..sources.jsonl import parse_kafka_value
from ..sources.kafka import to_kafka_payload
from .windows_q import GEN_DAYS, GEN_N, GEN_START, GEN_START_US

_FIELDS = [f.name for f in CLICKSTREAM_EVENT_RAW.fields]


@register(
    "kafka_payload_roundtrip",
    oracle=f"""
SELECT *, FALSE AS is_corrupt
FROM ({G.gen_events_oracle_sql(GEN_N, GEN_START_US, GEN_DAYS)})
""",
)
def kafka_payload_roundtrip(spark, sf_dir):
    """src_kafka_consume + sink_kafka_produce semantics: generate ->
    to_json payload (nulls kept, reference shape) -> PERMISSIVE
    from_json -> typed fields. Identity by construction; the oracle
    proves it value-for-value."""
    ev = G.generate_events_batch_deterministic(
        spark, GEN_N, start_date=GEN_START, days=GEN_DAYS
    )
    parsed = parse_kafka_value(to_kafka_payload(ev))
    return parsed.select(
        *_FIELDS, F.col(CORRUPT_COL).isNotNull().alias("is_corrupt")
    )
