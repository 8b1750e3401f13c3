"""Explicit StructTypes for every record type the engine touches.

The reference is schemaless-on-write: the event shape exists only
implicitly in the producer (``/root/reference/kafka/producer/
produce_events.py:28-45``) and is re-inferred defensively by every
consumer (``daily_kpis.py:117-129``). We pin explicit schemas — schema
inference over 100 TB of JSONL means a full extra pass over the data,
and silent type drift. PERMISSIVE parsing (:mod:`sources.jsonl`)
preserves the reference's tolerance for malformed rows.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Clickstream event as produced by the reference's Kafka producer
# (produce_events.py:34-45). `event_ts` arrives as an ISO-8601 string and
# is parsed downstream; `price` is null except on purchases
# (produce_events.py:33,41).
CLICKSTREAM_EVENT_RAW = StructType(
    [
        StructField("event_ts", StringType()),
        StructField("user_id", StringType()),
        StructField("session_id", StringType()),
        StructField("event_type", StringType()),
        StructField("page", StringType()),
        StructField("product_id", StringType()),
        StructField("price", DoubleType()),
        StructField("currency", StringType()),
        StructField("referrer", StringType()),
        StructField("user_agent", StringType()),
    ]
)

# Same event with the timestamp parsed and the corrupt-record column used
# by PERMISSIVE json parsing (keep-malformed semantics of
# ingest_clickstream_to_s3.py:44-51).
CORRUPT_COL = "_corrupt_record"
CLICKSTREAM_EVENT_RAW_PERMISSIVE = StructType(
    CLICKSTREAM_EVENT_RAW.fields + [StructField(CORRUPT_COL, StringType())]
)

# Daily KPI output row (daily_kpis.py:133-140): one row per day.
KPI_DAILY = StructType(
    [
        StructField("dt", StringType()),
        StructField("total_events", LongType()),
        StructField("unique_users", LongType()),
        StructField("unique_sessions", LongType()),
        StructField("pageviews", LongType()),
        StructField("purchases", LongType()),
        StructField("revenue_usd", DoubleType()),
    ]
)

# Driver testdata tables (/root/repo/TESTDATA.md) — used for validation
# and for building file-stream stand-ins in tests.
EVENTS = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

EMBEDDINGS = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)
