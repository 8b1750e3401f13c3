"""JSONL sources with the reference's two malformed-line policies.

The reference is asymmetric (SURVEY.md §2.2):

* ingest path **keeps** undecodable lines, routing them to a
  processing-time fallback bucket
  (``ingest_clickstream_to_s3.py:44-51``) — here: PERMISSIVE parse with
  a ``_corrupt_record`` column, then event-time cols fall back to
  ``current_timestamp`` for corrupt rows;
* daily-KPI path **skips** undecodable lines
  (``daily_kpis.py:93-107``) — here: DROPMALFORMED.

Both run as schema-pinned scans (no inference pass — at 100 TB schema
inference would read the corpus twice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.scalars import derive_date, derive_hour, ts_parse_iso
from ..schemas import CLICKSTREAM_EVENT_RAW, CLICKSTREAM_EVENT_RAW_PERMISSIVE, CORRUPT_COL
from ..session import apply_engine_confs


def read_jsonl_keep_malformed(spark: SparkSession, path: str) -> DataFrame:
    """Ingest-path read: malformed lines kept with the raw text in
    ``_corrupt_record`` and all event fields null.

    Reads via the ``text`` datasource + permissive ``from_json`` rather
    than the JSON datasource: the JSON reader silently skips
    whitespace-only lines, while the reference's line loop keeps them
    (``json.loads(" ")`` raises -> fallback bucket,
    ingest_clickstream_to_s3.py:44-51). ``text`` + ``from_json`` keeps
    the one-row-per-physical-line contract and stays fully JVM-side."""
    apply_engine_confs(spark)
    return parse_kafka_value(spark.read.text(path), value_col="value")


def read_jsonl_drop_malformed(
    spark: SparkSession, path: str | list[str], base_path: str | None = None
) -> DataFrame:
    """KPI-path read: malformed lines silently skipped. Accepts one
    path or a list (one multi-path scan — the backfill shape); pass
    ``base_path`` when the paths are partition directories under a
    common root so Spark anchors partition discovery there instead of
    raising CONFLICTING_DIRECTORY_STRUCTURES."""
    apply_engine_confs(spark)
    reader = (
        spark.read.schema(CLICKSTREAM_EVENT_RAW)
        .option("mode", "DROPMALFORMED")
    )
    if base_path is not None:
        reader = reader.option("basePath", base_path)
    return reader.json(path)


def with_partition_cols(events: DataFrame, ts_col: str = "event_ts") -> DataFrame:
    """Derive event-time partition columns with the reference's
    processing-time fallback: rows whose ``event_ts`` is missing or
    unparseable bucket under *now* instead of being dropped
    (ingest_clickstream_to_s3.py:36-51). Late data therefore back-fills
    its event-time partition — never dropped (stream_late_data_policy)."""
    ts = F.coalesce(ts_parse_iso(F.col(ts_col)), F.current_timestamp())
    return events.withColumn("date", derive_date(ts).cast("string")).withColumn(
        "hour", derive_hour(ts)
    )


def parse_kafka_value(
    raw: DataFrame,
    value_col: str = "value",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Parse a Kafka-style ``value`` byte/string column into typed event
    columns, keeping malformed payloads (PERMISSIVE ``from_json``).

    "Malformed" matches the reference line loop
    (ingest_clickstream_to_s3.py:34-51) exactly: a payload is corrupt
    iff it is not a JSON *object* — ``json.loads`` raising, or the
    parse yielding a non-dict (``5``, ``[1,2]``, ``"str"``, ``null``,
    whose ``.get`` raises AttributeError into the same except-branch).
    A field-less but valid object like ``{}`` is NOT corrupt: the
    reference parses it and only routes it to the processing-time
    bucket because ``event_ts`` is missing — which
    :func:`with_partition_cols` reproduces downstream. The object test
    is ``schema_of_variant(try_parse_json(...))`` — JVM-side, no UDF;
    ``from_json``'s own ``_corrupt_record`` (set when a field fails to
    coerce) is kept as a second corruption source.

    ``passthrough``: extra columns of ``raw`` to carry into the output
    unchanged (e.g. the verbatim payload for a byte-lossless raw zone,
    streaming/ingest.py)."""
    parsed = F.from_json(
        F.col(value_col).cast("string"),
        CLICKSTREAM_EVENT_RAW_PERMISSIVE,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
    )
    base = raw.select(
        F.col(value_col).cast("string").alias("_raw"),
        parsed.alias("e"),
        *[F.col(c) for c in passthrough],
    )
    fields = [f.name for f in CLICKSTREAM_EVENT_RAW.fields]
    non_object = ~F.startswith(
        F.expr("schema_of_variant(try_parse_json(_raw))"), F.lit("OBJECT")
    )
    corrupt = F.coalesce(
        F.col(f"e.{CORRUPT_COL}"),
        F.when(F.coalesce(non_object, F.lit(True)), F.col("_raw")),
    )
    return base.select(
        *[F.col(f"e.{fn}").alias(fn) for fn in fields],
        corrupt.alias(CORRUPT_COL),
        *[F.col(c) for c in passthrough],
    )
