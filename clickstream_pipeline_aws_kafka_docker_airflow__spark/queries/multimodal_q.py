"""Multimodal queries: the mapInPandas metadata path is deterministic
(fake decode = pure function of byte length), so even the Pandas-UDF
plumbing gets a DuckDB oracle — proving the Arrow round-trip preserves
values, not just row counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.scalars import dec_avg_trunc4, dec_avg_trunc4_sql
from ..io import load_table
from ..operators.multimodal import (
    HIST_BUCKETS,
    attach_fake_media,
    attach_forged_media,
    extract_decoded_meta,
    frame_sample_stub,
    media_byte_histogram,
)
from ..registry import register


@register(
    "multimodal_meta",
    oracle=f"""
SELECT media_type,
       COUNT(*) AS n_assets,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       {dec_avg_trunc4_sql("width", "duckdb")} AS avg_width,
       {dec_avg_trunc4_sql("height", "duckdb")} AS avg_height,
       {dec_avg_trunc4_sql("sample_rate", "duckdb")} AS avg_sample_rate,
       CAST(SUM(n_samples) AS BIGINT) AS total_samples,
       CAST(SUM(n_frames) AS BIGINT) AS total_frames
FROM (
    -- closed form of the forged containers (operators/multimodal.py):
    -- BMP: 54-byte headers + h rows padded to 4 bytes; WAV: 44-byte
    -- headers + the UTF-8 BYTES of text (octet_length(encode(..)),
    -- NOT strlen — the forge encodes, so a multi-byte character adds
    -- its full byte width; NULL text forges an empty-payload WAV)
    -- padded to even; VID0: 12-byte header + f identical BMP frames
    SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                           ELSE 'video' END AS media_type,
           CASE doc_id % 3
             WHEN 0 THEN 54 + (3 + doc_id % 17)
                         * (((3 * (4 + doc_id % 29) + 3) // 4) * 4)
             WHEN 1 THEN 44 + tb + tb % 2
             ELSE 12 + (1 + doc_id % 4)
                  * (54 + (3 + doc_id % 17)
                     * (((3 * (4 + doc_id % 29) + 3) // 4) * 4))
           END AS n_bytes,
           CASE WHEN doc_id % 3 <> 1 THEN 4 + doc_id % 29 END AS width,
           CASE WHEN doc_id % 3 <> 1 THEN 3 + doc_id % 17 END AS height,
           CASE WHEN doc_id % 3 = 1
                THEN 8000 + (doc_id % 8) * 1000 END AS sample_rate,
           CASE WHEN doc_id % 3 = 1
                THEN (tb + tb % 2) // 2 END AS n_samples,
           CASE doc_id % 3 WHEN 0 THEN 1
                           WHEN 2 THEN 1 + doc_id % 4 END AS n_frames
    FROM (SELECT doc_id,
                 octet_length(encode(coalesce(text, ''))) AS tb
          FROM documents)
)
GROUP BY media_type
""",
)
def multimodal_meta(spark, sf_dir):
    """documents -> forge VALID BMP/WAV/VID0 payloads -> REAL header
    decode (mapInPandas) -> per-type aggregate. The Spark side round
    trips through the actual container bytes; the oracle recomputes
    every decoded field in closed form from (doc_id, strlen) — a
    one-byte forger/parser disagreement breaks the hash match."""
    media = attach_forged_media(load_table(spark, sf_dir, "documents"))
    meta = extract_decoded_meta(media)
    return meta.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum("n_bytes").alias("total_bytes"),
        dec_avg_trunc4("width").alias("avg_width"),
        dec_avg_trunc4("height").alias("avg_height"),
        dec_avg_trunc4("sample_rate").alias("avg_sample_rate"),
        F.sum("n_samples").alias("total_samples"),
        F.sum("n_frames").alias("total_frames"),
    )


FRAME_STEP = 64


@register(
    "media_frame_sample",
    oracle=f"""
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                       ELSE 'video' END AS media_type,
       CAST(o // {FRAME_STEP} AS BIGINT) AS frame_idx,
       CAST(o AS BIGINT) AS byte_offset
FROM (
    SELECT doc_id,
           unnest(generate_series(0, greatest(strlen(text) - 1, 0),
                                  {FRAME_STEP})) AS o
    FROM documents
)
""",
)
def media_frame_sample(spark, sf_dir):
    """Video frame-sampling plumbing, value-checked: one row per
    sampled byte offset per asset (the decode of each frame is the
    stubbed kernel; the row-explosion contract is the real thing).
    The offsets are pure arithmetic over payload length, so even the
    explosion has an exact cross-engine oracle.

    Scale: posexplode is a map-side projection — rows fan out inside
    the scan partition, no shuffle; downstream per-frame work
    (decode, embed) inherits the partitioning.
    """
    media = attach_fake_media(load_table(spark, sf_dir, "documents"))
    return frame_sample_stub(media, FRAME_STEP).select(
        "doc_id",
        "media_type",
        F.col("frame_idx").cast("bigint").alias("frame_idx"),
        F.col("byte_offset").cast("bigint").alias("byte_offset"),
    )


def _hist_oracle() -> str:
    cols = ",\n       ".join(
        f"CAST(len(list_filter(bs, b -> b = {j})) AS BIGINT) AS c{j}"
        for j in range(HIST_BUCKETS)
    )
    return f"""
SELECT doc_id, CAST(octet_length(b) AS BIGINT) AS n_bytes,
       {cols}
FROM (
    -- high nibble of UTF-8 byte i == value of hex digit 2i-1: the
    -- oracle walks the hex spelling of the BLOB, so multi-byte
    -- characters count as their bytes (matching numpy over the binary
    -- payload), never as codepoints. NULL text forges NULL media,
    -- which contributes no histogram row.
    SELECT doc_id, b,
           list_transform(generate_series(1, octet_length(b)),
                          i -> strpos('0123456789abcdef',
                                      substr(hx, 2 * i - 1, 1)) - 1) AS bs
    FROM (
        SELECT doc_id, encode(text) AS b, lower(hex(encode(text))) AS hx
        FROM documents
        WHERE text IS NOT NULL
    )
)
"""


@register("media_histogram", oracle=_hist_oracle())
def media_histogram(spark, sf_dir):
    """Feature extraction through the Arrow binary path, value-checked
    per document: the {HIST_BUCKETS}-bucket high-nibble byte histogram
    computed by numpy inside ``mapInPandas`` must match DuckDB
    recomputing it character-wise in SQL — integer counts, so the
    comparison is exact. (The corpus is ASCII; the byte/char
    equivalence the oracle relies on is the same one ``multimodal_meta``
    already pins via strlen == length.)"""
    media = attach_fake_media(load_table(spark, sf_dir, "documents"))
    return media_byte_histogram(media.select("doc_id", "media"))
