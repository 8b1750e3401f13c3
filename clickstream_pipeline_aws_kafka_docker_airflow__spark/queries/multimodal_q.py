"""Multimodal queries: the mapInPandas metadata path is deterministic
(fake decode = pure function of byte length), so even the Pandas-UDF
plumbing gets a DuckDB oracle — proving the Arrow round-trip preserves
values, not just row counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.scalars import dec_avg_trunc4, dec_avg_trunc4_sql
from ..io import load_table
from ..operators.multimodal import attach_fake_media, extract_media_meta
from ..registry import register


@register(
    "multimodal_meta",
    oracle=f"""
SELECT media_type,
       COUNT(*) AS n_assets,
       SUM(n_bytes) AS total_bytes,
       {dec_avg_trunc4_sql("width", "//")} AS avg_width,
       {dec_avg_trunc4_sql("height", "//")} AS avg_height
FROM (
    SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                           ELSE 'video' END AS media_type,
           strlen(text) AS n_bytes,
           64 + (strlen(text) % 577) AS width,
           64 + (strlen(text) * 31) % 391 AS height
    FROM documents
)
GROUP BY media_type
""",
)
def multimodal_meta(spark, sf_dir):
    """documents -> forged binary media -> mapInPandas metadata ->
    per-type aggregate."""
    media = attach_fake_media(load_table(spark, sf_dir, "documents"))
    meta = extract_media_meta(media)
    return meta.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum("n_bytes").alias("total_bytes"),
        dec_avg_trunc4("width").alias("avg_width"),
        dec_avg_trunc4("height").alias("avg_height"),
    )
