"""PII scrub query + oracle.

The driver corpus contains no PII (vocabulary-word text only), so the
fixture stage PLANTS deterministic PII into a slice of documents —
doc_id arithmetic shared with the oracle — and the detection/redaction
operators (operators/pii.py) then run over the salted text exactly as
they would over a real crawl. ``clean`` is the in-query contract: the
redacted text must contain zero remaining matches.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_table
from ..operators.scale import widen
from ..operators.pii import EMAIL_RE, IPV4_RE, PHONE_RE, pii_counts, redact_pii
from ..registry import register


def _planted(events_docs):
    """Deterministically salt every 7th/7th+1/7th+2 doc (7 is coprime with the source assignment's mod-20, so per-source PII incidence varies instead of degenerating to 0/1000) with an
    email / IPv4 / phone respectively."""
    d = F.col("doc_id")
    salted = (
        F.when(
            d % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                d.cast("string"),
                F.lit("@example.com now"),
            ),
        )
        .when(
            d % 7 == 1,
            F.concat(
                F.col("text"),
                F.lit(" from 192.168."),
                (d % 256).cast("string"),
                F.lit(".7 today"),
            ),
        )
        .when(
            d % 7 == 2,
            F.concat(
                F.col("text"),
                F.lit(" call 555-"),
                F.lpad((d % 1000).cast("string"), 3, "0"),
                F.lit("-"),
                F.lpad((d % 10000).cast("string"), 4, "0"),
            ),
        )
        .otherwise(F.col("text"))
    )
    return events_docs.withColumn("text", salted)


_PLANT_SQL = """
    CASE
        WHEN doc_id % 7 = 0 THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
        WHEN doc_id % 7 = 1 THEN text || ' from 192.168.' || CAST(doc_id % 256 AS VARCHAR) || '.7 today'
        WHEN doc_id % 7 = 2 THEN text || ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        ELSE text
    END
"""

# DuckDB string literals are standard-SQL (no backslash escape
# processing) — the Python pattern strings drop in verbatim.
_E = EMAIL_RE
_P = PHONE_RE
_I = IPV4_RE


@register(
    "pii_scrub",
    oracle=f"""
WITH salted AS (
    SELECT doc_id, {_PLANT_SQL} AS text FROM documents
), red AS (
    SELECT doc_id, text,
           regexp_replace(regexp_replace(regexp_replace(text,
               '{_E}', '<EMAIL>', 'g'),
               '{_P}', '<PHONE>', 'g'),
               '{_I}', '<IP>', 'g') AS redacted
    FROM salted
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_E}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{_P}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(text, '{_I}')) AS BIGINT) AS n_ips,
       CAST(length(text) - length(redacted) AS BIGINT) AS chars_redacted,
       (len(regexp_extract_all(redacted, '{_E}')) = 0
        AND len(regexp_extract_all(redacted, '{_P}')) = 0
        AND len(regexp_extract_all(redacted, '{_I}')) = 0) AS clean
FROM red
""",
)
def pii_scrub(spark, sf_dir):
    """Detect and mask emails / phones / IPv4s per document; emit match
    counts, chars removed by masking, and the ``clean`` contract (no
    residual match in the redacted text). Pure JVM regex column
    exprs — the scan stays in whole-stage codegen."""
    # widen: six regex passes per row are compute-bound; a one-row-group
    # layout scans as one task (docs/SCALING_CURVE.json: 5.7 s flat at
    # any core count, 0.5 s widened) — no-op at production split counts
    docs = widen(
        _planted(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    )
    counts = pii_counts("text")
    red = redact_pii("text")
    residual = pii_counts(red)
    return docs.select(
        "doc_id",
        counts["n_emails"].alias("n_emails"),
        counts["n_phones"].alias("n_phones"),
        counts["n_ips"].alias("n_ips"),
        (F.length("text") - F.length(red)).cast("bigint").alias("chars_redacted"),
        (
            (residual["n_emails"] == 0)
            & (residual["n_phones"] == 0)
            & (residual["n_ips"] == 0)
        ).alias("clean"),
    )
