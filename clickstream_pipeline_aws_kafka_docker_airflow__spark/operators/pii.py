"""PII detection and redaction for text corpora.

A standard pre-training curation stage: count and mask emails, phone
numbers, and IPv4 addresses before a document may enter the training
mix. Pure column expressions (JVM regex, whole-stage codegen) — no
UDFs, so the scan stays vectorized at 100 TB; patterns are kept inside
the subset of regex syntax that Java's engine and DuckDB's RE2 agree
on, so every stage has a byte-equivalent SQL oracle.

Detection-before-admission composes with the curation pipeline
(queries/curation_q.py): a doc with any unredacted hit fails the
quality gate; the redacted text is what a compliant corpus stores.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Same pattern strings feed F.regexp_* and the DuckDB oracles.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_MASKS = [(EMAIL_RE, "<EMAIL>"), (PHONE_RE, "<PHONE>"), (IPV4_RE, "<IP>")]


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-kind match counts (bigint) for one text column."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        "n_emails": F.regexp_count(c, F.lit(EMAIL_RE)).cast("bigint"),
        "n_phones": F.regexp_count(c, F.lit(PHONE_RE)).cast("bigint"),
        "n_ips": F.regexp_count(c, F.lit(IPV4_RE)).cast("bigint"),
    }


def redact_pii(text: Column | str) -> Column:
    """Mask every email, then phone, then IPv4 occurrence. Masks carry
    no digits or '@', so later patterns cannot re-match inside an
    earlier mask; the order is fixed and mirrored by the oracle."""
    c = F.col(text) if isinstance(text, str) else text
    for pat, mask in _MASKS:
        c = F.regexp_replace(c, pat, mask)
    return c
