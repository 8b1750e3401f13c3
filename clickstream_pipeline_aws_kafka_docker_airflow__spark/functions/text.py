"""Text-analysis Column builders (LLM-data-pipeline extension ops).

All pure Catalyst expressions — regexes kept to portable ASCII classes
so the DuckDB (RE2) oracle and Spark (Java regex) agree byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# One regex token = a letter run, a digit run, or a single non-space
# symbol — a BPE-ish pre-tokenization split (GPT-2-style, simplified).
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT_RE = r"[.,;:!?]"
STOPWORD_RE = r"\b(the|a|an|and|or|of|to|in|is)\b"

# Tiny per-language marker lexicons for the n-gram/stopword language-ID
# heuristic. Order matters: ties break toward the earlier language.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|to|is|with)\b",
    "de": r"\b(der|die|das|und|nicht|mit)\b",
    "es": r"\b(el|la|los|las|que|con)\b",
    "fr": r"\b(le|les|des|et|est|avec)\b",
    "zh": r"[一-鿿]",
}


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def ws_token_count(c: Column | str) -> Column:
    """Whitespace token count: ``len(split(trim(text), r'\\s+'))``.
    Matches DuckDB ``len(regexp_split_to_array(trim(text),'\\s+'))``
    including the empty-string -> 1 edge."""
    return F.size(F.split(F.trim(_col(c)), r"\s+")).cast("bigint")


def bpe_token_count(c: Column | str) -> Column:
    """Count of BPE-ish regex tokens."""
    return F.regexp_count(_col(c), F.lit(BPE_TOKEN_RE)).cast("bigint")


def punct_count(c: Column | str) -> Column:
    return F.regexp_count(_col(c), F.lit(PUNCT_RE)).cast("bigint")


def upper_count(c: Column | str) -> Column:
    return F.regexp_count(_col(c), F.lit("[A-Z]")).cast("bigint")


def stopword_count(c: Column | str) -> Column:
    return F.regexp_count(F.lower(_col(c)), F.lit(STOPWORD_RE)).cast("bigint")


def lang_scores(c: Column | str) -> dict[str, Column]:
    """Marker-hit count per candidate language."""
    lowered = F.lower(_col(c))
    return {
        lang: F.regexp_count(lowered, F.lit(pat)).cast("bigint")
        for lang, pat in LANG_MARKERS.items()
    }


def normalize_text(c: Column | str) -> Column:
    """Canonical form for fingerprinting/dedup: lowercase, collapse all
    whitespace runs to single spaces, trim."""
    return F.regexp_replace(F.lower(F.trim(_col(c))), r"\s+", " ")


def fingerprint_md5(c: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.
    (md5 hex is identical across Spark/DuckDB — portable for oracles;
    a rolling/Rabin hash variant lives in operators.dedup for MinHash.)"""
    return F.md5(normalize_text(c).cast("binary"))
