"""PII detection/redaction operator semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.pii import (
    pii_counts,
    redact_pii,
)


def _run(spark, text):
    counts = pii_counts("t")
    df = spark.createDataFrame([(text,)], "t string").select(
        counts["n_emails"].alias("e"),
        counts["n_phones"].alias("p"),
        counts["n_ips"].alias("i"),
        redact_pii("t").alias("red"),
    )
    return df.collect()[0]


def test_pii_counts_and_redaction(spark):
    r = _run(
        spark,
        "mail a.b+c@ex-corp.co.uk or x@y.io, dial 555-123-4567, host 10.0.0.1.",
    )
    assert (r["e"], r["p"], r["i"]) == (2, 1, 1)
    assert r["red"] == "mail <EMAIL> or <EMAIL>, dial <PHONE>, host <IP>."


def test_pii_clean_text_untouched(spark):
    r = _run(spark, "no personal data here, just words and the number 42")
    assert (r["e"], r["p"], r["i"]) == (0, 0, 0)
    assert r["red"] == "no personal data here, just words and the number 42"


def test_pii_masks_do_not_cascade(spark):
    """A masked email must not leave residue a later pattern matches,
    and redacting twice is idempotent."""
    text = "u1@host.example.com 1.2.3.4"
    df = spark.createDataFrame([(text,)], "t string").select(
        redact_pii(redact_pii("t")).alias("twice"), redact_pii("t").alias("once")
    )
    row = df.collect()[0]
    assert row["once"] == "<EMAIL> <IP>"
    assert row["twice"] == row["once"]


# ---------------------------------------------------------------------------
# property fuzz: redaction invariants on arbitrary text around planted PII

import re as _re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.pii import (
    EMAIL_RE,
    IPV4_RE,
    PHONE_RE,
)

_filler = st.text(
    alphabet=st.characters(
        min_codepoint=32, max_codepoint=126, exclude_characters="\r\n"
    ),
    max_size=30,
).filter(
    # keep the filler itself PII-free so the expected counts are exact
    lambda s: not any(
        _re.search(p, s) for p in (EMAIL_RE, PHONE_RE, IPV4_RE)
    )
)
_pii = st.sampled_from(
    ["bob@x.io", "a.b-c@sub.example.org", "555-867-5309", "10.0.0.255", "192.168.1.1"]
)


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(_filler, _pii, _filler), min_size=1, max_size=8))
def test_pii_fuzz_counts_and_clean(spark, chunks):
    """Whatever printable filler surrounds the planted PII: total hits
    >= number planted, redacted text has ZERO residual matches, and
    redaction never grows the match count of the original."""
    text = " ".join(f"{a} {p} {b}" for a, p, b in chunks)
    r = _run(spark, text)
    assert (r["e"] + r["p"] + r["i"]) >= len(chunks)
    red = r["red"]
    for pat in (EMAIL_RE, PHONE_RE, IPV4_RE):
        assert not _re.search(pat, red), (pat, red)
