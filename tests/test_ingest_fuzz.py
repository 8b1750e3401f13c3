"""Property-based fuzz of the permissive JSONL ingest path: whatever
bytes arrive, the permissive read must never throw, never drop a line,
and must route every malformed line into the corrupt-record column
with the original text intact (the reference's keep-everything ingest
contract)."""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickstream_pipeline_aws_kafka_docker_airflow__spark.schemas import CORRUPT_COL
from clickstream_pipeline_aws_kafka_docker_airflow__spark.sources.jsonl import (
    read_jsonl_keep_malformed,
)

# printable-ish single-line payloads: valid events, truncated JSON,
# non-JSON junk, wrong-typed fields, empty-ish lines
_line = st.one_of(
    st.builds(
        lambda u, p: json.dumps(
            {
                "event_ts": "2025-09-01T10:00:00Z",
                "user_id": u,
                "session_id": "s",
                "event_type": "page_view",
                "page": "/",
                "product_id": "sku",
                "price": p,
                "currency": "USD",
                "referrer": "r",
                "user_agent": "UA",
            }
        ),
        st.text(
            alphabet=st.characters(min_codepoint=97, max_codepoint=122),
            min_size=1,
            max_size=8,
        ),
        st.one_of(st.none(), st.floats(0, 100, allow_nan=False)),
    ),
    st.text(
        alphabet=st.characters(
            min_codepoint=32, max_codepoint=126, exclude_characters="\r\n"
        ),
        min_size=1,
        max_size=60,
    ),
    st.just('{"user_id": "u1", "price": "not-a-number"}'),
    st.just('{"truncated": '),
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(_line, min_size=1, max_size=25))
def test_permissive_ingest_never_drops_a_line(spark, tmp_path_factory, lines):
    td = tmp_path_factory.mktemp("fuzz")
    src = td / "data.jsonl"
    src.write_text("\n".join(lines) + "\n", encoding="utf-8")
    out = read_jsonl_keep_malformed(spark, str(src)).collect()
    # PERMISSIVE keeps every physical line as a row
    assert len(out) == len(lines)
    for line, row in zip(lines, out):
        d = row.asDict()
        corrupt = d.get(CORRUPT_COL)
        try:
            parsed = json.loads(line)
            is_obj = isinstance(parsed, dict)
        except ValueError:
            is_obj = False
        if not is_obj:
            # malformed -> original text preserved (modulo trailing
            # whitespace, which the line reader may normalize)
            assert corrupt is not None
            assert corrupt.rstrip() == line.rstrip()
