"""Replicates the driver's correctness gate locally: every registered
query with an oracle is compared against DuckDB at sf0.001 (fast) —
row count, column names, and canonicalized values.
"""

from __future__ import annotations

import pytest

from clickstream_pipeline_aws_kafka_docker_airflow__spark import registry
from clickstream_pipeline_aws_kafka_docker_airflow__spark.testing import assert_parity

from conftest import SF_SMOKE

_QUERIES = registry.queries()
_ORACLES = registry.oracle_sql()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(spark, name):
    assert_parity(spark, SF_SMOKE, name, _QUERIES[name], _ORACLES[name])


def test_every_query_has_an_oracle():
    """All 128 registered queries carry a full DuckDB oracle — the
    rows-only fallback class is empty and must stay empty (a new query
    without an oracle only gets the driver's weak rows-only check)."""
    assert sorted(set(_QUERIES) - set(_ORACLES)) == []
