"""The local parity harness must catch cross-engine dtype drift, not
just value drift: DuckDB returns SUM(BIGINT) as HUGEINT (pandas
float64) while Spark returns BIGINT, and Python's ``6.0 == 6`` makes a
value-only comparison blind to it — ``text_stats_by_lang`` shipped red
two rounds in a row that way. These tests plant the drift classes and
assert ``compare_frames`` flags them (and stays quiet on the legit
cross-engine representation differences)."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

from clickstream_pipeline_aws_kafka_docker_airflow__spark.testing import compare_frames


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect(":memory:")
    try:
        return con.sql(sql).df()
    finally:
        con.close()


def test_planted_bare_sum_is_flagged():
    oracle = _duck("SELECT SUM(x) AS s FROM (SELECT unnest([1,2,3]) AS x)")
    spark_like = pd.DataFrame({"s": np.array([6], dtype=np.int64)})
    probs = compare_frames(spark_like, oracle)
    assert probs and "dtype drift" in probs[0], probs


def test_cast_bigint_sum_passes():
    oracle = _duck(
        "SELECT CAST(SUM(x) AS BIGINT) AS s FROM (SELECT unnest([1,2,3]) AS x)"
    )
    spark_like = pd.DataFrame({"s": np.array([6], dtype=np.int64)})
    assert compare_frames(spark_like, oracle) == []


def test_planted_integer_division_is_flagged():
    # HUGEINT // int stays HUGEINT -> float64 in pandas
    oracle = _duck("SELECT SUM(x) // 2 AS d FROM (SELECT unnest([1,2,3]) AS x)")
    spark_like = pd.DataFrame({"d": np.array([3], dtype=np.int64)})
    probs = compare_frames(spark_like, oracle)
    assert probs and "dtype drift" in probs[0], probs


def test_decimal_leak_is_caught():
    # DuckDB surfaces DECIMAL aggregates as float64, so Spark queries
    # must cast decimal results to double before returning; a leaked
    # Decimal object fails the value comparison (Decimal != float).
    spark_like = pd.DataFrame({"rev": [Decimal("12.34")]})
    duck_like = pd.DataFrame({"rev": np.array([12.34], dtype=np.float64)})
    assert compare_frames(spark_like, duck_like)


def test_date_vs_datetime_is_one_class():
    # Spark DATE -> object(datetime.date); DuckDB DATE -> datetime64.
    spark_like = pd.DataFrame({"dt": [dt.date(2025, 9, 1)]})
    duck_like = _duck("SELECT CAST(TIMESTAMP '2025-09-01' AS DATE) AS dt")
    assert compare_frames(spark_like, duck_like) == []


def test_value_mismatch_still_caught():
    a = pd.DataFrame({"n": np.array([1], dtype=np.int64)})
    b = pd.DataFrame({"n": np.array([2], dtype=np.int64)})
    assert compare_frames(a, b)
