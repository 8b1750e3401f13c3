"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in the package; this file is a thin shim over
``clickstream_pipeline_aws_kafka_docker_airflow__spark.registry``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from clickstream_pipeline_aws_kafka_docker_airflow__spark import registry  # noqa: E402
from clickstream_pipeline_aws_kafka_docker_airflow__spark.io import load_table  # noqa: E402
from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.kpis import (  # noqa: E402
    daily_kpis,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the reference's daily-KPI aggregation
    (daily_kpis.py:109-140) over the events table — all days, one pass."""
    return daily_kpis(load_table(spark, SMOKE_SF_DIR, "events"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
