"""Sketch accuracy: approx_percentile and HLL distincts stay within
their documented error bounds of the exact operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickstream_pipeline_aws_kafka_docker_airflow__spark.io import load_table

from conftest import SF_CORRECTNESS


def test_approx_percentile_accuracy(spark):
    e = load_table(spark, SF_CORRECTNESS, "events")
    rows = e.groupBy("event_type").agg(
        F.expr("approx_percentile(value, array(0.5, 0.9), 1000)").alias("approx"),
        F.expr("percentile(value, array(0.5, 0.9))").alias("exact"),
    ).collect()
    for r in rows:
        for a, x in zip(r["approx"], r["exact"]):
            assert abs(a - x) / max(abs(x), 1e-9) < 0.05, (r["event_type"], a, x)


def test_hll_distinct_accuracy(spark):
    e = load_table(spark, SF_CORRECTNESS, "events")
    row = e.agg(
        F.approx_count_distinct("user_id").alias("approx"),
        F.countDistinct("user_id").alias("exact"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05
