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


def test_cms_daily_merge_equals_direct_build(spark):
    """CMS linearity, the property the daily zone relies on: summing
    the per-day sketches cell-wise equals building one sketch over the
    whole range."""
    from pyspark.sql import functions as F

    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.dedup import (
        token_hash32_sql,
    )
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.queries.sketch_q import (
        CMSZ_D,
        CMSZ_W,
    )

    rows = [
        ("2024-01-01", "a"), ("2024-01-01", "a"), ("2024-01-01", "b"),
        ("2024-01-02", "a"), ("2024-01-02", "c"), ("2024-01-03", "b"),
    ]
    ev = spark.createDataFrame(rows, "dt string, key string")

    def cells(df, with_day):
        keys = ["dt", "s", "b"] if with_day else ["s", "b"]
        r = df.select(
            "dt",
            F.explode(F.sequence(F.lit(0), F.lit(CMSZ_D - 1))).alias("s"),
            "key",
        ).withColumn(
            "b",
            F.expr(token_hash32_sql("CONCAT(CAST(s AS STRING), '|', key)"))
            % CMSZ_W,
        )
        return r.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))

    daily_merged = (
        cells(ev, True).groupBy("s", "b").agg(F.sum("cnt").alias("cnt"))
    )
    direct = cells(ev, False)
    a = {(r["s"], r["b"]): r["cnt"] for r in daily_merged.collect()}
    b = {(r["s"], r["b"]): r["cnt"] for r in direct.collect()}
    assert a == b
