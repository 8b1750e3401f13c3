"""Plan + correctness tests for the scale operators: bucketed joins
must not shuffle; salted aggregation must match the unsalted answer."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from clickstream_pipeline_aws_kafka_docker_airflow__spark.io import load_table
from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.scale import (
    bucketed_join,
    salted_agg,
    salted_broadcast_join,
    write_bucketed,
)
from clickstream_pipeline_aws_kafka_docker_airflow__spark.plans.explain import plan_facts

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # saveAsTable writes to the (static) default warehouse dir —
    # ./spark-warehouse, gitignored; tables dropped on teardown
    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem")
    write_bucketed(orders, "orders_b", "o_orderkey", 8)
    write_bucketed(lineitem, "lineitem_b", "l_orderkey", 8)
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_no_shuffle(spark, bucketed_tables):
    ot, lt = bucketed_tables
    joined = bucketed_join(
        spark, lt, ot, on=F.col("l_orderkey") == F.col("o_orderkey")
    )
    f = plan_facts(joined)
    assert f.exchanges == 0, f.text  # co-located: zero shuffle exchanges
    # and the values are right
    n = joined.count()
    o = load_table(spark, SF_SMOKE, "orders")
    l = load_table(spark, SF_SMOKE, "lineitem")
    assert n == l.join(o, F.col("l_orderkey") == F.col("o_orderkey")).count()


def test_bucketed_join_on(spark, bucketed_tables):
    # string-key variant goes through the same bucketed path
    ot, _ = bucketed_tables
    df = spark.table(ot)
    assert df.count() > 0


def test_salted_agg_matches_unsalted(spark):
    e = load_table(spark, SF_SMOKE, "events")
    exprs = {
        "n_events": F.count(F.lit(1)),
        "total_value": F.round(F.sum("value"), 2),
    }
    salted = {
        r["event_type"]: (r["n_events"], round(r["total_value"], 2))
        for r in salted_agg(e, "event_type", exprs).collect()
    }
    plain = {
        r["event_type"]: (r["n_events"], round(r["total_value"], 2))
        for r in e.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .collect()
    }
    assert salted == plain


def test_salted_broadcast_join_matches(spark):
    # skewed big side: 10k rows all sharing one key + a long tail
    big = spark.range(10_000).select(
        F.when(F.col("id") < 9_000, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame([Row(k=1, name="hot"), Row(k=9500, name="cold")])
    out = salted_broadcast_join(big, small, "k")
    assert out.count() == 9_001  # 9000 hot + 1 cold
    assert out.where("name = 'cold'").count() == 1


def test_salted_agg_rejects_unknown_recombine(spark):
    """max/min work via prefix or explicit recombine; anything the
    helper can't merge must raise instead of silently SUM-merging."""
    import pytest
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 5.0), ("b", 2.0)], "k string, v double"
    )
    out = {
        r["k"]: (r["max_v"], r["peak"])
        for r in salted_agg(
            df,
            "k",
            {"max_v": F.max("v"), "peak": F.max("v")},
            recombine={"peak": F.max},
        ).collect()
    }
    assert out == {"a": (5.0, 5.0), "b": (2.0, 2.0)}
    with pytest.raises(ValueError, match="no recombine op"):
        salted_agg(df, "k", {"avg_v": F.avg("v")})


def test_key_skew_report_flags_hot_key(spark):
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.scale import (
        key_skew_report,
    )

    rows = [("hot",)] * 80 + [(f"k{i}",) for i in range(20)]
    df = spark.createDataFrame(rows, "k string")
    out = {r["key"]: r for r in key_skew_report(df, "k", top_k=3).collect()}
    assert out["hot"]["rank"] == 1
    assert out["hot"]["cnt"] == 80
    assert out["hot"]["share_permille"] == 800
    assert out["hot"]["skewed"]  # 80 * 21 keys > 2 * 100 rows
    # uniform tail keys are not skew-flagged
    tail = [r for k, r in out.items() if k != "hot"]
    assert tail and all(not r["skewed"] for r in tail)
