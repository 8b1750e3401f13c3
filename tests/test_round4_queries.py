"""Round-4 query properties beyond oracle parity: HLL merge exactness,
RFM quartile balance, bigram plan shape, unpivot fan-out."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickstream_pipeline_aws_kafka_docker_airflow__spark.io import load_table
from clickstream_pipeline_aws_kafka_docker_airflow__spark.queries.sketch_q import (
    HLL_LG_CONFIG_K,
)

from conftest import SF_CORRECTNESS, SF_SMOKE


def test_hll_daily_merge_equals_direct_sketch(spark):
    """The scale claim behind the sketch zone: union-of-daily-sketches
    must give the SAME registers as one sketch over the raw range (same
    hash, register-wise max, duplicate-insensitive) — so the two
    estimates are equal exactly, not merely within the error band."""
    e = load_table(spark, SF_CORRECTNESS, "events").select(
        F.to_date("ts").alias("dt"), "user_id"
    )
    wk = F.date_trunc("week", F.col("dt")).cast("date").alias("wk")
    merged = (
        e.groupBy("dt")
        .agg(F.hll_sketch_agg("user_id", F.lit(HLL_LG_CONFIG_K)).alias("sk"))
        .groupBy(wk)
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_merged")
        )
    )
    direct = e.select(wk, "user_id").groupBy("wk").agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("user_id", F.lit(HLL_LG_CONFIG_K))
        ).alias("est_direct")
    )
    rows = merged.join(direct, "wk").collect()
    assert rows, "no weeks"
    for r in rows:
        assert r.est_merged == r.est_direct, r


def test_rfm_quartiles_balanced(spark):
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.queries.funnel_q import (
        rfm_segments,
    )

    df = rfm_segments(spark, SF_CORRECTNESS).toPandas()
    n = len(df)
    assert n > 0
    for col in ("r_q", "f_q", "m_q"):
        sizes = df[col].value_counts()
        assert sorted(sizes.index) == [1, 2, 3, 4]
        # ntile spreads rows as evenly as possible: max-min <= 1
        assert sizes.max() - sizes.min() <= 1, (col, dict(sizes))
    assert df["rfm_segment"].between(111, 444).all()
    # one row per user, fully deterministic
    assert df["user_id"].is_unique


def test_bigram_top_is_joinless_map_fanout(spark):
    """The bigram profile must come from a transform over the token
    array — any self-join or cartesian in the plan means the operator
    would not survive a 100x corpus."""
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.queries.text_q import (
        bigram_top,
    )

    df = bigram_top(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    rows = df.collect()
    assert rows
    counts = [r.n_pairs for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_unpivot_is_5x_daily(spark):
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.queries.kpis_q import (
        kpi_daily,
        unpivot_kpi_metrics,
    )

    n_days = kpi_daily(spark, SF_SMOKE).count()
    long = unpivot_kpi_metrics(spark, SF_SMOKE)
    assert long.count() == 5 * n_days
    assert long.columns == ["dt", "metric", "value"]


def test_mad_outliers_known_small_groups(spark, monkeypatch, tmp_path):
    """Median/MAD order-statistics math on hand-checkable groups: an
    odd group (median = middle), an even group (median = mean of the
    two middles, carried exactly as x2), and an obvious outlier."""
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.queries.misc_q import (
        mad_outliers,
    )

    rows = (
        # odd group: values 1,2,3,4,100 -> med 3, deviations 2,1,0,1,97
        # -> MAD 1 -> only 100 breaks |v-med| > 3*MAD
        [("odd", float(v)) for v in (1, 2, 3, 4, 100)]
        # even group: 1,2,3,4 -> med 2.5 (x2=500 cents), devs 1.5,.5,.5,1.5
        # -> MAD 1.0 -> no outliers
        + [("even", float(v)) for v in (1, 2, 3, 4)]
    )
    df = spark.createDataFrame(rows, "event_type string, value double")
    path = str(tmp_path / "events.parquet")
    df.write.parquet(path)

    import clickstream_pipeline_aws_kafka_docker_airflow__spark.queries.misc_q as m

    monkeypatch.setattr(
        m, "load_table", lambda spark, sf_dir, name: spark.read.parquet(path)
    )
    out = {r["event_type"]: r for r in mad_outliers(spark, "ignored").collect()}
    assert out["odd"]["median_cents_x2"] == 2 * 300
    assert out["odd"]["mad_cents_x4"] == 4 * 100
    assert out["odd"]["n_outliers"] == 1
    assert out["even"]["median_cents_x2"] == 500  # 2 x 2.50
    assert out["even"]["mad_cents_x4"] == 400  # 4 x 1.00
    assert out["even"]["n_outliers"] == 0


def test_first_touch_attribution_conserves_revenue(spark):
    """Attribution is a partition of the purchase set: bucket counts
    must sum to the total purchase count and attributed value to total
    purchase revenue (every user has a first event, so the join drops
    nothing). Also pins the scale contract: the per-user first-touch
    side is NOT broadcast-hinted."""
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.queries.funnel_q import (
        first_touch_attribution,
    )

    df = first_touch_attribution(spark, SF_CORRECTNESS)
    assert "ResolvedHint" not in df._jdf.queryExecution().analyzed().toString()
    pdf = df.toPandas()
    e = load_table(spark, SF_CORRECTNESS, "events").where(
        F.col("event_type") == "purchase"
    )
    tot = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(24,8)")), 2)
        .cast("double")
        .alias("rev"),
    ).collect()[0]
    assert int(pdf["n_purchases"].sum()) == tot["n"]
    assert abs(float(pdf["attributed_value"].sum()) - tot["rev"]) < 0.02
