"""Stream-stream attribution join: in-window match, out-of-window miss,
and left-outer emission of never-converted clicks after watermark."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from clickstream_pipeline_aws_kafka_docker_airflow__spark.streaming.joins import (
    attribution_join,
)

T0 = dt.datetime(2025, 9, 1, 0, 0)


def _mk_stream(spark, tmp_path, name, batches):
    """One parquet file per batch + maxFilesPerTrigger=1 so the
    watermark advances BETWEEN batches (outer-join rows only emit on a
    later batch than the one that buffered them)."""
    src = tmp_path / name
    src.mkdir()
    schema = None
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows)
        schema = df.schema
        df.coalesce(1).write.mode("append").parquet(str(src))
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )


def _run(out, name):
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return out.sparkSession.sql(f"SELECT * FROM {name}").collect()


def test_attribution_inner_window(spark, tmp_path):
    clicks = _mk_stream(
        spark, tmp_path, "clicks",
        [[
            Row(ts=T0, user_id="u1"),
            Row(ts=T0, user_id="u2"),
        ]],
    )
    purchases = _mk_stream(
        spark, tmp_path, "purch",
        [[
            Row(ts=T0 + dt.timedelta(minutes=10), user_id="u1", value=9.5),
            # u2's purchase is 2h after the click: outside the 30min gap
            Row(ts=T0 + dt.timedelta(hours=2), user_id="u2", value=4.0),
        ]],
    )
    rows = _run(attribution_join(clicks, purchases), "attr_inner")
    assert [(r["user_id"], r["purchase_value"]) for r in rows] == [("u1", 9.5)]


def test_attribution_left_outer_emits_unconverted(spark, tmp_path):
    clicks = _mk_stream(
        spark, tmp_path, "clicks2",
        [
            [Row(ts=T0, user_id="u1"), Row(ts=T0, user_id="u3")],
            # a much later click advances the click-side watermark far
            # past u3's join horizon so its unmatched row can emit
            [Row(ts=T0 + dt.timedelta(hours=6), user_id="u9")],
        ],
    )
    purchases = _mk_stream(
        spark, tmp_path, "purch2",
        [
            [Row(ts=T0 + dt.timedelta(minutes=5), user_id="u1", value=7.0)],
            [Row(ts=T0 + dt.timedelta(hours=6), user_id="zz", value=1.0)],
        ],
    )
    rows = _run(
        attribution_join(clicks, purchases, how="left_outer"), "attr_outer"
    )
    got = {(r["user_id"], r["purchase_value"]) for r in rows}
    assert ("u1", 7.0) in got          # matched inside the window
    assert ("u3", None) in got         # never converted -> null purchase


def test_stream_static_enrich_broadcasts_and_joins(spark, tmp_path):
    from pyspark.sql import Row

    from clickstream_pipeline_aws_kafka_docker_airflow__spark.streaming.joins import (
        enrich_with_dimension,
    )

    events = spark.createDataFrame(
        [Row(sku="sku_1", qty=2), Row(sku="sku_2", qty=1), Row(sku="sku_9", qty=5)]
    )
    src = tmp_path / "src"
    events.coalesce(1).write.parquet(str(src))
    dim = spark.createDataFrame(
        [Row(sku="sku_1", category="toys"), Row(sku="sku_2", category="books")]
    )

    stream = spark.readStream.schema(events.schema).parquet(str(src))
    q = (
        enrich_with_dimension(stream, dim, "sku")
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    assert q.awaitTermination(120)
    rows = {r.sku: r.category for r in spark.sql("SELECT * FROM enriched").collect()}
    # left join: matched rows enriched, unmatched kept with null
    assert rows == {"sku_1": "toys", "sku_2": "books", "sku_9": None}
    # stateless: no state-store rows were needed for the join
    prog = q.lastProgress
    assert not prog or all(
        (op.get("numRowsTotal") or 0) == 0 for op in prog.get("stateOperators", [])
    )
