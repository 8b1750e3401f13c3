"""Streaming maintenance of the daily count-min zone — the incremental
half of ``queries/sketch_q.py::cms_range_topk``.

Exactly-once for an ADDITIVE sketch needs a different mechanism than
the HLL zone (sketch_zone.py): HLL union is register-wise max, so
replaying a batch that overwrites a day's cumulative sketch is
idempotent for free. CMS cells are SUMS — replaying an additive merge
would double-count. So this zone stores **batch-keyed delta layers**
(the micro-batch's cell deltas, partitioned by ``batch_id``): a
replayed micro-batch dynamically overwrites ITS OWN layer with
identical content, and serving sums across layers — at-least-once
delivery becomes exactly-once arithmetic. (Druid-style segments /
delta-layer ingestion, expressed in parquet partitions.)

Layers accumulate one per micro-batch; ``compact_cms_zone`` folds them
into a single layer (CMS linearity — same reason the day->range merge
works) so serving cost stays O(days * D * W) regardless of how many
micro-batches ever ran.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import token_hash32_sql
from ..queries.sketch_q import CMSZ_D, CMSZ_W
from ..session import temp_confs

COMPACTED_LAYER = -1


def _cells(events: DataFrame, ts_col: str, key_col: str) -> DataFrame:
    """(dt, s, b, cnt) cell deltas for one slice of events — the same
    seeded portable hash as the batch query, so zone-served estimates
    equal in-query ones."""
    counts = events.select(
        F.to_date(ts_col).cast("string").alias("dt"),
        F.col(key_col).cast("string").alias("key"),
    ).groupBy("dt", "key").agg(F.count(F.lit(1)).alias("n"))
    return (
        counts.select(
            "dt",
            F.explode(F.sequence(F.lit(0), F.lit(CMSZ_D - 1))).alias("s"),
            "key",
            "n",
        )
        .withColumn(
            "b",
            F.expr(token_hash32_sql("CONCAT(CAST(s AS STRING), '|', key)"))
            % CMSZ_W,
        )
        .groupBy("dt", "s", "b")
        .agg(F.sum("n").alias("cnt"))
    )


def start_cms_zone(
    stream_events: DataFrame,
    zone_dir: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> StreamingQuery:
    """Fold the stream into batch-keyed CMS delta layers. Stateless —
    no watermark, no streaming aggregation state: each micro-batch's
    deltas are final, and late events simply land in a later layer
    (cells add, so lateness never needs retraction)."""

    def _layer(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        cells = _cells(batch_df, ts_col, key_col)
        with temp_confs(
            batch_df.sparkSession,
            {"spark.sql.sources.partitionOverwriteMode": "dynamic"},
        ):
            (
                cells.withColumn("batch_id", F.lit(batch_id))
                .repartition(1)
                .write.partitionBy("batch_id")
                .mode("overwrite")
                .parquet(zone_dir)
            )

    return (
        stream_events.writeStream.foreachBatch(_layer)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def compact_cms_zone(spark: SparkSession, zone_dir: str) -> int:
    """Fold every delta layer into the single ``batch_id=-1`` layer
    (cell-wise sum — CMS linearity) and delete the folded layers.
    Returns the number of layers folded. Safe to run between streaming
    runs; estimates are identical before and after."""
    zone = spark.read.parquet(zone_dir)
    layers = [r["batch_id"] for r in zone.select("batch_id").distinct().collect()]
    to_fold = [b for b in layers if b != COMPACTED_LAYER]
    if not to_fold:
        return 0
    merged = (
        zone.groupBy("dt", "s", "b")
        .agg(F.sum("cnt").alias("cnt"))
        .localCheckpoint()  # materialize before touching source files
    )
    with temp_confs(
        spark, {"spark.sql.sources.partitionOverwriteMode": "dynamic"}
    ):
        (
            merged.withColumn("batch_id", F.lit(COMPACTED_LAYER))
            .repartition(1)
            .write.partitionBy("batch_id")
            .mode("overwrite")
            .parquet(zone_dir)
        )
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for b in to_fold:
        p = jvm.org.apache.hadoop.fs.Path(f"{zone_dir}/batch_id={b}")
        p.getFileSystem(hconf).delete(p, True)
    return len(to_fold)


def estimates_from_zone(
    spark: SparkSession, zone_dir: str, keys: list[str], start_dt: str, end_dt: str
) -> DataFrame:
    """Point-query the zone: CMS estimates for the given keys over
    [start_dt, end_dt], summing cells across days AND layers, then
    min over the D rows. O(days * layers * D * W) cells scanned, no
    raw-event access."""
    zone = spark.read.parquet(zone_dir)
    merged = (
        zone.where((F.col("dt") >= start_dt) & (F.col("dt") <= end_dt))
        .groupBy("s", "b")
        .agg(F.sum("cnt").alias("cnt"))
    )
    kdf = spark.createDataFrame([(k,) for k in keys], "key string")
    probes = kdf.select(
        "key", F.explode(F.sequence(F.lit(0), F.lit(CMSZ_D - 1))).alias("s")
    ).withColumn(
        "b",
        F.expr(token_hash32_sql("CONCAT(CAST(s AS STRING), '|', key)")) % CMSZ_W,
    )
    return (
        probes.join(merged, ["s", "b"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("bigint").alias("est"))
    )
