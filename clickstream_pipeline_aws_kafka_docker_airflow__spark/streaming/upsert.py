"""foreachBatch upsert sink: per-micro-batch dynamic partition
overwrite — the streaming path into a partitioned serving zone when the
aggregation itself must stay in complete/update mode.

Shape: windowed KPIs stream -> each micro-batch recomputes only the
windows it touched -> overwrite exactly those day partitions. Replays
of a batch rewrite the same partitions with the same content, so the
sink is idempotent (exactly-once effect on top of at-least-once batch
delivery).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..session import temp_confs


def start_partition_upsert(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    partition_col: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
) -> StreamingQuery:
    """Write a streaming aggregate into ``path`` replacing only the
    partitions present in each micro-batch."""

    def _upsert(batch_df: DataFrame, batch_id: int) -> None:
        out = transform(batch_df) if transform else batch_df
        if out.isEmpty():
            return
        spark = out.sparkSession
        with temp_confs(
            spark, {"spark.sql.sources.partitionOverwriteMode": "dynamic"}
        ):
            (
                out.write.partitionBy(partition_col)
                .mode("overwrite")
                .parquet(path)
            )

    return (
        stream_df.writeStream.foreachBatch(_upsert)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
