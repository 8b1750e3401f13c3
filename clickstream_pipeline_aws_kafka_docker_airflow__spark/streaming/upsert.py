"""foreachBatch upsert sink: per-micro-batch dynamic partition
overwrite — the streaming path into a partitioned serving zone when the
aggregation itself must stay in complete/update mode.

Shape: windowed KPIs stream -> each micro-batch recomputes only the
windows it touched -> overwrite exactly those day partitions. Replays
of a batch rewrite the same partitions with the same content, so the
sink is idempotent (exactly-once effect on top of at-least-once batch
delivery).

Two granularities, chosen by ``keys``:

* ``keys=None`` — partition-replace. CORRECT ONLY when one aggregation
  group maps to exactly one partition (partition_col IS the full group
  key, e.g. daily KPIs partitioned by day). Update mode emits only the
  CHANGED groups; if a partition holds several groups, replacing the
  whole partition with one changed group would silently delete its
  siblings — which is why the merge path below exists.
* ``keys=[...]`` — key-level merge. The affected partitions are
  re-read, rows whose group key is being re-emitted are anti-joined
  away, survivors union with the new rows, and the partition is
  rewritten. Safe for partition_col coarser than the group key
  (e.g. hourly windows partitioned by day). Still replay-idempotent:
  a replayed batch re-emits identical rows, the anti-join removes the
  identical previous copies, and the rewrite reproduces byte-identical
  content.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..session import temp_confs
from .release import checkpoint_release_scope


def start_partition_upsert(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    partition_col: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    keys: list[str] | None = None,
) -> StreamingQuery:
    """Write a streaming aggregate into ``path`` replacing only the
    partitions present in each micro-batch (see module docstring for
    the ``keys`` contract)."""

    def _upsert(batch_df: DataFrame, batch_id: int) -> None:
        out = transform(batch_df) if transform else batch_df
        if out.isEmpty():
            return
        spark = out.sparkSession
        # batch-local localCheckpoint blocks die WITH the batch —
        # deterministic storage occupancy instead of wait-for-GC
        # (streaming/release.py)
        with checkpoint_release_scope(spark):
            _upsert_body(spark, out)

    def _upsert_body(spark, out: DataFrame) -> None:
        if keys:
            # key-level merge: keep the affected partitions' rows whose
            # group key is NOT being re-emitted in this batch
            out = out.localCheckpoint(eager=False)
            affected = [
                r[0] for r in out.select(partition_col).distinct().collect()
            ]
            try:
                existing = spark.read.parquet(path).where(
                    F.col(partition_col).isin(affected)
                )
                survivors = existing.join(
                    F.broadcast(out.select(*keys).distinct()),
                    keys,
                    "left_anti",
                )
                # pin BEFORE the overwrite: the plan still reads the
                # files the write is about to replace
                out = survivors.unionByName(out).localCheckpoint()
            except AnalysisException as e:
                # only a missing zone means "first batch"; real read
                # failures must propagate, not silently skip the merge
                if (e.getCondition() or "") != "PATH_NOT_FOUND":
                    raise
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
