"""Lake-maintenance operators: small-file compaction, clustered
(sort-ordered) rewrites, and incremental partition-overwrite rebuilds.

None of these exist in the reference (it writes one JSONL object per
micro-batch per bucket and never revisits them —
``ingest_clickstream_to_s3.py:65-80``), but every real deployment of
this pipeline grows a small-file problem at the raw zone and needs
day-level rebuilds that don't rewrite the whole KPI zone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..session import temp_confs

TARGET_FILE_BYTES = 128 * 1024 * 1024


def compact_partitioned(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    partition_cols: list[str],
    fmt: str = "json",
    target_file_bytes: int = TARGET_FILE_BYTES,
) -> None:
    """Rewrite a partitioned dataset with file counts sized by data
    volume: ~one file per ``target_file_bytes`` per partition instead of
    one file per micro-batch per partition. At the raw zone this is the
    periodic job that keeps scan planning O(partitions), not O(batches).
    """
    import os
    from urllib.parse import urlparse

    df = spark.read.format(fmt).load(src_path)
    total_bytes = 0
    for f in df.inputFiles():
        p = urlparse(f).path or f
        try:
            total_bytes += os.path.getsize(p)
        except OSError:
            pass  # non-local store: fall back to file count heuristic
    if total_bytes == 0:
        total_bytes = len(df.inputFiles()) * target_file_bytes
    n_files = max(1, int(total_bytes // target_file_bytes) + (total_bytes % target_file_bytes > 0))
    (
        df.repartition(n_files, *[F.col(c) for c in partition_cols])
        .write.partitionBy(*partition_cols)
        .mode("overwrite")
        .format(fmt)
        .save(dst_path)
    )


def write_clustered(
    df: DataFrame,
    path: str,
    range_col: str,
    cluster_cols: list[str],
    n_files: int = 8,
) -> None:
    """Range-partition by ``range_col`` then sort files by
    ``cluster_cols``: every output file covers a narrow min/max band of
    the sort keys, so parquet row-group statistics prune aggressively —
    the poor-man's Z-order, exact for one leading dimension and still
    helpful for the rest of the sort key."""
    (
        df.repartitionByRange(n_files, F.col(range_col))
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def overwrite_day_partition(
    spark: SparkSession, kpis: DataFrame, kpi_path: str, partition_col: str = "dt"
) -> None:
    """Dynamic partition overwrite: replace ONLY the partitions present
    in ``kpis``, leaving sibling days' files untouched — the day-level
    rebuild the reference does by re-running one Airflow day-run
    (daily_kpis.py:186-188), without rewriting the zone. The conf is
    scoped to this write — a shared session keeps its prior overwrite
    semantics."""
    with temp_confs(spark, {"spark.sql.sources.partitionOverwriteMode": "dynamic"}):
        (
            kpis.repartition(F.col(partition_col))
            .write.partitionBy(partition_col)
            .mode("overwrite")
            .parquet(kpi_path)
        )


def vacuum_date_partitions(
    spark: SparkSession,
    path: str,
    cutoff_date: str,
    partition_col: str = "date",
    dry_run: bool = True,
) -> list[str]:
    """Retention sweep: list — and with ``dry_run=False`` delete — the
    ``{partition_col}=<day>`` directories strictly OLDER than
    ``cutoff_date`` (ISO dates compare lexicographically, so this is a
    plain string compare on the partition value). The raw zone's
    companion to Kafka's 24h retention (docker-compose.yml:32): without
    it the ingest zone grows forever.

    Defaults to dry-run — the caller sees exactly which partitions a
    real run would remove. Uses the Hadoop FileSystem API, so the same
    code serves file:// in tests and s3a:// in production. Returns the
    affected partition paths, sorted.
    """
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(hconf)
    if not fs.exists(root):
        return []
    doomed = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not name.startswith(f"{partition_col}="):
            continue
        if name.split("=", 1)[1] < cutoff_date:
            doomed.append(str(st.getPath()))
    if not dry_run:
        for p in doomed:
            fs.delete(jvm.org.apache.hadoop.fs.Path(p), True)
    return sorted(doomed)
