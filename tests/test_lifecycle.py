"""Data-lifecycle operators: snapshot diff, erasure report, and the
partition-pruned right-to-be-forgotten job."""

from __future__ import annotations

import glob
import os

from pyspark.sql import Row, functions as F

from clickstream_pipeline_aws_kafka_docker_airflow__spark.jobs import run_user_erasure
from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.lifecycle import (
    erasure_report,
    snapshot_diff,
    snapshot_diff_derived,
)


def test_snapshot_diff_classifies_all_three(spark):
    a = spark.createDataFrame(
        [Row(k=1, v="x", w=None), Row(k=2, v="y", w="p"), Row(k=3, v="z", w="q")]
    )
    b = spark.createDataFrame(
        [Row(k=1, v="x", w=None), Row(k=2, v="Y", w="p"), Row(k=4, v="n", w="r")]
    )
    out = {r["k"]: r["change_type"] for r in snapshot_diff(a, b, "k").collect()}
    assert out == {2: "changed", 3: "removed", 4: "added"}  # k=1 unchanged, dropped


def test_snapshot_diff_null_vs_empty_string_differ(spark):
    """The digest's null channel: NULL and '' must not collide."""
    a = spark.createDataFrame([(1, None)], "k bigint, v string")
    b = spark.createDataFrame([(1, "")], "k bigint, v string")
    out = snapshot_diff(a, b, "k").collect()
    assert [(r["k"], r["change_type"]) for r in out] == [(1, "changed")]


def test_snapshot_diff_derived_matches_join(spark):
    """r12 one-scan path ≡ the join path on a hostile derived pair:
    NULL membership predicates (NULL keeps the row out, like a filter),
    NULL→value / value→NULL / 0→0 rewrites, and rows in neither
    snapshot. Key is unique — the operator's documented precondition."""
    src = spark.createDataFrame(
        [
            # (k, keep_a, keep_b raw flag, v)
            (1, True, True, 2.0),    # changed: v -> 2v differs
            (2, True, True, 0.0),    # unchanged: 0 -> 0
            (3, True, True, None),   # unchanged: NULL -> NULL
            (4, True, False, 5.0),   # removed
            (5, False, True, 7.0),   # added
            (6, None, False, 1.0),   # in neither (NULL in_a = filtered)
            (7, True, None, 3.0),    # removed (NULL in_b = filtered)
        ],
        "k bigint, fa boolean, fb boolean, v double",
    )
    in_a, in_b = F.col("fa"), F.col("fb")
    b_v = F.when(F.col("k") == 1, F.col("v") * 2).otherwise(F.col("v"))
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff_derived(
            src, "k", in_a, in_b, {"v": b_v}
        ).collect()
    }
    a = src.where(in_a).select("k", "v")
    b = src.where(in_b).select("k", b_v.alias("v"))
    want = {
        r["k"]: r["change_type"] for r in snapshot_diff(a, b, "k").collect()
    }
    assert got == want == {1: "changed", 4: "removed", 5: "added", 7: "removed"}


def test_snapshot_diff_query_matches_r11_join_formulation(spark):
    """The r12 one-scan query must return exactly what the r11
    join-of-derived-frames formulation returned on real data."""
    from conftest import SF_SMOKE

    from clickstream_pipeline_aws_kafka_docker_airflow__spark import registry
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.io import load_table
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.queries.lifecycle_q import (
        _snapshots,
    )

    a, b = _snapshots(load_table(spark, SF_SMOKE, "events"))
    want = sorted(
        (r["event_id"], r["change_type"])
        for r in snapshot_diff(a, b, "event_id").collect()
    )
    got = sorted(
        (r["event_id"], r["change_type"])
        for r in registry.queries()["snapshot_diff"](spark, SF_SMOKE).collect()
    )
    assert got == want and len(got) > 0


def test_snapshot_diff_derived_no_overrides(spark):
    """With no column rewrites 'changed' is impossible — only
    membership classification remains."""
    src = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "k bigint, v string"
    )
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff_derived(
            src, "k", F.col("k") <= 2, F.col("k") >= 2
        ).collect()
    }
    assert got == {1: "removed", 3: "added"}


def test_erasure_report_counts_and_null_user(spark):
    events = spark.createDataFrame(
        [
            Row(ts="2024-01-01 10:00:00", user_id=1),
            Row(ts="2024-01-01 11:00:00", user_id=1),
            Row(ts="2024-01-01 12:00:00", user_id=2),
            Row(ts="2024-01-02 10:00:00", user_id=None),  # never erased
            Row(ts="2024-01-02 11:00:00", user_id=3),
        ]
    ).withColumn("ts", F.to_timestamp("ts"))
    dels = spark.createDataFrame([Row(user_id=1), Row(user_id=9)])
    out = {str(r["dt"]): r for r in erasure_report(events, dels).collect()}
    assert out["2024-01-01"]["rows_erased"] == 2
    assert out["2024-01-01"]["rows_retained"] == 1
    assert out["2024-01-01"]["users_erased"] == 1  # user 9 has no rows
    assert out["2024-01-02"]["rows_erased"] == 0
    assert out["2024-01-02"]["rows_retained"] == 2


def _zone_rows():
    rows = []
    for d, users in [
        ("2024-01-01", [1, 2, 5]),   # 5 doomed -> rewrite
        ("2024-01-02", [99]),        # all rows doomed -> clear
        ("2024-01-03", [3, 4]),      # untouched
    ]:
        rows += [Row(date=d, user_id=u, payload=f"{d}:{u}") for u in users]
    return rows


def test_run_user_erasure_rewrites_only_affected_partitions(spark, tmp_path):
    zone = str(tmp_path / "zone")
    spark.createDataFrame(_zone_rows()).write.partitionBy("date").parquet(zone)
    untouched_before = sorted(glob.glob(f"{zone}/date=2024-01-03/part-*"))

    res = run_user_erasure(
        spark, zone, [5, 99, 777], partition_cols=("date",)
    )
    assert res == {
        "rows_erased": 2,
        "partitions_rewritten": 1,
        "partitions_cleared": 1,
    }
    # the fully-doomed partition directory is gone
    assert not os.path.exists(f"{zone}/date=2024-01-02")
    # the untouched partition kept its exact files
    assert sorted(glob.glob(f"{zone}/date=2024-01-03/part-*")) == untouched_before
    # the zone re-reads clean: no listed user anywhere, survivors intact
    left = spark.read.parquet(zone)
    assert left.where(F.col("user_id").isin(5, 99, 777)).count() == 0
    assert {(str(r["date"]), r["user_id"]) for r in left.collect()} == {
        ("2024-01-01", 1),
        ("2024-01-01", 2),
        ("2024-01-03", 3),
        ("2024-01-03", 4),
    }


def test_run_user_erasure_no_match_is_noop(spark, tmp_path):
    zone = str(tmp_path / "zone")
    spark.createDataFrame(_zone_rows()).write.partitionBy("date").parquet(zone)
    files_before = sorted(glob.glob(f"{zone}/date=*/part-*"))
    res = run_user_erasure(spark, zone, [777], partition_cols=("date",))
    assert res == {
        "rows_erased": 0,
        "partitions_rewritten": 0,
        "partitions_cleared": 0,
    }
    assert sorted(glob.glob(f"{zone}/date=*/part-*")) == files_before


def test_run_user_erasure_crash_between_overwrite_and_clear(spark, tmp_path):
    """Crash window: survivors overwritten and committed, the
    fully-erased partition dirs NOT yet deleted. No survivor row may be
    lost, and a re-run must converge to the same final state a
    crash-free run produces (r5 verdict item 4)."""
    from clickstream_pipeline_aws_kafka_docker_airflow__spark import jobs

    zone = str(tmp_path / "zone")
    spark.createDataFrame(_zone_rows()).write.partitionBy("date").parquet(zone)
    untouched_before = sorted(glob.glob(f"{zone}/date=2024-01-03/part-*"))

    real_delete = jobs._delete_partition_dirs

    def _crash(*a, **k):
        raise RuntimeError("injected crash before partition clear")

    jobs._delete_partition_dirs = _crash
    try:
        import pytest

        with pytest.raises(RuntimeError, match="injected crash"):
            run_user_erasure(spark, zone, [5, 99, 777], partition_cols=("date",))
    finally:
        jobs._delete_partition_dirs = real_delete

    # commit point passed: survivors rewritten, doomed-dir still present
    assert os.path.exists(f"{zone}/date=2024-01-02")
    mid = spark.read.parquet(zone)
    # no survivor lost, no survivor duplicated
    assert {(str(r["date"]), r["user_id"]) for r in mid.where(
        ~F.col("user_id").isin(5, 99, 777)
    ).collect()} == {
        ("2024-01-01", 1), ("2024-01-01", 2),
        ("2024-01-03", 3), ("2024-01-03", 4),
    }
    assert mid.count() == 5  # the stale all-doomed partition still reads

    # re-run converges: finds user 99 again, clears its partition
    res = run_user_erasure(spark, zone, [5, 99, 777], partition_cols=("date",))
    assert res == {
        "rows_erased": 1,  # only 99's row remained
        "partitions_rewritten": 0,
        "partitions_cleared": 1,
    }
    assert not os.path.exists(f"{zone}/date=2024-01-02")
    final = spark.read.parquet(zone)
    assert final.where(F.col("user_id").isin(5, 99, 777)).count() == 0
    assert final.count() == 4
    # untouched partition never rewritten through both runs
    assert sorted(glob.glob(f"{zone}/date=2024-01-03/part-*")) == untouched_before
