"""Completion contract of the materialized-artifact tier: only a
directory carrying Spark's _SUCCESS marker is served as an artifact;
an incomplete/foreign directory at the destination is replaced, not
silently read (operators/artifacts.py)."""

from __future__ import annotations

import os

from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators import artifacts


def test_root_is_private_per_user():
    assert f"u{os.getuid()}" in artifacts.ARTIFACT_ROOT


def test_build_read_roundtrip_and_reuse(spark, tmp_path):
    src = tmp_path / "src.parquet"
    spark.range(5).write.parquet(str(src))
    calls = []

    def build():
        calls.append(1)
        return spark.range(3).selectExpr("id", "id * 2 AS v")

    out1 = artifacts.materialized(spark, str(src), "t_roundtrip", build)
    out2 = artifacts.materialized(spark, str(src), "t_roundtrip", build)
    assert len(calls) == 1  # second call reads, does not rebuild
    assert sorted(r["v"] for r in out2.collect()) == [0, 2, 4]
    assert sorted(out1.columns) == sorted(out2.columns)


def test_incomplete_destination_is_replaced_not_served(spark, tmp_path):
    src = tmp_path / "src2.parquet"
    spark.range(5).write.parquet(str(src))
    key = artifacts.artifact_key(str(src), "t_foreign")
    path = os.path.join(artifacts.ARTIFACT_ROOT, key)
    # plant a foreign dir WITHOUT _SUCCESS at the destination
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "junk.txt"), "w") as f:
        f.write("not an artifact")

    out = artifacts.materialized(
        spark, str(src), "t_foreign",
        lambda: spark.range(4).selectExpr("id AS v"),
    )
    assert sorted(r["v"] for r in out.collect()) == [0, 1, 2, 3]
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    assert not os.path.exists(os.path.join(path, "junk.txt"))
