"""Cold-cache artifact builds must leave NO transient RDD-storage
blocks behind (r11 inherited-state fix).

``connected_components`` (the cluster_labels builder) truncates its
per-round lineage with ``localCheckpoint``; before the fix those blocks
were reclaimed only when the driver GC happened to notice them, so a
cold artifact root made ``getRDDStorageInfo`` nondeterministic — the
multi-dataset accretion suite flaked on a fresh /tmp (observed: 9
entries where the pinned census says 7). ``materialized`` now wraps the
build+write in ``checkpoint_release_scope``, so build-transient blocks
are released the moment the parquet commit makes them dead.
"""

from __future__ import annotations

import tempfile

from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators import artifacts

from conftest import SF_SMOKE


def _block_ids(spark) -> set[int]:
    return {
        info.id()
        for info in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    }


def test_cold_cluster_labels_build_releases_checkpoints(spark, monkeypatch):
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.queries.pipeline_q import (
        cluster_labels_table,
    )

    monkeypatch.setattr(
        artifacts, "ARTIFACT_ROOT", tempfile.mkdtemp(prefix="cold_artifacts_")
    )
    before = _block_ids(spark)
    # BUILD_WALLS is session-global and never reset — snapshot so the
    # did-the-build-run guard can't be satisfied by an earlier test's
    # build in the default root
    wall_before = artifacts.BUILD_WALLS.get("cluster_labels", 0.0)
    df = cluster_labels_table(spark, SF_SMOKE)  # cold -> runs the CC build
    assert artifacts.BUILD_WALLS.get("cluster_labels", 0.0) > wall_before, (
        "build did not run — the cold-root monkeypatch failed"
    )
    # set-difference, not a raw count compare (r11 advice): the async
    # ContextCleaner may release UNRELATED leftover blocks from earlier
    # tests inside this window — only blocks the build itself created
    # and leaked would show up as NEW ids
    assert _block_ids(spark) - before == set(), (
        "artifact build left transient RDD-storage blocks registered "
        "(localCheckpoint lineage must be released once the parquet "
        "write commits)"
    )
    # the artifact itself is served from disk and intact
    assert df.count() > 0
