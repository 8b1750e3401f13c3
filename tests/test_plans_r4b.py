"""Plan contracts for the round-4 continuation queries (lifecycle,
PII, incremental dedup, PageRank): the shapes that survive a 100x
scale-up must be pinned, not assumed."""

from __future__ import annotations

import re

from clickstream_pipeline_aws_kafka_docker_airflow__spark import registry
from clickstream_pipeline_aws_kafka_docker_airflow__spark.plans.explain import (
    formatted_plan,
)

from conftest import SF_SMOKE

_Q = registry.queries()


def test_snapshot_diff_is_one_scan_no_shuffle(spark):
    """r12: both snapshots derive from ONE keyed source, so the diff is
    per-row classification — the plan must be a single events scan with
    NO Exchange and NO join (the r11 shape was a full-outer join over
    two scans of the same parquet; at 100 TB that is a fact-fact
    sort-merge join where a map-only pass suffices)."""
    plan = formatted_plan(_Q["snapshot_diff"](spark, SF_SMOKE))
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan
    # detail-block headers only (the tree section repeats each scan)
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1, plan


def test_user_erasure_broadcasts_deletion_list(spark):
    """The deletion list joins broadcast — the events scan must never
    shuffle for the flagging join."""
    plan = formatted_plan(_Q["user_erasure_report"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_pii_scrub_single_scan_no_join(spark):
    """Detection + redaction are pure column exprs over ONE documents
    scan: no join, and the ONLY permitted exchange is widen()'s
    round-robin repartition of the raw scan (r8: single-row-group
    layouts scan as one task; no-op at production split counts) —
    never a hash/range shuffle."""
    plan = formatted_plan(_Q["pii_scrub"](spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan
    assert "Join" not in plan, plan
    exchanges = re.findall(r"\(\d+\) Exchange", plan)
    assert len(exchanges) <= 1, plan
    if exchanges:
        assert "RoundRobinPartitioning" in plan, plan
        assert "hashpartitioning" not in plan, plan


def test_incremental_admission_reads_band_index_not_corpus_sigs(spark):
    """The admission probe joins the new batch's bands against the
    PERSISTED old-zone band artifact — the plan must read the artifact
    parquet, not re-derive old-zone signatures from documents."""
    plan = formatted_plan(_Q["incremental_dedup_batch"](spark, SF_SMOKE))
    assert "minhash_bands_old" in plan or "spark_graft_artifacts" in plan, plan


def test_pagerank_no_cartesian_beyond_count(spark):
    """The only product in the plan is the 1-row n_nodes broadcast; the
    score/edge joins stay keyed. (Pins the BUILD plan — the registered
    query serves the materialized snapshot artifact, whose plan is a
    parquet scan.)"""
    from pyspark.sql import Window, functions as F

    from clickstream_pipeline_aws_kafka_docker_airflow__spark.functions.scalars import (
        props_int,
    )
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.io import load_table
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.graph import (
        pagerank_int,
    )

    e = load_table(spark, SF_SMOKE, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    k = props_int("props", "k")
    edges = (
        e.select(k.alias("src"), F.lead(k).over(w).alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = formatted_plan(pagerank_int(edges))
    assert "CartesianProduct" not in plan, plan
    # one keyed join per iteration (3) on the contrib side
    assert len(re.findall(r"BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin", plan)) >= 3, plan


def test_scd2_dim_broadcasts(spark):
    """The SCD dimension is small vs the fact table — the temporal
    join must broadcast it with the equi-key carried by the join and
    the validity interval as a residual condition, never a
    range-only/nested-loop join."""
    plan = formatted_plan(_Q["scd2_tier_join"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan
