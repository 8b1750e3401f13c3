"""Round-4 plan contracts: the new queries must keep the plan shapes
their docstrings claim — shapes that survive a 100x scale-up."""

from __future__ import annotations

from clickstream_pipeline_aws_kafka_docker_airflow__spark import registry
from clickstream_pipeline_aws_kafka_docker_airflow__spark.plans.explain import (
    formatted_plan,
)

from conftest import SF_SMOKE

_Q = registry.queries()


def test_hll_range_distinct_no_expand(spark):
    """The sketch/exact contract must keep the dedup-first two-phase
    shape: mixing COUNT DISTINCT with other aggregates in one agg
    compiles to Expand (per-aggregate row duplication — measured 4x
    slower on kpi_daily_approx)."""
    plan = formatted_plan(_Q["hll_range_distinct"](spark, SF_SMOKE))
    assert "Expand" not in plan, plan


def test_hll_range_distinct_broadcasts_weekly_join(spark):
    """Joining two O(weeks)-row aggregates must broadcast, never
    shuffle both sides."""
    plan = formatted_plan(_Q["hll_range_distinct"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_rfm_single_events_scan(spark):
    """RFM aggregates users in ONE pass over events, and since r9 the
    final plan reads that aggregate through ONE pinned materialization
    (the user-level persist in funnel_q.py) with quartile assignment as
    broadcast-literal comparisons — no second branch, no pivot, no
    window. Correctness no longer depends on the pin (cuts are value
    literals valid against any recomputation of the deterministic
    aggregate); the pin is purely a one-scan cost contract."""
    df = _Q["rfm_segments"](spark, SF_SMOKE)
    plan = formatted_plan(df)
    # user_id IS NOT NULL must reach the scan as a pushed filter
    # (visible pre-materialization; once the cut derivation has cached
    # the user frame the final plan reads InMemoryTableScan instead)
    assert "IsNotNull(user_id)" in plan or "InMemoryTableScan" in plan, plan
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert executed.count("InMemoryTableScan") >= 1, executed
    assert "Window" not in executed, executed


def test_unpivot_no_extra_shuffle(spark):
    """The melt is an Expand over the aggregated daily table: exactly
    the aggregation's own exchange, nothing added by unpivot."""
    plan = formatted_plan(_Q["unpivot_kpi_metrics"](spark, SF_SMOKE))
    assert "Expand" in plan, plan
    base = formatted_plan(_Q["kpi_daily"](spark, SF_SMOKE))
    assert plan.count("Exchange") == base.count("Exchange"), (plan, base)


def test_bigram_partial_aggregation(spark):
    """The pair counts must partial-aggregate map-side (skewed common
    pairs ship one partial per partition, not one row per occurrence)."""
    plan = formatted_plan(_Q["bigram_top"](spark, SF_SMOKE))
    assert "partial_count" in plan or "HashAggregate" in plan, plan
    assert "Join" not in plan, plan


def test_q4_rolls_lineitem_before_join(spark):
    """q4's EXISTS must be decorrelated through the per-order
    MAX(l_shipdate) rollup BEFORE any join (the r8 scaling curve caught
    the naive semi join broadcasting the whole lineitem projection —
    a driver-bound single-threaded build, flat from 4 to 32 cores at
    sf1). The rollup partial-aggregates map-side, so the join input is
    order-cardinality at every scale."""
    plan = formatted_plan(_Q["q4_order_priority"](spark, SF_SMOKE))
    assert "partial_max" in plan, plan
    # the rollup feeds the join: max aggregate appears, and the join
    # condition compares the rolled column, not a raw lineitem column
    assert "max_shipdate" in plan, plan
