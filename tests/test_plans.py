"""Physical-plan property tests: the scale contract of each operator.

These pin the plan shapes the operators are designed around — predicate
pushdown reaching parquet, column pruning, dims broadcasting instead of
shuffling the fact side, and no row-wise Python eval anywhere outside
the explicitly-Pandas multimodal path.
"""

from __future__ import annotations

from clickstream_pipeline_aws_kafka_docker_airflow__spark import registry
from clickstream_pipeline_aws_kafka_docker_airflow__spark.plans.explain import (
    plan_facts,
    scan_columns,
)

from conftest import SF_SMOKE

_Q = registry.queries()


def test_q1_pruning_and_pushdown(spark):
    f = plan_facts(_Q["q1_pricing_summary"](spark, SF_SMOKE))
    cols = scan_columns(f, "l_")
    assert cols is not None and len(cols) == 7, cols  # 7 of 10 lineitem cols
    assert any("l_shipdate" in p for p in f.pushed_filters)
    assert f.exchanges == 1  # single agg shuffle
    assert f.python_evals == 0


def test_q5_dims_broadcast(spark):
    f = plan_facts(_Q["q5_local_supplier_volume"](spark, SF_SMOKE))
    assert f.broadcast_joins == 5  # every join is broadcast at this size
    assert f.sortmerge_joins == 0
    assert f.exchanges == 1  # only the final groupBy shuffles
    assert any("r_name" in p for p in f.pushed_filters)
    assert f.python_evals == 0


def test_kpi_daily_column_pruning(spark):
    f = plan_facts(_Q["kpi_daily"](spark, SF_SMOKE))
    # KPI touches 4 of 6 event columns; partial agg before the shuffle
    cols = f.read_schemas[0]
    for c in ("ts", "user_id", "event_type", "value"):
        assert c in cols
    assert "props" not in cols and "event_id" not in cols
    assert f.python_evals == 0


def test_sessionize_single_shuffle(spark):
    f = plan_facts(_Q["sessionize_30min"](spark, SF_SMOKE))
    # lag + cumsum + groupBy all share the user_id hash partitioning:
    # exactly one shuffle exchange
    assert f.exchanges == 1, f.text
    assert f.python_evals == 0


ARROW_BY_DESIGN = {"multimodal_meta", "sim_topk_vectorized"}


def test_no_python_eval_outside_arrow_paths(spark):
    for name, fn in _Q.items():
        if name in ARROW_BY_DESIGN:
            continue
        assert plan_facts(fn(spark, SF_SMOKE)).python_evals == 0, name


def test_topn_window_group_limit(spark):
    # rank<=k filters push a per-partition group limit below the shuffle
    f = plan_facts(_Q["topn_parts_per_brand"](spark, SF_SMOKE))
    assert "WindowGroupLimit" in f.text


def test_top_tokens_take_ordered_not_global_window(spark):
    """top_tokens must rank via per-partition top-K merge
    (TakeOrderedAndProject), never a global-sort window over the whole
    vocabulary; the residual ranking window sees only K rows and has an
    explicit partition spec."""
    df = _Q["top_tokens"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    assert "Window" not in plan, plan  # rank via K x K join, no window
