"""Plan-shape tests for round-2 queries: the scale contracts —
pushdown, broadcast, shuffle counts, window group limits — that make
these survive 100 TB."""

from __future__ import annotations

from clickstream_pipeline_aws_kafka_docker_airflow__spark import registry
from clickstream_pipeline_aws_kafka_docker_airflow__spark.plans.explain import (
    plan_facts,
)

from conftest import SF_SMOKE

_Q = registry.queries()


def test_q6_pushdown_no_join(spark):
    # pure scan-agg: both range predicates reach parquet; the only
    # exchange is the single-partition partial->final agg merge
    f = plan_facts(_Q["q6_forecast_revenue"](spark, SF_SMOKE))
    assert any("l_shipdate" in p for p in f.pushed_filters), f.pushed_filters
    assert any("l_quantity" in p for p in f.pushed_filters), f.pushed_filters
    assert f.broadcast_joins == 0 and f.sortmerge_joins == 0
    assert f.exchanges == 1
    assert f.python_evals == 0


def test_q9_dims_broadcast(spark):
    # part (LIKE-filtered), supplier, nation must broadcast; the
    # orders⋈lineitem leg is EXACTLY ONE sort-merge join at every
    # scale (r9 merge hint — the planner's estimate otherwise
    # broadcast the raw 1.5M-row orders slice at the 10x surface, a
    # single-threaded driver HashedRelation build; see the q9
    # docstring for the measured A/B)
    f = plan_facts(_Q["q9_product_profit"](spark, SF_SMOKE))
    assert f.broadcast_joins >= 3, f.text
    assert f.sortmerge_joins == 1, f.text
    assert f.python_evals == 0


def test_train_split_is_projection_only(spark):
    # stable-hash split: no exchange at all — the predicate-bearing
    # consumers can push 'split' selection straight to the scan
    f = plan_facts(_Q["train_split"](spark, SF_SMOKE))
    assert f.exchanges == 0, f.text
    assert f.python_evals == 0


def test_contamination_benchmark_broadcasts(spark):
    # the screening JOB: the benchmark shingle set must broadcast so
    # the corpus-side shingle table joins without shuffling for the
    # probe (the registered query serves the job's materialized output)
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.queries.pipeline_q import (
        _contamination_build,
    )

    f = plan_facts(_contamination_build(spark, SF_SMOKE))
    assert f.broadcast_joins >= 1, f.text
    assert f.python_evals == 0
    # the served query is a bare artifact scan — no join, no shuffle
    served = plan_facts(_Q["contamination_check"](spark, SF_SMOKE))
    assert "Join" not in served.text, served.text


def test_quota_sample_window_group_limit(spark):
    # rank<=N pushes a per-partition group limit below the shuffle
    f = plan_facts(_Q["quota_sample"](spark, SF_SMOKE))
    assert "WindowGroupLimit" in f.text


def test_ivf_assignment_no_window_no_crossjoin(spark):
    # literal-centroid ranking is a pure projection: no window node, no
    # cartesian/cross join anywhere in the search plan
    f = plan_facts(_Q["ann_topk_ivf"](spark, SF_SMOKE))
    assert "Cartesian" not in f.text
    # exactly one Window node remains — the final per-query top-k rank
    # (each node name shows twice in formatted explain: tree + detail;
    # WindowGroupLimit is that same rank's pushed-down group limit)
    windows = f.text.replace("WindowGroupLimit", "WGL").count("Window")
    assert windows <= 2, f.text


def test_q2_dims_broadcast_no_cartesian(spark):
    # region suppliers + filtered parts are dim-sized broadcasts; the
    # only shuffle joins key on partkey (cost rollup vs per-part min)
    f = plan_facts(_Q["q2_min_cost_supplier"](spark, SF_SMOKE))
    assert f.broadcast_joins >= 3, f.text
    assert "Cartesian" not in f.text
    assert f.python_evals == 0


def test_q11_total_is_broadcast_over_rollup(spark):
    # the grand total must come from the rollup result (one-row
    # broadcast), never a second scan of the fact table
    f = plan_facts(_Q["q11_important_value"](spark, SF_SMOKE))
    assert f.text.count("FileScan") <= 2, f.text  # lineitem + supplier
    assert f.broadcast_joins >= 2, f.text
    assert f.python_evals == 0


def test_q13_keeps_left_outer(spark):
    # the zero-order customers survive only if the outer join survives
    # optimization (the filter sits in the join condition, not above it)
    f = plan_facts(_Q["q13_order_distribution"](spark, SF_SMOKE))
    assert "LeftOuter" in f.text, f.text
    assert f.python_evals == 0


def test_hourly_anomalies_single_series_window(spark):
    # the unpartitioned window runs over the post-aggregate hourly
    # series; the corpus-sized work is the groupBy underneath (its
    # exchange plus the window's singleton merge)
    f = plan_facts(_Q["hourly_anomalies"](spark, SF_SMOKE))
    assert f.python_evals == 0
    assert f.exchanges <= 3, f.text


def test_pack_sequences_shuffles_ints_not_text(spark):
    # the only exchange key is the shard id, and the shuffled row is
    # (doc_id, shard, n_tokens) — token counting happened map-side, so
    # no 'text' column crosses the exchange
    f = plan_facts(_Q["pack_sequences_greedy"](spark, SF_SMOKE))
    assert "hashpartitioning(shard" in f.text, f.text
    assert "FlatMapGroupsInPandas" in f.text, f.text
    # columns flowing into the pandas stage (= what crossed the
    # exchange): ids and counts only, never the text column
    args = [
        ln for ln in f.text.splitlines()
        if ln.startswith("Arguments:") and "_pack" in ln
    ]
    assert args and all("text#" not in ln for ln in args), args


def test_top_tokens_per_lang_group_limit(spark):
    # the per-language rank must push a WindowGroupLimit below the
    # shuffle (the partitioned complement of window-free top_tokens)
    f = plan_facts(_Q["top_tokens_per_lang"](spark, SF_SMOKE))
    assert "WindowGroupLimit" in f.text
    assert f.python_evals == 0
