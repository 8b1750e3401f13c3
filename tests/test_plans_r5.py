"""Round-5 plan contracts: pin the fixed-cost cuts in the ANN serving
tiers (operators/pq.py, operators/similarity.py) so they cannot
silently regress.

Serving a prebuilt index must not repartition the corpus (widen() is
build-path-only now) and must not fold norms over the whole corpus —
the exact-rescore norm runs on post-join survivors only."""

from __future__ import annotations

from clickstream_pipeline_aws_kafka_docker_airflow__spark import registry
from clickstream_pipeline_aws_kafka_docker_airflow__spark.plans.explain import (
    plan_facts,
)

from conftest import SF_SMOKE

_Q = registry.queries()

_SERVING = [
    "ann_topk_lsh",
    "ann_topk_ivf",
    "ann_topk_pq",
    "ann_topk_ivfpq",
    "ann_topk_ivfpq_res",
]


def test_ann_serving_never_roundrobins_the_corpus(spark):
    """widen()'s round-robin repartition belongs to build passes (band
    signatures, code encoding, quantizer training). A serving query
    probes prebuilt artifacts through broadcast joins; a
    RoundRobinPartitioning exchange there is a full-corpus shuffle
    bought for nothing."""
    for name in _SERVING:
        f = plan_facts(_Q[name](spark, SF_SMOKE))
        assert "RoundRobinPartitioning" not in f.text, (name, f.text)


def test_ann_serving_keeps_query_state_broadcast(spark):
    """Probe lists, LUTs, candidate ids and query vectors are
    query-sized: they must ride broadcast exchanges, never a
    sort-merge join of the corpus against itself."""
    for name in _SERVING:
        f = plan_facts(_Q[name](spark, SF_SMOKE))
        assert f.broadcast_joins >= 1, (name, f.text)
        assert f.sortmerge_joins == 0, (name, f.text)


def test_repetition_score_is_shuffle_free(spark):
    """A per-document metric must not shuffle the corpus: the max gram
    multiplicity comes from a sorted-array run-length fold inside one
    projection — scan + project (the earlier two-groupBy spelling
    shuffled every gram string twice). The ONE permitted exchange is
    widen()'s round-robin repartition of the raw scan (r8: a
    one-row-group layout scans as a single task at any core count;
    no-op at production split counts) — never a hash/range shuffle of
    gram strings."""
    f = plan_facts(_Q["repetition_score"](spark, SF_SMOKE))
    assert f.exchanges <= 1, f.text
    if f.exchanges == 1:
        assert "roundrobin" in f.text.lower(), f.text
        assert "hashpartitioning" not in f.text.lower(), f.text
    assert f.python_evals == 0


def test_query_vector_slice_collected_once_per_plan(spark):
    """collect_query_vectors memoizes per (application, plan, n): two
    calls against the same corpus DataFrame must hit the cache (one
    Spark job, not two)."""
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.io import (
        load_table,
    )
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.similarity import (
        _QV_CACHE,
        collect_query_vectors,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    first = collect_query_vectors(emb, 5)
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    again = collect_query_vectors(load_table(spark, SF_SMOKE, "embeddings"), 5)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert again == first
    assert after == before, "cache miss ran a Spark job"
    assert any(k[-1] == 5 for k in _QV_CACHE), "slice not memoized"


def test_query_vector_cache_invalidates_on_rewrite(spark, tmp_path):
    """Rewriting the parquet at the SAME path within one application
    must not serve stale vectors: the cache key folds in per-file
    (mtime_ns, size), so a rewrite is a different key (r5 advisor)."""
    import shutil as _sh

    from clickstream_pipeline_aws_kafka_docker_airflow__spark.io import (
        load_table,
    )
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.similarity import (
        _QV_CACHE,
        clear_query_vector_cache,
        collect_query_vectors,
    )

    src = f"{SF_SMOKE}/embeddings.parquet"
    dst = str(tmp_path / "embeddings.parquet")
    _sh.copytree(src, dst) if __import__("os").path.isdir(src) else _sh.copy(
        src, dst
    )
    clear_query_vector_cache()
    first = collect_query_vectors(spark.read.parquet(dst), 3)
    n_keys = len(_QV_CACHE)

    # rewrite in place: drop the first vector so the slice changes
    rewritten = (
        spark.read.parquet(dst).where("vec_id >= 1").toPandas()
    )
    import pandas as pd  # noqa: F401

    spark.createDataFrame(rewritten).write.mode("overwrite").parquet(dst)

    second = collect_query_vectors(spark.read.parquet(dst), 3)
    assert len(_QV_CACHE) > n_keys, "rewrite did not change the cache key"
    assert [i for i, _ in second] == [1, 2], second
    assert [i for i, _ in first] == [0, 1, 2], first
    clear_query_vector_cache()


def test_query_vector_cache_is_bounded(spark):
    """FIFO bound: the cache never grows past _QV_CACHE_MAX entries."""
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.io import (
        load_table,
    )
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators import (
        similarity as sim,
    )

    sim.clear_query_vector_cache()
    emb = load_table(spark, SF_SMOKE, "embeddings")
    for n in range(1, sim._QV_CACHE_MAX + 5):
        sim.collect_query_vectors(emb, n)
    assert len(sim._QV_CACHE) <= sim._QV_CACHE_MAX
    sim.clear_query_vector_cache()
