"""Round-3 scale contracts: quantizer/codebook state must be able to
ship as a BROADCAST relation instead of plan literals (at production
k x dim a literal plan is megabytes re-parsed per query), and the two
paths must agree bit-for-bit so the oracle-checked results don't care
which one ran. Also pins the persisted-quantizer query path: search
never retrains."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickstream_pipeline_aws_kafka_docker_airflow__spark import registry
from clickstream_pipeline_aws_kafka_docker_airflow__spark.io import load_table
from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.pq import (
    K_SUB,
    N_SUB,
    SUB_DIM,
    encode_pq,
    train_pq,
)
from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.similarity import (
    IVF_NCENTROIDS,
    LITERAL_STATE_MAX_DOUBLES,
    _assign_to_centroids,
    kmeans_centroid_list,
)
from clickstream_pipeline_aws_kafka_docker_airflow__spark.plans.explain import (
    formatted_plan,
)

from conftest import SF_SMOKE

_Q = registry.queries()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_assignment_broadcast_equals_literal(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    cents = kmeans_centroid_list(emb, IVF_NCENTROIDS, 1)
    lit = _assign_to_centroids(emb, cents, top=3, mode="literal")
    bc = _assign_to_centroids(emb, cents, top=3, mode="broadcast")
    assert _rows(lit) == _rows(bc)


def test_assignment_broadcast_plan_shape(spark):
    # state ships via a broadcast exchange; the plan text must NOT
    # carry the centroid matrix inline (no giant CAST-literal arrays)
    emb = load_table(spark, SF_SMOKE, "embeddings")
    cents = kmeans_centroid_list(emb, IVF_NCENTROIDS, 0)
    plan = formatted_plan(_assign_to_centroids(emb, cents, top=1, mode="broadcast"))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    first_coord = repr(cents[0][1][0])
    assert first_coord not in plan


def test_assignment_auto_dispatch_threshold(spark):
    # above LITERAL_STATE_MAX_DOUBLES the auto mode must pick broadcast
    emb = load_table(spark, SF_SMOKE, "embeddings")
    dim = 64
    n_big = LITERAL_STATE_MAX_DOUBLES // (dim + 1) + 1
    big = [(i, [float(i == j) for j in range(dim)]) for i in range(n_big)]
    plan = formatted_plan(_assign_to_centroids(emb, big, top=1))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    small = big[:4]
    plan_small = formatted_plan(_assign_to_centroids(emb, small, top=1))
    assert "BroadcastNestedLoopJoin" not in plan_small
    assert "BroadcastExchange" not in plan_small


def test_encode_pq_broadcast_equals_literal(spark):
    emb = (
        load_table(spark, SF_SMOKE, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    )
    books = train_pq(emb, N_SUB, K_SUB, 0, sub_dim=SUB_DIM)
    lit = encode_pq(emb, books, sub_dim=SUB_DIM, mode="literal")
    bc = encode_pq(emb, books, sub_dim=SUB_DIM, mode="broadcast")
    assert sorted((r["vec_id"], tuple(r["codes"])) for r in lit.collect()) == sorted(
        (r["vec_id"], tuple(r["codes"])) for r in bc.collect()
    )


def test_vocab_broadcast_equals_literal(spark):
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.queries.training_q import (
        encode_with_vocab,
    )

    d = load_table(spark, SF_SMOKE, "documents")
    top = [("the", 100), ("a", 50), ("of", 25)]
    lit = encode_with_vocab(d, top, mode="literal")
    bc = encode_with_vocab(d, top, mode="broadcast")
    assert _rows(lit) == _rows(bc)
    plan = formatted_plan(bc)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    assert "keys: [the," not in plan  # no literal map inlined


def test_ivf_query_uses_persisted_quantizer(spark, tmp_path, monkeypatch):
    # the registered query must load a persisted quantizer on the
    # second call instead of re-running k-means
    import clickstream_pipeline_aws_kafka_docker_airflow__spark.queries.similarity_q as sq

    sq._quantizer_cached(spark, SF_SMOKE)  # ensure trained+saved

    def _no_retrain(*a, **kw):
        raise AssertionError("query path must not retrain")

    monkeypatch.setattr(
        "clickstream_pipeline_aws_kafka_docker_airflow__spark.operators."
        "similarity.kmeans_centroid_list",
        _no_retrain,
    )
    out = _Q["ann_topk_ivf"](spark, SF_SMOKE)
    assert out.count() > 0
