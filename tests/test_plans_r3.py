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


def test_ann_lsh_reads_band_index_and_broadcasts_queries(spark):
    # the search must scan the materialized band index (a parquet scan
    # of vec_id/tbl/bucket), broadcast the tiny query-side tables, and
    # never re-derive hyperplane dots over the corpus
    f_ = _Q["ann_topk_lsh"](spark, SF_SMOKE)
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.plans.explain import (
        plan_facts,
    )

    f = plan_facts(f_)
    assert any("bucket" in s for s in f.read_schemas), f.read_schemas
    assert f.broadcast_joins >= 2, f.text
    assert f.python_evals == 0


def test_corpus_curation_bounded_exchanges(spark):
    # composite over materialized stages: quality projection + three
    # doc_id joins + the split predicate; exchanges stay bounded (no
    # stage recomputation blow-up) and nothing python-evals
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.plans.explain import (
        plan_facts,
    )

    f = plan_facts(_Q["corpus_curation"](spark, SF_SMOKE))
    assert f.python_evals == 0
    assert "Cartesian" not in f.text
    # all joins key on doc_id; with AQE the small sides broadcast
    assert f.exchanges <= 8, f.text


def test_artifact_materialize_roundtrip(spark, tmp_path):
    import pandas as pd

    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators import (
        artifacts,
    )

    src = tmp_path / "src.parquet"
    pd.DataFrame({"x": [1, 2, 3]}).to_parquet(src)
    calls = {"n": 0}

    def _build():
        calls["n"] += 1
        return spark.range(3).withColumnRenamed("id", "x")

    import unittest.mock as mock

    with mock.patch.object(artifacts, "ARTIFACT_ROOT", str(tmp_path / "root")):
        a = artifacts.materialized(spark, str(src), "t", _build)
        b = artifacts.materialized(spark, str(src), "t", _build)
        assert calls["n"] == 1  # second call reads, never rebuilds
        assert sorted(r["x"] for r in a.collect()) == [0, 1, 2]
        assert sorted(r["x"] for r in b.collect()) == [0, 1, 2]
        # a source change invalidates the key
        pd.DataFrame({"x": [9]}).to_parquet(src)
        artifacts.materialized(spark, str(src), "t", _build)
        assert calls["n"] == 2


def test_ivfpq_scans_codes_not_vectors_for_ranking(spark):
    # the candidate-ranking stage must read the materialized CODE table
    # (codes array scan) and the inverted file; corpus embeddings are
    # touched only by the bounded exact-rescore join. No python evals.
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.plans.explain import (
        plan_facts,
    )

    f = plan_facts(_Q["ann_topk_ivfpq"](spark, SF_SMOKE))
    assert any("codes" in s for s in f.read_schemas), f.read_schemas
    assert any("centroid_id" in s for s in f.read_schemas), f.read_schemas
    assert f.python_evals == 0
    assert "Cartesian" not in f.text
