"""PQ search quality: recall vs exact brute force on the real corpus,
and run-to-run determinism (the LUT prune has no SQL oracle, so these
tests carry its correctness story)."""

from __future__ import annotations

from clickstream_pipeline_aws_kafka_docker_airflow__spark.io import load_table
from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.pq import pq_topk
from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.similarity import (
    topk_matmul_arrow,
)

SF_DIR = "/root/testdata/sf0.01"
N_QUERIES, K = 20, 5


def _pairs(df):
    return {(r["qid"], r["nid"]) for r in df.collect()}


def test_pq_recall_and_determinism(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    exact = _pairs(topk_matmul_arrow(emb, N_QUERIES, K))
    got = _pairs(pq_topk(emb, N_QUERIES, K))
    recall = len(exact & got) / len(exact)
    print(f"\nPQ recall@{K} over {N_QUERIES} queries: {recall:.3f}")
    # 8x16 seed codebooks on UNCLUSTERED embeddings (near-random
    # neighbors, the quantizer's worst case) at the default margin 50:
    # measured 0.71; the run is deterministic so the floor has no
    # variance head-room to absorb
    assert recall >= 0.65, recall
    again = _pairs(pq_topk(emb, N_QUERIES, K))
    assert got == again
