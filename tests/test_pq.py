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


def _clustered_emb(spark, n=4000, d=64, n_clusters=50, noise=0.1, seed=11):
    """Tightly clustered synthetic corpus — the regime where raw-vector
    PQ codes collapse (cluster members share codes, so the prune
    degenerates to its vec_id tie-break)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    cents = rng.normal(0, 1, (n_clusters, d))
    asg = rng.integers(0, n_clusters, n)
    vecs = (cents[asg] + rng.normal(0, noise, (n, d))).astype("float32")
    return spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id bigint, embedding array<float>",
    )


def test_residual_codes_beat_raw_codes_on_clusters(spark):
    """The faiss-IVFPQ claim: residual encoding preserves within-cell
    resolution. On a clustered corpus the raw-code prune collapses to
    the id tie-break while residual codes keep recall high — this is
    the measured basis for ann_topk_ivfpq_res."""
    from pyspark.sql import functions as F

    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.pq import (
        encode_pq,
        ivfpq_topk,
        ivfpq_topk_residual,
        residual_frame,
        train_pq,
    )
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.similarity import (
        _assign_to_centroids,
        kmeans_centroid_list,
    )

    emb = _clustered_emb(spark)
    exact = _pairs(topk_matmul_arrow(emb, N_QUERIES, K))
    cents = kmeans_centroid_list(emb, 16, 2)
    cells = _assign_to_centroids(emb, cents, top=1).select(
        "vec_id", "centroid_id"
    )

    # margin 25 (< the default 50) makes the prune selective enough to
    # expose code quality; both runs are fully deterministic (seeded
    # corpus, seeded codebooks, id tie-breaks), so the measured values
    # have no variance head-room to absorb
    raw_books = train_pq(emb)
    raw_index = cells.join(encode_pq(emb, raw_books), "vec_id")
    raw = _pairs(
        ivfpq_topk(
            emb, N_QUERIES, K, cents=cents, books=raw_books,
            index=raw_index, rescore_margin=25,
        )
    )

    res = residual_frame(emb, cells, cents)
    res_books = train_pq(res)
    res_index = cells.join(encode_pq(res, res_books), "vec_id")
    resg = _pairs(
        ivfpq_topk_residual(
            emb, N_QUERIES, K, cents=cents, books=res_books,
            index=res_index, rescore_margin=25,
        )
    )

    raw_recall = len(exact & raw) / len(exact)
    res_recall = len(exact & resg) / len(exact)
    print(f"\nIVF-PQ recall@{K}: raw={raw_recall:.3f} residual={res_recall:.3f}")
    # measured here: raw 0.46, residual 0.55. The gap widens with cell
    # size — at 100k vectors in 100 clusters (cells ~6k, margins 50/200):
    # raw 16-entry 0.08/0.26, residual 16-entry 0.23/0.57,
    # raw 256-entry 0.48/0.80, residual 256-entry 0.51/0.90
    assert res_recall > raw_recall, (raw_recall, res_recall)
    assert res_recall >= 0.5, (raw_recall, res_recall)
