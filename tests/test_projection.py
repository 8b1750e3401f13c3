"""Dimensionality-reduction evidence: random projection preserves
pairwise distances within JL distortion bounds, and the distributed
PCA (partial-Gram mapInPandas + driver eigh) matches a plain numpy PCA
computed on the collected data — same algorithm, so agreement is tight
float tolerance, not loose statistics."""

from __future__ import annotations

import numpy as np

from clickstream_pipeline_aws_kafka_docker_airflow__spark.io import load_table
from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.projection import (
    PCA_K,
    RP_K,
    pca_components,
    pca_project,
    rp_project,
)

from conftest import SF_SMOKE


def _emb_matrix(spark):
    rows = (
        load_table(spark, SF_SMOKE, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = [r["vec_id"] for r in rows]
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, x


def test_rp_preserves_pairwise_distances(spark):
    ids, x = _emb_matrix(spark)
    out = rp_project(load_table(spark, SF_SMOKE, "embeddings")).collect()
    proj = {r["vec_id"]: np.array([r[f"p{i}"] for i in range(RP_K)]) for r in out}
    rng = np.random.default_rng(7)
    idx = {v: i for i, v in enumerate(ids)}
    distortions = []
    for _ in range(200):
        a, b = rng.choice(ids, 2, replace=False)
        d_orig = np.linalg.norm(x[idx[a]] - x[idx[b]])
        d_proj = np.linalg.norm(proj[a] - proj[b])
        if d_orig > 0:
            distortions.append(d_proj / d_orig)
    distortions = np.array(distortions)
    # JL at k=16: individual pairs fluctuate, the ensemble is unbiased
    assert 0.8 < distortions.mean() < 1.2, distortions.mean()
    assert (distortions > 0.3).all() and (distortions < 2.5).all()


def test_pca_matches_numpy(spark):
    ids, x = _emb_matrix(spark)
    comps, vals, mean = pca_components(
        load_table(spark, SF_SMOKE, "embeddings")
    )
    # reference PCA on the same data, same orientation convention
    cov = np.cov(x, rowvar=False, bias=True)
    ref_vals, ref_vecs = np.linalg.eigh(cov)
    order = np.argsort(ref_vals)[::-1][:PCA_K]
    ref = ref_vecs[:, order].T
    for i in range(PCA_K):
        j = int(np.argmax(np.abs(ref[i])))
        if ref[i, j] < 0:
            ref[i] = -ref[i]
    assert np.allclose(vals, ref_vals[order], atol=1e-8)
    assert np.allclose(comps, ref, atol=1e-6), np.abs(comps - ref).max()
    # projected values match numpy's projection
    out = pca_project(load_table(spark, SF_SMOKE, "embeddings")).collect()
    proj = {r["vec_id"]: np.array([r[f"c{i}"] for i in range(PCA_K)]) for r in out}
    idx = {v: i for i, v in enumerate(ids)}
    ref_proj = (x - mean) @ ref.T
    for v in ids[:50]:
        assert np.allclose(proj[v], ref_proj[idx[v]], atol=1e-8)


def test_pca_variance_ordering(spark):
    _, vals, _ = pca_components(load_table(spark, SF_SMOKE, "embeddings"))
    assert (np.diff(vals) <= 1e-12).all()  # descending eigenvalues
    assert (vals > 0).all()
