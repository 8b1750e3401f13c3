"""Dimensionality-reduction queries: seeded random projection (full
DuckDB oracle — the matrix is a shared literal) and distributed PCA
(rows-only: eigendecomposition has no SQL twin; numpy-parity tested).
"""

from __future__ import annotations

from ..io import load_table
from ..operators.projection import RP_K, RP_SEED, pca_project, rp_project
from ..registry import register

_E = "CAST(embedding AS DOUBLE[])"


def _rp_oracle() -> str:
    from ..operators.projection import rp_plane_sql

    cols = ",\n       ".join(
        f"{expr} AS p{i}" for i, expr in enumerate(rp_plane_sql(_E, RP_K))
    )
    return f"SELECT vec_id,\n       {cols}\nFROM embeddings"


@register("rp_project16", oracle=_rp_oracle())
def rp_project16(spark, sf_dir):
    """Johnson-Lindenstrauss sketch: 64-dim embeddings projected to 16
    dims by a seeded Gaussian matrix (1/sqrt(k)-scaled). Deterministic
    across engines — the matrix is a float64 literal on both sides and
    every coordinate a sequential fold. Pure projection: no shuffle,
    one map stage; the cheap pre-filter tier when PQ is too lossy
    (distance distortion bounds pinned in tests/test_projection.py)."""
    return rp_project(load_table(spark, sf_dir, "embeddings"))


@register("pca_project8")
def pca_project8(spark, sf_dir):
    """Distributed PCA (rows-only: eigh has no SQL spelling): one
    mapInPandas pass computes per-batch partial Gram matrices (numpy
    X^T X per Arrow batch — collected state is batches x dim^2, not
    corpus-sized), the driver eigendecomposes the covariance, and the
    top-8 components project back as literals (broadcast route at real
    dim x k). Deterministic orientation (largest-|coord| positive);
    exact numpy parity pinned in tests/test_projection.py."""
    return pca_project(load_table(spark, sf_dir, "embeddings"))
