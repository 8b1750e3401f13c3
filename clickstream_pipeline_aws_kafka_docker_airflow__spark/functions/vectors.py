"""Vector Column builders over ``array<float>`` embedding columns.

Everything computes in DOUBLE with strict left-to-right accumulation
(``F.aggregate`` fold), matching DuckDB's ``list_dot_product`` over
``DOUBLE[]`` for oracle parity. JVM-side expressions — no UDFs — so the
64-float dot product stays inside whole-stage codegen; at 100 TB the
alternative (per-row Python) is the difference between hours and weeks.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot(a: Column | str, b: Column | str) -> Column:
    """Sum_i a[i]*b[i] in double precision, index order."""
    prods = F.zip_with(_col(a), _col(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity. CALLER CONTRACT: zero-norm vectors must be
    filtered out first (every similarity tier does — see the round-6
    zero-norm rule in docs/architecture.md); under ANSI mode this
    expression raises on the first all-zero embedding otherwise."""
    return dot(a, b) / (norm(a) * norm(b))


def cosine_prenormed(dot_ab: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine from precomputed pieces — compute norms once per row, not
    once per pair, before a pairwise join."""
    return dot_ab / (norm_a * norm_b)
