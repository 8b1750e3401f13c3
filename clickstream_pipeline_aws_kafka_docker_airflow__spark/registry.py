"""Query registry: op-key -> (PySpark callable, DuckDB oracle SQL).

This is the single source of truth behind ``__spark_entry__.py``.
Each entry pairs a Spark implementation with the byte-equivalent ANSI
SQL the driver runs on DuckDB; column names/types are aligned on both
sides because the driver's compare hashes values under sorted column
names. Ops whose semantics aren't SQL-expressible (LSH, RNG generators,
streaming) register a query with ``oracle=None`` -> rows-only check.

Op-keys follow SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Entry:
    query: QueryFn
    oracle: str | None  # DuckDB SQL, or None -> rows-only check


REGISTRY: dict[str, Entry] = {}


def register(key: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[key] = Entry(fn, oracle)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _load_all()
    return {k: e.query for k, e in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {k: e.oracle for k, e in REGISTRY.items() if e.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from .queries import (  # noqa: F401
        advanced_q,
        curation_q,
        dedup_q,
        events_q,
        funnel_q,
        graph_q,
        groupsets_q,
        kafka_q,
        kpis_q,
        lateral_q,
        lifecycle_q,
        misc_q,
        pii_q,
        pipeline_q,
        pq_q,
        projection_q,
        multimodal_q,
        relational_q,
        similarity_q,
        sketch_q,
        text_q,
        time_q,
        tpch2_q,
        tpch3_q,
        tpch4_q,
        training_q,
        vectors_q,
        windows_q,
    )

    _LOADED = True
