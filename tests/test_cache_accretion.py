"""Multi-dataset cache accretion (r10 verdict next-round #4): the
single-dataset census (test_cache_census.py) proves entry-count
stability within one dataset; this test exercises the documented
CROSS-dataset residual — one pinned-entry set per source identity —
over three sf dirs and pins both halves of the contract:

1. WITH ``release_query_caches`` at each dataset boundary, storage
   returns to the baseline after every switch (the hygiene pattern
   multi-dataset drivers like scripts/scale_probe.py use).
2. WITHOUT the helper, accretion is bounded by datasets x pinned-count
   — exactly one entry set per dataset, never per run — and one final
   release drops all of it.
"""

from __future__ import annotations

from clickstream_pipeline_aws_kafka_docker_airflow__spark import registry
from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.maintenance import (
    release_query_caches,
)

from test_cache_census import PERSISTING_QUERIES, _cached_entries

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def _run_set(spark, sf_dir: str) -> None:
    qs = registry.queries()
    for name in PERSISTING_QUERIES:
        qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()


def test_release_at_each_boundary_returns_to_baseline(spark):
    release_query_caches(spark)
    baseline = _cached_entries(spark)
    pinned = sum(PERSISTING_QUERIES.values())
    try:
        for sf in SF_DIRS:
            _run_set(spark, sf)
            assert _cached_entries(spark) == baseline + pinned, (
                f"{sf}: entry count off — pinned set changed?"
            )
            release_query_caches(spark)
            assert _cached_entries(spark) == baseline, (
                f"{sf}: release_query_caches left residual entries"
            )
    finally:
        release_query_caches(spark)


def test_accretion_without_release_is_bounded_by_datasets(spark):
    release_query_caches(spark)
    baseline = _cached_entries(spark)
    pinned = sum(PERSISTING_QUERIES.values())
    try:
        for i, sf in enumerate(SF_DIRS, start=1):
            _run_set(spark, sf)
            assert _cached_entries(spark) == baseline + i * pinned, (
                f"after {i} datasets: expected exactly one pinned set "
                f"per source identity ({i} x {pinned}), got "
                f"{_cached_entries(spark) - baseline}"
            )
        # repeat pass over the SAME dirs must not add entries (plan
        # identity dedupes per dataset, not just within one)
        for sf in SF_DIRS:
            _run_set(spark, sf)
        assert _cached_entries(spark) == baseline + len(SF_DIRS) * pinned
    finally:
        released = release_query_caches(spark)
        assert _cached_entries(spark) == baseline, "final release failed"
        assert released >= len(SF_DIRS) * sum(PERSISTING_QUERIES.values())
