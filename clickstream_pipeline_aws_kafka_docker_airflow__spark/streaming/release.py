"""Deterministic release of scope-local ``localCheckpoint`` blocks
(r10 verdict next-round #2).

The streaming zones truncate per-batch lineage with ``localCheckpoint``
(upsert merge, corpus-ingest dedup chain, CMS compaction). Those
blocks are dead the moment the batch's writes commit — nothing ever
reads them again — but nothing released them either: reclamation
waited on the driver GC noticing the unreferenced RDD objects and the
ContextCleaner unpersisting them. Measured effect (r10 soaks): 100
ticks ended anywhere between 0 and ~81 pending RDD-storage entries
depending on GC timing — eviction-safe, O(zones) after a forced GC,
but nondeterministic occupancy at 100x tick counts.

``checkpoint_release_scope`` replaces that GC dependence with an
explicit contract: snapshot the persistent-RDD ids on entry, and on
exit unpersist every id created inside the scope. Wrapped around a
micro-batch body, batch N's blocks are gone before batch N+1 starts —
RDD-storage occupancy is exactly the in-flight batch, a constant,
on every run.

Scope-diff (not targeted handles) is deliberate: one batch creates
several checkpoints through operator-internal calls, and enumerating
handles would couple this module to operator internals. Anything a
batch-scoped body persists is batch-local BY CONSTRUCTION — even a
future CacheManager pin created inside the scope should die with the
batch (its plan identity changes per batch, so keeping it would
accrete one dead entry per batch; the cache-census contract in
tests/test_cache_census.py covers long-lived QUERY pins, which are
created outside any batch scope).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession


def _persistent_ids(spark: SparkSession) -> set[int]:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(i) for i in jmap.keySet().toArray()}


@contextmanager
def checkpoint_release_scope(spark: SparkSession):
    """On exit, unpersist every RDD whose storage registration was
    created inside the scope (non-blocking). Exception-safe: a failed
    batch releases its blocks too — a retry re-materializes from
    source, never from a half-built checkpoint.

    SINGLE-THREADED CONTRACT (r11 advice): the diff is over the
    session-global getPersistentRDDs(), so an RDD-storage registration
    created by a CONCURRENT thread inside the scope window (e.g. a
    CacheManager pin materializing on another query's thread) would be
    swept on exit. Every current caller (artifact builds, per-batch
    streaming release) runs on the driver's single query thread; SQL
    caches also self-heal by recomputation, so a stray sweep degrades
    to a recompute, never to wrong results. If concurrent builds ever
    become possible, restrict the sweep to ids absent from the
    CacheManager or serialize scopes with a session-level lock."""
    before = _persistent_ids(spark)
    try:
        yield
    finally:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in list(jmap.keySet().toArray()):
            if int(rid) not in before:
                jmap.get(rid).unpersist(False)
