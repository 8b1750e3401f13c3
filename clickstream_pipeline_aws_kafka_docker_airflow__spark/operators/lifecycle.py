"""Data-lifecycle operators: snapshot diffing and user erasure.

Two jobs every long-lived lakehouse needs that the reference pipeline
(an append-only S3 zone, /root/reference/ingest_clickstream_to_s3.py)
never had an answer for:

- ``snapshot_diff``: what changed between two versions of a keyed
  table (added / removed / changed rows) — the validation step behind
  incremental re-ingestion, CDC reconciliation, and "did the backfill
  change anything" checks.
- ``erasure_report`` / partition-pruned erasure (jobs.py::
  run_user_erasure): right-to-be-forgotten sweeps that rewrite ONLY
  the partitions containing a listed user, not the whole zone.

Scale shape: the diff joins (key, 16-byte digest) pairs — wide rows
never shuffle; the erasure broadcast-joins the deletion list (deletion
requests are tiny relative to the corpus) and touches only affected
partitions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def row_digest(df: DataFrame, key: str) -> Column:
    """md5 digest over every non-key column, in schema order, with an
    explicit null channel (a null and the string 'null' must not
    collide). Each column is digested INDEPENDENTLY and the fixed-width
    32-hex per-column digests are concatenated before the outer md5 —
    field boundaries can never shift, so values containing any
    delimiter character ('x|0','y' vs 'x','0|y') cannot collide. The
    digest is engine-internal — it only ever meets other digests
    computed by the same engine — so plain CAST-to-string normalization
    is safe; what matters is that equal rows digest equal and differing
    rows differ."""
    cols: list[Column] = []
    for c in df.columns:
        if c == key:
            continue
        s = F.col(c).cast("string")
        cols.append(
            F.md5(
                F.concat(
                    F.when(F.col(c).isNull(), F.lit("N")).otherwise(F.lit("V")),
                    F.coalesce(s, F.lit("")),
                )
            )
        )
    return F.md5(F.concat(*cols))


def snapshot_diff(a: DataFrame, b: DataFrame, key: str) -> DataFrame:
    """Classify every key as added (in ``b`` only), removed (in ``a``
    only), or changed (present in both, any non-key column differs);
    unchanged keys are dropped. Returns (key, change_type).

    Both sides reduce to (key, digest) BEFORE the full-outer join, so
    the shuffle carries 16-byte digests instead of full rows — at
    100 TB the diff costs two scans plus a narrow join, and each scan
    prunes to the key + compared columns."""
    da = a.select(F.col(key), row_digest(a, key).alias("_dig_a"))
    db = b.select(F.col(key), row_digest(b, key).alias("_dig_b"))
    return (
        da.join(db, key, "full_outer")
        .withColumn(
            "change_type",
            F.when(F.col("_dig_a").isNull(), F.lit("added"))
            .when(F.col("_dig_b").isNull(), F.lit("removed"))
            .when(F.col("_dig_a") != F.col("_dig_b"), F.lit("changed")),
        )
        .where(F.col("change_type").isNotNull())
        .select(key, "change_type")
    )


def snapshot_diff_derived(
    src: DataFrame,
    key: str,
    in_a: Column,
    in_b: Column,
    b_overrides: dict[str, Column] | None = None,
) -> DataFrame:
    """One-scan snapshot diff for DERIVED snapshots: when snapshot A is
    ``src.where(in_a)`` and snapshot B is ``src.where(in_b)`` with the
    columns in ``b_overrides`` rewritten, and ``key`` is unique in
    ``src``, each key's A-row and B-row originate from the SAME source
    row — so the full-outer join of :func:`snapshot_diff` degenerates
    to per-row classification: ONE scan, ZERO shuffles (at 100 TB the
    difference between a fact-fact sort-merge join and a map-only
    pass). Results are identical to
    ``snapshot_diff(src.where(in_a), b_frame, key)`` under that key-
    uniqueness precondition (pinned by
    tests/test_lifecycle.py::test_snapshot_diff_derived_matches_join);
    "changed" is decided by IS-DISTINCT-FROM on the overridden columns
    — non-overridden columns of the same row are trivially equal, and
    the per-column comparison is strictly collision-free where the
    digest path trusts md5.

    NULL membership predicates classify like the filters they mirror:
    a NULL ``in_a``/``in_b`` keeps the row out of that snapshot,
    exactly as ``where`` would."""
    in_a = F.coalesce(in_a, F.lit(False))
    in_b = F.coalesce(in_b, F.lit(False))
    changed: Column | None = None
    for c, expr in (b_overrides or {}).items():
        d = ~F.col(c).eqNullSafe(expr)
        changed = d if changed is None else (changed | d)
    ct = F.when(~in_a & in_b, F.lit("added")).when(
        in_a & ~in_b, F.lit("removed")
    )
    if changed is not None:
        ct = ct.when(in_a & in_b & changed, F.lit("changed"))
    return (
        src.where(in_a | in_b)
        .select(F.col(key), ct.alias("change_type"))
        .where(F.col("change_type").isNotNull())
    )


def erasure_report(
    events: DataFrame,
    deletion_list: DataFrame,
    ts: str = "ts",
    user: str = "user_id",
) -> DataFrame:
    """Per-day impact report for a deletion-request list: rows that a
    right-to-be-forgotten sweep would erase vs retain, and how many
    listed users actually appear that day. The deletion list is
    broadcast (requests are tiny vs the corpus); one scan, one
    aggregate. Rows with a NULL user never match a request and are
    retained."""
    doomed = F.broadcast(
        deletion_list.select(F.col(user)).distinct().withColumn("_doomed", F.lit(True))
    )
    flagged = events.join(doomed, user, "left")
    return (
        flagged.groupBy(F.to_date(F.col(ts)).alias("dt"))
        .agg(
            F.count(F.when(F.col("_doomed"), 1)).alias("rows_erased"),
            (F.count(F.lit(1)) - F.count(F.when(F.col("_doomed"), 1))).alias(
                "rows_retained"
            ),
            F.countDistinct(F.when(F.col("_doomed"), F.col(user))).alias(
                "users_erased"
            ),
        )
    )


def affected_partitions(
    zone: DataFrame,
    deletion_list: DataFrame,
    user: str,
    partition_cols: Sequence[str],
) -> DataFrame:
    """Distinct partition tuples containing at least one listed user —
    the prune set a partition-rewriting erasure touches. Broadcast
    semi-join; the scan reads only the user + partition columns."""
    return (
        zone.join(F.broadcast(deletion_list.select(user).distinct()), user, "left_semi")
        .select(*partition_cols)
        .distinct()
    )
