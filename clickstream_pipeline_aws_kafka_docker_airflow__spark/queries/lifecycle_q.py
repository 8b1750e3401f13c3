"""Data-lifecycle queries: snapshot diff and user-erasure impact.

The two snapshots and the deletion list are derived deterministically
from the events table with shared constants, so the Spark plans and
the DuckDB oracles describe byte-identical inputs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_table
from ..operators.lifecycle import erasure_report, snapshot_diff_derived
from ..registry import register

# Snapshot A = events before Jan 21. Snapshot B = events before Jan 26
# minus every 17th event (rows deleted since A), with every 11th
# event's value doubled (rows changed since A).
_A_END = "2024-01-21"
_B_END = "2024-01-26"
_DEL_MOD = 17
_CHG_MOD = 11

# Deletion-request list for the erasure report: every 41st user.
_ERASE_MOD = 41


def _snapshots(events):
    a = events.where(F.col("ts") < F.lit(_A_END).cast("timestamp"))
    b = events.where(
        (F.col("ts") < F.lit(_B_END).cast("timestamp"))
        & (F.col("event_id") % _DEL_MOD != 0)
    ).withColumn(
        "value",
        F.when(F.col("event_id") % _CHG_MOD == 0, F.col("value") * 2).otherwise(
            F.col("value")
        ),
    )
    return a, b


@register(
    "snapshot_diff",
    oracle=f"""
WITH a AS (
    SELECT * FROM events WHERE ts < TIMESTAMP '{_A_END}'
), b AS (
    SELECT event_id, ts, user_id, event_type,
           CASE WHEN event_id % {_CHG_MOD} = 0 THEN value * 2 ELSE value END AS value,
           props
    FROM events
    WHERE ts < TIMESTAMP '{_B_END}' AND event_id % {_DEL_MOD} <> 0
)
SELECT COALESCE(a.event_id, b.event_id) AS event_id,
       CASE WHEN a.event_id IS NULL THEN 'added'
            WHEN b.event_id IS NULL THEN 'removed'
            WHEN (a.ts IS DISTINCT FROM b.ts)
              OR (a.user_id IS DISTINCT FROM b.user_id)
              OR (a.event_type IS DISTINCT FROM b.event_type)
              OR (a.value IS DISTINCT FROM b.value)
              OR (a.props IS DISTINCT FROM b.props) THEN 'changed'
       END AS change_type
FROM a FULL JOIN b ON a.event_id = b.event_id
WHERE (a.event_id IS NULL) OR (b.event_id IS NULL)
   OR (a.ts IS DISTINCT FROM b.ts)
   OR (a.user_id IS DISTINCT FROM b.user_id)
   OR (a.event_type IS DISTINCT FROM b.event_type)
   OR (a.value IS DISTINCT FROM b.value)
   OR (a.props IS DISTINCT FROM b.props)
""",
)
def snapshot_diff_q(spark, sf_dir):
    """Added/removed/changed keys between two table versions. Both
    snapshots here are DERIVED from one keyed source (A = a time-filter
    of events, B = a time-filter minus deletions with one column
    rewritten) and ``event_id`` is the events PK — so the r12 path is
    ``snapshot_diff_derived``: one scan, zero shuffles, per-row
    membership + IS-DISTINCT-FROM classification (the oracle's own
    spelling). The general two-source diff (``snapshot_diff``: digest
    reduction before a full-outer join) remains the operator for
    independently-produced snapshots — stream/batch reconciliation
    still uses it (tests/test_stream_batch_reconciliation.py)."""
    in_a = F.col("ts") < F.lit(_A_END).cast("timestamp")
    in_b = (F.col("ts") < F.lit(_B_END).cast("timestamp")) & (
        F.col("event_id") % _DEL_MOD != 0
    )
    b_value = F.when(
        F.col("event_id") % _CHG_MOD == 0, F.col("value") * 2
    ).otherwise(F.col("value"))
    return snapshot_diff_derived(
        load_table(spark, sf_dir, "events"),
        "event_id",
        in_a,
        in_b,
        {"value": b_value},
    )


@register(
    "user_erasure_report",
    oracle=f"""
SELECT CAST(ts AS DATE) AS dt,
       CAST(COUNT(CASE WHEN user_id % {_ERASE_MOD} = 0 THEN 1 END) AS BIGINT) AS rows_erased,
       CAST(COUNT(*) - COUNT(CASE WHEN user_id % {_ERASE_MOD} = 0 THEN 1 END) AS BIGINT) AS rows_retained,
       CAST(COUNT(DISTINCT CASE WHEN user_id % {_ERASE_MOD} = 0 THEN user_id END) AS BIGINT) AS users_erased
FROM events
GROUP BY 1
""",
)
def user_erasure_report(spark, sf_dir):
    """Right-to-be-forgotten impact report: per day, rows a sweep for
    the listed users would erase vs retain. The deletion list is
    broadcast into one scan+aggregate; the rewriting job is
    jobs.py::run_user_erasure."""
    events = load_table(spark, sf_dir, "events")
    del_list = events.where(F.col("user_id") % _ERASE_MOD == 0).select("user_id")
    return erasure_report(events, del_list)
