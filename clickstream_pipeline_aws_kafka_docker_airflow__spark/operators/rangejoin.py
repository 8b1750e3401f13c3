"""Bucketed range join — interval predicates without the O(n*m) blowup.

A plain ``l.ts BETWEEN r.start AND r.end`` join has no equi key, so
Spark falls back to BroadcastNestedLoopJoin: every row pair tested.
Fine when one side broadcasts; fatal when both sides are large. The
scalable formulation (what Databricks' range-join hint and
KDB/kdb-style engines do internally): quantize both sides into coarse
time buckets, equi-join on the bucket, re-check the exact predicate.
Each range explodes into the buckets it covers, so a range only meets
the rows that could possibly match.

Bucket width tunes the trade: wider -> fewer replicated range rows,
more false candidates; narrower -> the reverse. Pick ~the median range
length (here: daily buckets for hour-scale ranges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def range_join_bucketed(
    left: DataFrame,
    ranges: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    how: str = "inner",
) -> DataFrame:
    """Join left rows to every range with start <= ts < end, via daily
    equi-buckets + exact re-check."""
    r_bucketed = ranges.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.to_date(start_col),
                F.to_date(end_col),
                F.expr("INTERVAL 1 DAY"),
            )
        ),
    )
    l_bucketed = left.withColumn("_bucket", F.to_date(ts_col))
    cond = (
        (F.col(ts_col) >= F.col(start_col))
        & (F.col(ts_col) < F.col(end_col))
    )
    return (
        l_bucketed.join(r_bucketed, "_bucket", how)
        .where(cond)
        .drop("_bucket")
    )
