"""As-of (time-travel) join — an operator Spark lacks natively,
composed from existing DataFrame ops (SURVEY.md custom-operator rule
(a): composition before Pandas UDFs).

Pattern: tag and union both sides, sort within the join key by
(timestamp, tag), carry the right side's values forward with
``last(..., ignorenulls=True)``, keep the left rows. One shuffle on the
join key; no point-in-time subquery per row, no range cross-join — this
is the scalable formulation (the same one Flink/kdb users hand-roll).

Ties: right rows sort BEFORE left rows at equal timestamps, so the
match condition is ``right.ts <= left.ts`` inclusive — identical to
DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``, which the oracle uses.
The right side must be unique per (key, ts); callers dedupe first
(nondeterministic otherwise in ANY engine).

NULLs: a NULL join key or NULL timestamp never matches — the standard
as-of (and SQL equality/inequality) semantics. Right rows with NULL
key/ts are dropped; left rows with NULL key/ts are kept with NULL
value columns, and bypass the window shuffle entirely (a corpus with
many NULL-key rows would otherwise pile them into one hot window
partition to compute a carry that is NULL by definition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Left as-of join: every left row + the most recent right-side
    ``value_cols`` at-or-before its timestamp (nulls when none)."""
    lcols = [c for c in left.columns]
    matchable = F.col(key).isNotNull() & F.col(left_ts).isNotNull()
    unmatchable = left.where(~matchable).select(
        *lcols,
        *[
            F.lit(None).cast(dict(right.dtypes)[c]).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    left = left.where(matchable)
    right = right.where(F.col(key).isNotNull() & F.col(right_ts).isNotNull())
    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    u = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return (
        carried.where(F.col("_tag") == 1)
        .select(*lcols, *[F.col(f"asof_{c}") for c in value_cols])
        .unionByName(unmatchable)
    )
