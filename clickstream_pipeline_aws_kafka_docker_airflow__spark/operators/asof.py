"""As-of (time-travel) join — an operator Spark lacks natively,
composed from existing DataFrame ops (SURVEY.md custom-operator rule
(a): composition before Pandas UDFs).

Pattern: tag and union both sides, sort within the join key by
(timestamp, tag), carry the right side's values forward with
``last(..., ignorenulls=True)``, keep the left rows. One shuffle on the
join key; no point-in-time subquery per row, no range cross-join — this
is the scalable formulation (the same one Flink/kdb users hand-roll).

The carry is ROW-WISE: all ``value_cols`` of a right row travel as one
struct (the struct is non-NULL even when every field is NULL), so the
as-of match picks exactly one right row and returns its values
including NULLs — identical to DuckDB ASOF JOIN. Carrying each column
independently would let a NULL field fall back to an older non-NULL
row, silently mixing values from different right rows.

Ties: right rows sort BEFORE left rows at equal timestamps, so the
match condition is ``right.ts <= left.ts`` inclusive — identical to
DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``, which the oracle uses.
The right side must be unique per (key, ts); callers dedupe first
(nondeterministic otherwise in ANY engine).

NULLs: a NULL join key or NULL timestamp never matches — the standard
as-of (and SQL equality/inequality) semantics. Right rows with NULL
key/ts are dropped. Left rows with NULL key/ts are kept with NULL
value columns; they ride the SAME single scan and shuffle as everyone
else, but under synthetic spread keys (``n|<scan partition id>``) so
(a) they can never pile into one hot window partition (their carry is
NULL by definition — there is nothing to compute), and (b) the left
side is scanned exactly once (a separate bypass branch costs a second
scan, and its ``OR(IsNull)`` filter does not push through the
null-preserving timestamp cast the loader applies, so the second scan
would be a full one). Real keys are namespaced ``k|<key>`` so a
synthetic key can never collide with a data key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T
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
    # namespaced string partition key: matchable rows group on their
    # real key; unmatchable rows spread over per-scan-partition
    # synthetic keys (parallelism tracks the scan; no hot partition)
    l_k = F.when(
        matchable, F.concat(F.lit("k|"), F.col(key).cast("string"))
    ).otherwise(
        F.concat(F.lit("n|"), F.spark_partition_id().cast("string"))
    )
    # one struct per right row: the as-of match must be row-wise (a
    # matched right row's NULL field stays NULL; it must not fall back
    # to an older right row's non-NULL value, which per-column
    # last(ignorenulls) would do)
    rfields = {f.name: f.dataType for f in right.schema.fields}
    carry_type = T.StructType(
        [T.StructField(c, rfields[c], True) for c in value_cols]
    )
    l_tagged = left.select(
        l_k.alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(carry_type).alias("_r_s"),
    )
    r_tagged = right.where(
        F.col(key).isNotNull() & F.col(right_ts).isNotNull()
    ).select(
        F.concat(F.lit("k|"), F.col(key).cast("string")).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("_r_s"),
    )
    u = l_tagged.unionByName(r_tagged)
    # nulls-first is explicit: a NULL-ts left row (synthetic-key
    # partitions only — right rows always carry a timestamp) must sort
    # before anything that could be carried into it
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc_nulls_first(), "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "*", F.last("_r_s", ignorenulls=True).over(w).alias("_carry")
    )
    return carried.where(F.col("_tag") == 1).select(
        *lcols,
        *[F.col("_carry").getField(c).alias(f"asof_{c}") for c in value_cols],
    )
