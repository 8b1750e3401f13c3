"""Scale techniques as reusable operators: bucketed co-located joins
and skew salting.

Neither exists in the reference (single-threaded Python has no
shuffles); both are part of the 100 TB design contract
(SURVEY.md, BASELINE.json north star) and are verified by plan-shape
tests (tests/test_scale.py), not just by values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) by its join key.

    Two tables bucketed identically on their join key co-locate: the
    join compiles to a zero-shuffle SortMergeJoin. At 100 TB this is
    the difference between re-shuffling the fact table on every run and
    paying the shuffle once at write time.
    """
    writer = df.write.bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.mode("overwrite").format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list[str],
    how: str = "inner"
) -> DataFrame:
    return spark.table(left_table).join(spark.table(right_table), on, how)


def widen(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition IFF the input is narrower than the
    cluster — the guard for compute-bound per-row operators (vector
    folds, shingling) fed by a small file count.

    A single small parquet file scans as ONE task, so an expensive
    projection over it runs on one core no matter how wide the cluster
    is (measured 32x underuse on the IVF assignment pass). At 100 TB
    the scan has thousands of splits and this is a no-op — the
    condition keeps the explicit shuffle out of exactly the plans that
    don't need it.
    """
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def salted_agg(
    df: DataFrame,
    group_col: str,
    agg_exprs: dict[str, Column],
    n_salts: int = 16,
    recombine: dict[str, Callable[[Column | str], Column]] | None = None,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    Phase 1 groups on (key, random salt) so one hot key spreads over
    ``n_salts`` reducers; phase 2 re-aggregates the partials. Only
    algebraic aggregates decompose this way — by default sums and counts
    (partial COUNT re-aggregates as SUM, inferred from the output name);
    ``max``/``min`` partials recombine as themselves via an explicit
    ``recombine={'name': F.max}`` entry. Any aggregate whose recombine
    op can't be determined raises — silently SUM-merging a MAX partial
    would return wrong values with no error. Non-decomposable aggs
    (avg, exact distinct) must be rewritten over decomposable partials
    (sum+count, two-level distinct) before salting.

    Note Spark's hash aggregate already does map-side partial
    aggregation, which absorbs *moderate* skew; explicit salting is for
    the pathological case where even the merged partials of one key
    overwhelm a single reducer, and for high-cardinality-state aggs
    (collect_*, exact distinct) where map-side combine cannot shrink
    the hot key.
    """
    recombine = dict(recombine or {})
    for name in agg_exprs:
        if name in recombine:
            continue
        if name.startswith(("count", "n_", "sum", "total")):
            recombine[name] = F.sum
        elif name.startswith(("max", "min")):
            recombine[name] = F.max if name.startswith("max") else F.min
        else:
            raise ValueError(
                f"salted_agg: no recombine op for aggregate {name!r} — "
                "pass recombine={name: F.<op>} (the op that merges its "
                "phase-1 partials), or rename to a count/sum/max/min "
                "prefix. Refusing to guess: a wrong merge op returns "
                "wrong values silently."
            )
    salted = df.withColumn("_salt", (F.rand() * n_salts).cast("int"))
    phase1 = salted.groupBy(group_col, "_salt").agg(
        *[c.alias(f"_p_{name}") for name, c in agg_exprs.items()]
    )
    finals = [
        recombine[name](F.col(f"_p_{name}")).alias(name) for name in agg_exprs
    ]
    return phase1.groupBy(group_col).agg(*finals)


def salted_broadcast_join(
    big: DataFrame, small: DataFrame, key: str, n_salts: int = 16
) -> DataFrame:
    """Skewed-key join where the small side fits in memory: explode the
    small side n_salts ways, salt the big side once — every hot-key row
    of the big side still lands on a different reducer. (With AQE's
    skew-join handling on, prefer letting AQE split oversized partitions
    first; this is the manual fallback for non-AQE paths/sinks.)"""
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)])).alias("_salt")
    small_exploded = small.select("*", salts)
    big_salted = big.withColumn("_salt", (F.rand() * n_salts).cast("int"))
    return big_salted.join(F.broadcast(small_exploded), [key, "_salt"]).drop("_salt")


def key_skew_report(df: DataFrame, key: str, top_k: int = 10) -> DataFrame:
    """Join/agg-key skew diagnosis: per top-``top_k`` key, its row
    count, its integer-permille share of the table, and whether it
    exceeds 2x the fair (uniform) share — the report that decides
    between a plain shuffle, :func:`salted_agg`, or
    :func:`salted_broadcast_join` BEFORE a 100 TB shuffle is launched.

    One scan (map-side partial counts on the key), then the top-k is
    taken with a distributed ``orderBy(...).limit(k)`` (TakeOrdered:
    each partition contributes its local top-k, the driver merges k*p
    rows) — NOT a global row_number window, which would sort every
    distinct key in a single partition; at 1B+ keys that window is the
    exact straggler this report exists to prevent. The rank window then
    runs over the <=k survivors only. All integer math; ties rank by
    key string for determinism, with the NULL key pinned LAST (a NULL
    key is "no key"; Spark ASC would sort it FIRST while DuckDB sorts
    it LAST — the cross-engine placement rule every nullable window
    key needs spelled)."""
    from pyspark.sql import Window

    counts = df.groupBy(F.col(key).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    totals = counts.agg(
        F.sum("cnt").alias("n_rows"), F.count(F.lit(1)).alias("n_keys")
    )
    top = counts.orderBy(F.desc("cnt"), F.asc_nulls_last("key")).limit(top_k)
    w = Window.orderBy(F.desc("cnt"), F.asc_nulls_last("key"))
    return (
        top.crossJoin(F.broadcast(totals))
        .withColumn("rank", F.row_number().over(w))
        .select(
            F.col("rank").cast("bigint").alias("rank"),
            "key",
            "cnt",
            F.expr("CAST((cnt * 1000) div n_rows AS BIGINT)").alias(
                "share_permille"
            ),
            F.expr("cnt * n_keys > 2 * n_rows").alias("skewed"),
        )
    )
