"""Sequential time-series operators: integer-exact EWMA smoothing.

An exponentially-weighted moving average is a SEQUENTIAL recurrence —
``s_t = alpha*x_t + (1-alpha)*s_{t-1}`` — which has no window-function
form. Here it runs as a per-series ``aggregate()`` higher-order fold
over the collected, sorted series: still engine-side (Catalyst HOF,
no Python), still one shuffle (the series groupBy). With a rational
``alpha = num/den`` and fixed-point integer state,

    s_1 = x_1 * scale
    s_t = (num * x_t * scale + (den - num) * s_{t-1}) div den

every step is exact BIGINT arithmetic, so the whole recurrence is
bit-deterministic and has a recursive-CTE SQL oracle
(queries/windows_q.py::ewma_hourly).

Scale shape: one fold per series; a series must fit in one task
(hourly points: 9k rows/year — fine). Millions of SERIES parallelize
across the groupBy; a single very long series would instead want
chunked prefix-scan composition, which this operator does not do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

EWMA_SCALE = 10**6
EWMA_NUM = 1
EWMA_DEN = 4  # alpha = 1/4


def ewma_series(
    df: DataFrame,
    series_cols: list[str],
    order_col: str,
    value_col: str,
    num: int = EWMA_NUM,
    den: int = EWMA_DEN,
    scale: int = EWMA_SCALE,
) -> DataFrame:
    """Per-series integer EWMA. Input: one row per (series, tick);
    output: the same rows plus ``ewma`` (BIGINT, ``scale`` fixed-point).
    Ticks are ordered by ``order_col`` inside each series."""
    # Explicit 'seen' boolean in the accumulator — NOT a negative
    # sentinel on prev, so a series whose value (or fixed-point EWMA
    # state) goes negative never silently restarts the recurrence.
    step = (
        f"CASE WHEN NOT acc.seen THEN x.v * {scale} "
        f"ELSE ({num} * x.v * {scale} + {den - num} * acc.prev) div {den} END"
    )
    fold = f"""
        aggregate(
            xs,
            named_struct(
                'out', cast(array() as array<struct<o:{{otype}},v:bigint,ewma:bigint>>),
                'prev', cast(0 AS bigint),
                'seen', false
            ),
            (acc, x) -> named_struct(
                'out', array_append(acc.out,
                    named_struct('o', x.o, 'v', x.v, 'ewma', cast({step} as bigint))),
                'prev', cast({step} as bigint),
                'seen', true
            ),
            acc -> acc.out
        )
    """
    otype = dict(df.dtypes)[order_col]
    packed = (
        df.select(
            *series_cols,
            F.struct(
                F.col(order_col).alias("o"), F.col(value_col).cast("bigint").alias("v")
            ).alias("x"),
        )
        .groupBy(*series_cols)
        .agg(F.sort_array(F.collect_list("x")).alias("xs"))
        .select(*series_cols, F.explode(F.expr(fold.format(otype=otype))).alias("r"))
    )
    return packed.select(
        *series_cols,
        F.col("r.o").alias(order_col),
        F.col("r.v").alias(value_col),
        F.col("r.ewma").alias("ewma"),
    )
