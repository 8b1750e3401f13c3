"""Trailing-window z-test over an hourly count series, in pure integer
arithmetic — shared by the batch query (queries/events_q.py::
hourly_anomalies, which carries the DuckDB oracle) and the streaming
monitor (streaming/anomaly.py), so both paths flag from ONE spelling
of the math.

The test ``|c - mean| > z * stddev`` is cross-multiplied through the
mean/variance denominators into
``(c*W - S1)^2 > z^2 * (W*S2 - S1^2)`` over integer counts — no float
mean, no sqrt, no summation-order knife edge. BIGINT carries this to
~1e8 events/hour; past that cast the two squared terms to DECIMAL
(same construction as functions/scalars.dec_sum_round2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

ANOM_WINDOW_H = 24
ANOM_Z = 3  # flag when (c - mean)^2 > Z^2 * variance


def trailing_z_flags(
    hourly: DataFrame,
    window_h: int = ANOM_WINDOW_H,
    z: int = ANOM_Z,
) -> DataFrame:
    """(dt, hh, c) -> (dt, hh, c, trail_sum, is_anomaly) for every hour
    with a FULL trailing window of ``window_h`` predecessors.

    Scale: the input is the post-aggregate hourly series — one row per
    hour — so the unpartitioned ordering is series-sized by
    construction, never corpus-sized.
    """
    w = Window.orderBy("dt", "hh").rowsBetween(-window_h, -1)
    trailed = hourly.select(
        "dt",
        "hh",
        "c",
        F.count("c").over(w).alias("trail_n"),
        F.coalesce(F.sum("c").over(w), F.lit(0)).alias("trail_sum"),
        F.coalesce(F.sum(F.col("c") * F.col("c")).over(w), F.lit(0)).alias(
            "trail_sumsq"
        ),
    )
    d = F.col("c") * window_h - F.col("trail_sum")
    rhs = (z * z) * (
        window_h * F.col("trail_sumsq")
        - F.col("trail_sum") * F.col("trail_sum")
    )
    return (
        trailed.where(F.col("trail_n") == window_h)
        .select("dt", "hh", "c", "trail_sum", (d * d > rhs).alias("is_anomaly"))
    )
