"""Time-arithmetic query (f_time_arith, f_strftime_fmt):
the reference's timedelta/stepping/formatting idioms
(produce_events.py:58-69, ingest_healthcheck.py:17-18,
daily_kpis.py:152) as one projected suite."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.scalars import dec_sum_round2
from ..io import load_table
from ..registry import register


@register(
    "time_arith_suite",
    oracle="""
SELECT event_id,
       ts + INTERVAL 7 DAY AS ts_plus_7d,
       ts - INTERVAL 20 MINUTE AS ts_minus_20m,
       CAST(date_diff('minute', CAST(CAST(ts AS DATE) AS TIMESTAMP), ts) AS BIGINT) AS minutes_into_day,
       strftime(ts, '%Y%m%dT%H%M%S') AS compact_ts,
       CAST(date_diff('day', TIMESTAMP '2024-01-01', ts) AS BIGINT) AS days_since_epoch0
FROM events
""",
)
def time_arith_suite(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        (F.col("ts") + F.expr("INTERVAL 7 DAYS")).alias("ts_plus_7d"),
        (F.col("ts") - F.expr("INTERVAL 20 MINUTES")).alias("ts_minus_20m"),
        F.floor(
            (F.unix_micros("ts") - F.unix_micros(F.to_date("ts").cast("timestamp")))
            / 60_000_000
        ).cast("bigint").alias("minutes_into_day"),
        F.date_format("ts", "yyyyMMdd'T'HHmmss").alias("compact_ts"),
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since_epoch0"),
    )


@register(
    "kpi_daily_approx",
    oracle="""
SELECT CAST(ts AS DATE) AS dt,
       COUNT(*) AS total_events,
       COUNT(DISTINCT user_id) AS unique_users,
       TRUE AS hll_within_5pct
FROM events
GROUP BY 1
""",
)
def kpi_daily_approx(spark, sf_dir):
    """agg_distinct_users at 100 TB: the approx_count_distinct (HLL)
    variant — one shuffle instead of two, bounded state.

    The HLL estimate itself is engine-specific, so the cross-engine
    contract is checked instead of the raw number: the query emits the
    exact per-day figures plus an in-query boolean asserting the sketch
    landed within ±5% of the exact distinct count, and the oracle
    asserts that boolean TRUE. HLL register merge is commutative (max
    per register), so the boolean is partition-order deterministic —
    a drifting sketch flips it and fails the hash. lgConfigK=14 (rsd
    ~0.8%) gives the 5% band a >6-sigma margin. (In production the exact column is
    dropped and only the sketch runs — one shuffle; see
    operators/kpis.py::kpi_aggs(approx_distinct=True).)

    Plan shape: two-phase instead of mixing COUNT DISTINCT with other
    aggregates in one ``agg`` — the mixed form compiles to an Expand
    (row duplication per aggregate group, measured 4x slower here).
    Phase 1 collapses to (dt, user_id) partials; phase 2 counts rows
    for the exact distinct, sums partial counts for total_events, and
    feeds the HLL from the deduplicated keys (HLL registers are
    duplicate-insensitive, so the estimate is unchanged)."""
    return kpi_daily_approx_frame(spark, sf_dir).select(
        "dt",
        "total_events",
        "unique_users",
        (
            F.abs(F.col("_hll") - F.col("unique_users"))
            <= F.col("unique_users") * KPI_HLL_BAND
        ).alias("hll_within_5pct"),
    )


KPI_HLL_LG_K = 14  # rsd ~= 1.04/sqrt(2^14) = 0.8% -> >6 sigma in the 5% band
KPI_HLL_BAND = 0.05


def kpi_daily_approx_frame(spark, sf_dir):
    """The estimate-bearing frame under ``kpi_daily_approx`` — exposed
    so ``tests/test_sketches.py`` can pin the measured HLL error to
    half the contract band at sf0.01 AND sf0.1 (a Spark version bump
    that drifts the sketch fails the margin test before it can flip
    the contract boolean).

    Sketch choice: ``hll_sketch_agg`` (DataSketches, opaque binary
    buffer), NOT ``approx_count_distinct(rsd=0.01)`` — at that rsd the
    declarative HLL++ buffer explodes into 1639 separate Long
    aggregation-buffer attributes and the plan's row width (not the
    data) dominates: measured 1.07 s vs 0.39 s at sf0.1 for identical
    accuracy."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy(F.to_date("ts").alias("dt"), "user_id").agg(
        F.count(F.lit(1)).alias("_n")
    )
    return per_user.groupBy("dt").agg(
        F.sum("_n").alias("total_events"),
        # count(user_id), not count(*): a null-user group must not
        # count as a distinct user (COUNT DISTINCT excludes nulls)
        F.count("user_id").alias("unique_users"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg("user_id", F.lit(KPI_HLL_LG_K))
        ).alias("_hll"),
    )


_BIZ_TZ = "America/New_York"


@register(
    "local_tz_daily",
    oracle=f"""
SELECT CAST((ts AT TIME ZONE 'UTC') AT TIME ZONE '{_BIZ_TZ}' AS DATE)
           AS local_dt,
       dayofweek(CAST((ts AT TIME ZONE 'UTC') AT TIME ZONE '{_BIZ_TZ}' AS DATE))
           IN (0, 6) AS is_weekend,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(24,8))), 2) AS DOUBLE)
           AS total_value
FROM events
GROUP BY 1, 2
""",
)
def local_tz_daily(spark, sf_dir):
    """Business-timezone daily rollup: events grouped by their
    New-York-local calendar date (a UTC event at 03:30 belongs to the
    PREVIOUS local day) with a weekend flag. Both sides use a
    session-timezone-independent spelling — Spark's
    ``from_utc_timestamp`` and DuckDB's explicit
    ``(ts AT TIME ZONE 'UTC') AT TIME ZONE tz`` chain — over the same
    IANA zone; January dates sit in constant EST, no DST edge in the
    data (the operator itself handles DST via the IANA rules)."""
    e = load_table(spark, sf_dir, "events")
    local = F.from_utc_timestamp("ts", _BIZ_TZ)
    local_dt = F.to_date(local)
    # DuckDB dayofweek: 0=Sunday..6=Saturday; Spark dayofweek: 1=Sunday..7
    is_weekend = F.dayofweek(local_dt).isin(1, 7)
    return (
        e.groupBy(local_dt.alias("local_dt"), is_weekend.alias("is_weekend"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum_round2("value").alias("total_value"),
        )
    )
