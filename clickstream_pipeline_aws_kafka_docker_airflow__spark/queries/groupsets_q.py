"""Explicit GROUPING SETS (beyond CUBE) and a conditional market-share
aggregation (TPC-H Q8 shape)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..io import load_table
from ..registry import register

# {gid}: Spark spells the multi-column bitmask `grouping_id(...)`,
# DuckDB `GROUPING(...)` — same MSB-first bitmask either way.
# {src}: table name — a private temp-view name on the Spark side so we
# never clobber session state the (driver-owned) session may hold.
_GS_SQL = """
SELECT event_type, CAST(ts AS DATE) AS dt,
       CAST({gid}(event_type, CAST(ts AS DATE)) AS BIGINT) AS gid,
       COUNT(*) AS n,
       COUNT(DISTINCT user_id) AS n_users
FROM {src}
GROUP BY GROUPING SETS ((event_type), (CAST(ts AS DATE)), ())
HAVING COUNT(*) > 0
"""
# HAVING COUNT(*) > 0 pins the witnessed-groups semantics: on an EMPTY
# input, standard SQL (DuckDB) still emits the () grand-total row
# (n=0) while Spark's Expand produces no rows at all. Every group over
# non-empty input has n >= 1, so the clause is a no-op except on that
# engine-divergent empty-input row.


@register(
    "kpi_grouping_sets", oracle=_GS_SQL.format(gid="GROUPING", src="events")
)
def kpi_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS — the two marginals and the grand total
    WITHOUT the (event_type, dt) cross cells a CUBE would add. Spark's
    DataFrame API has cube/rollup only, so this goes through Spark SQL —
    the same Catalyst Expand node either way."""
    view = "__cs_engine_events_gs"
    load_table(spark, sf_dir, "events").createOrReplaceTempView(view)
    return spark.sql(_GS_SQL.format(gid="grouping_id", src=view))


@register(
    "q8_market_share",
    oracle="""
WITH rev AS (
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           n.n_name AS supp_nation,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(24,8))) AS DECIMAL(38,8)) AS volume
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY 1, 2
)
SELECT o_year,
       ROUND(CAST(SUM(CASE WHEN supp_nation = 'CHINA' THEN volume
                           ELSE CAST(0 AS DECIMAL(38,8)) END)
                  / SUM(volume) AS DOUBLE), 6) AS mkt_share
FROM rev
GROUP BY o_year
""",
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: a nation's share of yearly trade volume.
    Both the numerator and denominator accumulate in DECIMAL (exact,
    order-independent); the single final division happens on identical
    decimals, so the 6-dp rounding cannot flip across engines."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            F.col("n_name").alias("supp_nation"),
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(24,8)"
                )
            )
            .cast("decimal(38,8)")
            .alias("volume")
        )
    )
    china = F.when(
        F.col("supp_nation") == "CHINA", F.col("volume")
    ).otherwise(F.lit(0).cast("decimal(38,8)"))
    return rev.groupBy("o_year").agg(
        F.round(
            # try_divide: a year whose total volume is exactly 0
            # (hostile data) must yield NULL like DuckDB's division,
            # not an ANSI DIVIDE_BY_ZERO — the q14 class the r9 fuzz
            # campaign caught (seed 202); decimal/decimal division is
            # the throwing case on this build
            F.try_divide(F.sum(china), F.sum("volume")).cast("double"), 6
        ).alias("mkt_share")
    )
