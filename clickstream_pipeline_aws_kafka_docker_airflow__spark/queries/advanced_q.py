"""Advanced relational surface: as-of join, cube/grouping sets, the
window-function family, and deeper TPC-H shapes (Q18/Q7)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from ..io import load_table
from ..functions.scalars import dec_sum_round2
from ..operators.asof import asof_join
from ..registry import register


@register(
    "asof_last_purchase",
    oracle="""
WITH views AS (
    SELECT event_id, user_id, ts FROM events
    WHERE lower(coalesce(event_type,'')) = 'view'
), purchases AS (
    -- NULL key/ts rows can never be an as-of match (standard
    -- inequality semantics); DuckDB's ASOF implementation would
    -- otherwise sort a NULL timestamp LAST and match it as
    -- greater-than-everything, so the no-match rule is spelled
    -- explicitly on both sides
    SELECT user_id, ts, MAX(value) AS pvalue
    FROM events WHERE lower(coalesce(event_type,'')) = 'purchase'
      AND user_id IS NOT NULL AND ts IS NOT NULL
    GROUP BY user_id, ts
)
SELECT v.event_id, v.user_id, p.pvalue AS asof_pvalue
FROM (SELECT * FROM views WHERE ts IS NOT NULL) v
ASOF LEFT JOIN purchases p
  ON v.user_id = p.user_id AND v.ts >= p.ts
UNION ALL
SELECT event_id, user_id, NULL AS asof_pvalue
FROM views WHERE ts IS NULL
""",
)
def asof_last_purchase(spark, sf_dir):
    """As-of join: each view event annotated with the user's most
    recent at-or-before purchase value (NULL key/timestamp never
    matches — operators/asof.py). Oracle uses DuckDB's native ASOF
    JOIN with the NULL no-match rule spelled explicitly (DuckDB's own
    ASOF sorts NULL timestamps last and would match them to the
    LATEST right row); Spark side is the union/last-carry
    composition."""
    e = load_table(spark, sf_dir, "events")
    etype = F.lower(F.coalesce("event_type", F.lit("")))
    views = e.where(etype == "view").select("event_id", "user_id", "ts")
    purchases = (
        e.where(etype == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pvalue"))
    )
    return asof_join(
        views, purchases, key="user_id", left_ts="ts", right_ts="ts",
        value_cols=["pvalue"],
    ).select("event_id", "user_id", F.col("asof_pvalue"))


@register(
    "kpi_cube",
    oracle="""
SELECT event_type, CAST(ts AS DATE) AS dt,
       CAST(GROUPING(event_type, CAST(ts AS DATE)) AS BIGINT) AS gid,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(24,8))), 2) AS DOUBLE) AS total_value
FROM events
GROUP BY CUBE(event_type, CAST(ts AS DATE))
-- witnessed groups only: on EMPTY input standard SQL still emits the
-- () grand-total row (n=0) while Spark's cube() emits nothing; every
-- group over non-empty input has n >= 1, so this is a no-op otherwise
HAVING COUNT(*) > 0
""",
)
def kpi_cube(spark, sf_dir):
    """CUBE over (event_type, day): all four grouping sets in one pass,
    disambiguated by grouping_id (same MSB-first bitmask as DuckDB's
    GROUPING). The reference computes only the (day) slice; the cube
    generalizes it to every marginal."""
    e = load_table(spark, sf_dir, "events")
    dt = F.to_date("ts").alias("dt")
    return (
        e.cube(F.col("event_type"), dt)
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            dec_sum_round2("value").alias("total_value"),
        )
    )


@register(
    "window_funcs_suite",
    oracle="""
SELECT o_orderkey,
       CAST(ROW_NUMBER() OVER seq AS BIGINT) AS seq_no,
       CAST(RANK() OVER price_band AS BIGINT) AS price_rank,
       CAST(DENSE_RANK() OVER price_band AS BIGINT) AS price_dense_rank,
       CAST(NTILE(4) OVER seq AS BIGINT) AS quartile,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate ASC NULLS FIRST, o_orderkey
                                     ROWS UNBOUNDED PRECEDING), 2) AS running_spend,
       ROUND(PERCENT_RANK() OVER seq, 4) AS pct_rank,
       CAST(date_diff('day', o_orderdate,
                      LEAD(o_orderdate) OVER seq) AS BIGINT) AS days_to_next
FROM orders
WINDOW seq AS (PARTITION BY o_custkey
               ORDER BY o_orderdate ASC NULLS FIRST, o_orderkey),
       price_band AS (PARTITION BY o_custkey ORDER BY CAST(floor(o_totalprice / 100000) AS BIGINT) DESC)
""",
)
def window_funcs_suite(spark, sf_dir):
    """The analytic-function family in one deterministic query:
    row_number / rank / dense_rank (with real ties via price banding) /
    ntile / running sum / percent_rank / lead.

    NULL placement is pinned explicitly (unknown-date orders sort
    FIRST) because the engines' defaults disagree: Spark ASC is
    nulls-first, DuckDB ASC is nulls-last — invisible on NULL-free
    generated data, row-scrambling on a real corpus. The DESC band
    window needs no pin (both engines default DESC to nulls-last)."""
    o = load_table(spark, sf_dir, "orders")
    seq = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc_nulls_first(), "o_orderkey"
    )
    band = Window.partitionBy("o_custkey").orderBy(
        F.floor(F.col("o_totalprice") / 100000).cast("bigint").desc()
    )
    run = seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_orderkey",
        F.row_number().over(seq).cast("bigint").alias("seq_no"),
        F.rank().over(band).cast("bigint").alias("price_rank"),
        F.dense_rank().over(band).cast("bigint").alias("price_dense_rank"),
        F.ntile(4).over(seq).cast("bigint").alias("quartile"),
        F.round(F.sum("o_totalprice").over(run), 2).alias("running_spend"),
        F.round(F.percent_rank().over(seq), 4).alias("pct_rank"),
        F.datediff(F.lead("o_orderdate").over(seq), F.col("o_orderdate"))
        .cast("bigint")
        .alias("days_to_next"),
    )


@register(
    "q18_large_orders",
    oracle="""
SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       CAST(ROUND(s.sum_qty, 2) AS DOUBLE) AS sum_qty
FROM (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(24,8))) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(24,8))) > 300) s
JOIN orders o ON o.o_orderkey = s.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
""",
)
def q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: aggregate-then-having as a semi-filter, then
    enrich. The heavy groupBy runs on lineitem's order key; customer
    broadcasts; orders joins the (small) surviving set."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(24,8)")).alias("_q"))
        .where(F.col("_q") > 300)
        .select("l_orderkey", F.round("_q", 2).cast("double").alias("sum_qty"))
    )
    return (
        s.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select("c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
    )


@register(
    "q7_nation_volume",
    oracle="""
SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(24,8))), 2) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
WHERE ((n1.n_name = 'NATION_6' AND n2.n_name = 'NATION_9')
    OR (n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_6'))
GROUP BY 1, 2, 3
""",
)
def q7_nation_volume(spark, sf_dir):
    """TPC-H Q7 shape: bi-directional nation-pair trade volume by ship
    year. Both nation dims broadcast under different aliases."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("cust_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    # nation-pair literals exist in the driver testdata (names are
    # NATION_<k>) so the 6-way join path is actually exercised — the
    # original TPC-H FRANCE/GERMANY pair matched zero rows there
    pair = (
        (F.col("cust_nation") == "NATION_6") & (F.col("supp_nation") == "NATION_9")
    ) | ((F.col("cust_nation") == "NATION_9") & (F.col("supp_nation") == "NATION_6"))
    return (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(broadcast(n1), F.col("n1_key") == F.col("c_nationkey"))
        .join(broadcast(n2), F.col("n2_key") == F.col("s_nationkey"))
        .where(pair)
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            dec_sum_round2(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )
