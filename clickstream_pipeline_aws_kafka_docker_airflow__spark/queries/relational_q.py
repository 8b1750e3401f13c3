"""Relational queries (ext_relational) over the driver star schema:
multi-way joins, semi/anti joins, ranking, TPC-H-style aggregations.

Not present in the reference (SURVEY.md §2.3: its entire surface is
scan->parse->project->filter->groupBy->sink); these exercise Catalyst's
join selection. Scale notes per query; the common rule: only BOUNDED
tables (region/nation — fixed 5/25 rows at every scale factor — and
single-row stat frames) carry an explicit ``broadcast()`` hint.
Customer/supplier/part GROW with the corpus, so their joins stay
ESTIMATE-DRIVEN: the planner (and AQE, with the true runtime size)
broadcasts them while they fit under autoBroadcastJoinThreshold and
flips to a shuffle join when they outgrow it — a forced hint would
override that only safety valve (measured: a forced 10x-customer
broadcast OOMs a memory-constrained executor where the estimate-driven
plan completes; docs/PROBE_MEMORY.json). Fact-fact joins
(orders⋈lineitem) shuffle-hash on the order key.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from ..functions.scalars import dec_avg_trunc4, dec_avg_trunc4_sql, dec_sum_round2
from ..io import load_table
from ..registry import register

# DuckDB twin of scalars.dec_sum_round2 — exact, order-independent sum
def _dec_sum2(x: str) -> str:
    return f"CAST(ROUND(SUM(CAST({x} AS DECIMAL(24,8))), 2) AS DOUBLE)"


_REV_SQL = _dec_sum2("l_extendedprice * (1 - l_discount)")


@register(
    "q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {_dec_sum2("l_quantity")} AS sum_qty,
       {_dec_sum2("l_extendedprice")} AS sum_base_price,
       {_REV_SQL} AS sum_disc_price,
       {_dec_sum2("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
       {dec_avg_trunc4_sql("l_quantity", "duckdb")} AS avg_qty,
       {dec_avg_trunc4_sql("l_extendedprice", "duckdb")} AS avg_price,
       {dec_avg_trunc4_sql("l_discount", "duckdb")} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: single-pass wide aggregation over the fact table.
    Scan reads only the 7 needed columns (column pruning) and the
    shipdate predicate pushes to parquet; one shuffle on a 6-value key."""
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum_round2("l_quantity").alias("sum_qty"),
            dec_sum_round2("l_extendedprice").alias("sum_base_price"),
            dec_sum_round2(disc_price).alias("sum_disc_price"),
            dec_sum_round2(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            dec_avg_trunc4("l_quantity").alias("avg_qty"),
            dec_avg_trunc4("l_extendedprice").alias("avg_price"),
            dec_avg_trunc4("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
SELECT l.l_orderkey AS l_orderkey,
       o.o_orderdate AS o_orderdate,
       {_dec_sum2("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1996-03-15'
  AND l.l_shipdate > TIMESTAMP '1996-03-15'
GROUP BY 1, 2
""",
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: dim⋈fact⋈fact. customer (filtered) broadcasts;
    orders⋈lineitem shuffles on the order key; the groupBy reuses that
    same key partitioning so no extra exchange."""
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1996-03-15").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    )
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            dec_sum_round2(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
SELECT n.n_name AS n_name,
       {_dec_sum2("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1
""",
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: 6-way join. All dims broadcast (region, nation,
    supplier, customer); the only shuffle join is orders⋈lineitem on the
    order key. Per-nation group key has 25 values -> AQE coalesces the
    final tiny shuffle."""
    t = {n: load_table(spark, sf_dir, n) for n in
         ("customer", "orders", "lineitem", "supplier", "nation", "region")}
    o = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    r = t["region"].where(F.col("r_name") == "ASIA")
    return (
        t["lineitem"]
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            dec_sum_round2(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


@register(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
""",
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS with a compound (equi + inequality)
    condition, decorrelated through a per-key rollup. ``EXISTS(l WHERE
    l_orderkey = o AND l_shipdate > o_orderdate)`` is exactly
    ``MAX(l_shipdate) OVER the order's lineitems > o_orderdate`` (MAX
    ignores NULL shipdates; an all-NULL group yields NULL and ``NULL >
    x`` is never true — the same rows the semi join's NULL-never-
    matches drops). The rollup shrinks lineitem to order cardinality
    WITH map-side partial aggregation before any join, so the join
    input is ~4x smaller at every scale. It also removes a measured
    serialization point: the naive left-semi formulation at sf1 sat
    just under the 64 MB broadcast threshold and spent its whole wall
    single-threaded in the driver's 6M-row HashedRelation build — flat
    from 4 to 32 cores in docs/SCALING_CURVE.json (3.2 s at any core
    count); the rollup form is 3.4x faster at 32 cores and actually
    scales."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    last_ship = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("max_shipdate"))
    )
    return (
        o.join(
            last_ship,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("max_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "semi_anti_customers",
    oracle="""
SELECT c_mktsegment AS c_mktsegment, cohort, COUNT(*) AS n_customers
FROM (
    SELECT c.c_mktsegment,
           CASE WHEN EXISTS (SELECT 1 FROM orders o
                             WHERE o.o_custkey = c.c_custkey
                               AND o.o_totalprice > 400000)
                THEN 'with_big_order' ELSE 'no_big_order' END AS cohort
    FROM customer c
)
GROUP BY 1, 2
""",
)
def semi_anti_customers(spark, sf_dir):
    """Explicit left-semi + left-anti joins (ext_relational), same
    result as EXISTS/NOT EXISTS partitioning of customers."""
    c = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    cond = F.col("o_custkey") == F.col("c_custkey")

    def _side(join_type, tag):
        return (
            c.join(big, cond, join_type)
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_customers"))
            .select("c_mktsegment", F.lit(tag).alias("cohort"), "n_customers")
        )

    return _side("left_semi", "with_big_order").unionAll(
        _side("left_anti", "no_big_order")
    )


@register(
    "q17_small_quantity",
    oracle="""
SELECT ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(24,8))) AS DOUBLE)
             / CAST(7 AS DOUBLE), 2) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND 5 * CAST(ROUND(l.l_quantity * 100) AS BIGINT)
        * (SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
      < (SELECT SUM(CAST(ROUND(l2.l_quantity * 100) AS BIGINT))
         FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
""",
)
def q17_small_quantity(spark, sf_dir):
    """TPC-H Q17 shape: correlated scalar subquery (quantity below 20%%
    of the part's average). The oracle keeps the correlated form; the
    Spark plan IS the decorrelated rewrite — one per-part aggregate
    joined back, which is what any optimizer produces. The threshold
    compares in exact integer space (quantities scaled x100) so the
    inequality cannot flip on a float ulp between engines."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    q100 = F.round(F.col("l_quantity") * 100).cast("bigint")
    stats = l.groupBy(F.col("l_partkey").alias("s_partkey")).agg(
        F.sum(q100).alias("sum100"), F.count(F.lit(1)).alias("cnt")
    )
    return (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(stats, F.col("s_partkey") == F.col("l_partkey"))
        .where(5 * q100 * F.col("cnt") < F.col("sum100"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(24,8)")).cast("double")
                / F.lit(7).cast("double"),
                2,
            ).alias("avg_yearly")
        )
    )


@register(
    "topn_parts_per_brand",
    oracle="""
SELECT p_brand, p_partkey, p_retailprice,
       CAST(rn AS BIGINT) AS rn
FROM (
    SELECT p_brand, p_partkey, p_retailprice,
           ROW_NUMBER() OVER (PARTITION BY p_brand
                              ORDER BY p_retailprice DESC, p_partkey) AS rn
    FROM part
)
WHERE rn <= 3
""",
)
def topn_parts_per_brand(spark, sf_dir):
    """ext_rank_topn: top-3 per group via row_number with a
    deterministic tiebreak. Scale note: rank-then-filter shuffles once
    on the partition key; for huge groups, pre-aggregate a per-partition
    top-N before the window to bound state (Spark does this itself via
    WindowGroupLimit pushdown for rank<=k filters)."""
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        p.select(
            "p_brand",
            "p_partkey",
            "p_retailprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )
