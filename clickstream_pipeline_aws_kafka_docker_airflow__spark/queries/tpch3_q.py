"""Third TPC-H wave (ext_relational): aggregate-equality scalar
subquery (Q15), anti-joined distinct-count rollup (Q16 shape), and the
double-correlated EXISTS / NOT EXISTS self-join (Q21 shape).

Adaptations to the driver schema (no ``partsupp``, no
commit/receipt dates, no comment text) are noted per query; each keeps
the plan challenge of its original. Literals verified non-vacuous on
the driver testdata at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..io import load_table
from ..registry import register

_REV_DEC = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,8))"


@register(
    "q15_top_supplier",
    oracle=f"""
WITH rev AS (
    SELECT l_suppkey AS supplier_no, SUM({_REV_DEC}) AS rd
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    GROUP BY 1
)
SELECT r.supplier_no, s.s_name,
       CAST(ROUND(rd, 2) AS DOUBLE) AS total_revenue
FROM rev r JOIN supplier s ON s.s_suppkey = r.supplier_no
WHERE rd = (SELECT MAX(rd) FROM rev)
""",
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15: supplier(s) whose quarterly revenue equals the
    maximum. The revenue totals are EXACT decimals (per-addend cast,
    exact sum), so the equality against MAX is deterministic across
    engines — the double-rounding happens only on output.

    Scale: one shuffle (supplier rollup); the max is a one-row
    broadcast; supplier dim broadcasts. Ties return every tied
    supplier on both engines, identically.

    The rollup is PINNED (r11): the supplier equi-join infers
    ``isnotnull(l_suppkey)`` and pushes it through the aggregation into
    the join branch's scan copy only — the MAX branch's copy stays
    unfiltered (its NULL-suppkey group must stay in the MAX, matching
    the oracle), so the two subtrees canonicalize differently and AQE
    exchange reuse can NOT fire (measured: two full lineitem scans in
    the final plan, 6 warm jobs). The pin makes the rollup compute once
    — 4 warm jobs, one fact pass; bounded by |suppliers| rows (the
    rfm_segments entity-rollup pin class, tests/test_cache_census.py).
    """
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = (
        l.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(F.expr(_REV_DEC)).alias("rd"))
        .persist()
    )
    mx = rev.agg(F.max("rd").alias("mx"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(broadcast(mx))
        .where(F.col("rd") == F.col("mx"))
        .join(s, F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "supplier_no",
            "s_name",
            F.round("rd", 2).cast("double").alias("total_revenue"),
        )
    )


Q16_SIZES = (1, 5, 9, 13, 17, 21, 25)


@register(
    "q16_supplier_variety",
    oracle=f"""
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_size IN {Q16_SIZES}
  AND l.l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY 1, 2, 3
""",
)
def q16_supplier_variety(spark, sf_dir):
    """TPC-H Q16 shape (adapted: supplier-part pairs come from
    ``lineitem`` instead of the absent ``partsupp``; the
    customer-complaint exclusion becomes negative account balance):
    how many distinct suppliers can serve each (brand, type, size)
    bucket, excluding flagged suppliers.

    Scale: the filtered part dim and the (tiny) exclusion list both
    broadcast — the NOT IN is a broadcast anti-join, never a shuffle;
    the distinct-count shuffles once on the rollup key.
    """
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(*Q16_SIZES)
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(
            bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q21_LATE_DAYS = 60


@register(
    "q21_waiting_supplier",
    oracle=f"""
WITH late AS (
    SELECT l.l_orderkey, l.l_suppkey
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l.l_shipdate > o.o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
)
SELECT s.s_name, COUNT(*) AS numwait
FROM late l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY 1
""",
)
def q21_waiting_supplier(spark, sf_dir):
    """TPC-H Q21 shape (adapted: "kept the order waiting" = shipped
    more than {Q21_LATE_DAYS} days after the order date — the driver
    schema has no commit/receipt dates): per supplier, count finalized
    multi-supplier orders where it was the ONLY late shipper.

    The double correlation (EXISTS on the raw lines, NOT EXISTS on the
    late lines) is DECORRELATED into per-order aggregates instead of a
    semi + anti self-join pair: a qualifying late line is exactly a
    non-NULL-supplier late line in an order with >= 2 distinct
    suppliers overall (min != max over the order's suppliers) and
    exactly 1 distinct late supplier (min == max over its late
    suppliers). NULL equivalence with the correlated form:
    ``l2.l_suppkey <> l1.l_suppkey`` is NULL (never true) when either
    side is NULL, so NULL-supplier late lines can't qualify,
    NULL-supplier raw lines can't witness the EXISTS, and NULL-supplier
    late lines can't block the NOT EXISTS — all three rules fall out of
    min/max NULL-skipping plus the isNotNull pre-filter. Raced against
    the correlated DuckDB oracle by the TPC-H fuzz (NULL supp keys, hot
    orders).

    Scale: one shuffle of the fact table (the per-order min/max
    supplier rollup — a plain hash aggregate with map-side partials,
    no countDistinct expand) replaces the two self-join legs; the late
    rollup shuffles only late lines; the order-level join is between
    two per-order aggregates, and supplier broadcasts into the
    dim-sized final rollup.
    """
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    l = load_table(spark, sf_dir, "lineitem")
    late = (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {Q21_LATE_DAYS} DAY")
        )
        .where(F.col("l_suppkey").isNotNull())
        .select("l_orderkey", "l_suppkey")
    )
    # "exactly 1 distinct" and ">= 2 distinct" as min/max equality over
    # the NULL-skipping extrema — plain hash aggregates with map-side
    # partials, no countDistinct expand/double-shuffle
    late_agg = late.groupBy("l_orderkey").agg(
        F.min("l_suppkey").alias("late_supp"),
        F.max("l_suppkey").alias("_mx"),
        F.count(F.lit(1)).alias("n_late_lines"),
    )
    order_supps = l.groupBy(F.col("l_orderkey").alias("o_key")).agg(
        F.min("l_suppkey").alias("_omn"), F.max("l_suppkey").alias("_omx")
    )
    sole_late = (
        late_agg.where(F.col("late_supp") == F.col("_mx"))
        .join(order_supps, F.col("l_orderkey") == F.col("o_key"))
        .where(F.col("_omn") != F.col("_omx"))
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        sole_late.join(s, F.col("s_suppkey") == F.col("late_supp"))
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").cast("bigint").alias("numwait"))
    )
