"""Synthetic clickstream event generator (gen_synthetic_events).

Reproduces the distributions of the reference producer
(``/root/reference/kafka/producer/produce_events.py:23-45``):

* ``event_type`` weighted 0.75/0.15/0.07/0.03 over
  page_view/add_to_cart/checkout/purchase (:29-32) — here a cumulative
  CDF ladder over one ``rand()``;
* ``price`` uniform(5,120) rounded 2dp, only on purchases, else null (:33,41);
* 2000 users, 300 SKUs, 5 pages, 4 referrers, fixed UA (:23-26,44);
* ``session_id`` a fresh UUID per event (:37) — faithfully degenerate;
* fast-forward clock: evenly spaced timestamps across
  ``[start, start+days)`` (:49-70).

Batch variant generates N events distributed (``spark.range`` — one
task per slice, no driver loop); streaming variant rides the ``rate``
source at ``rows_per_second`` like the realtime 20 ev/s mode (:97-98).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

EVENT_TYPES = ("page_view", "add_to_cart", "checkout", "purchase")
EVENT_WEIGHTS = (0.75, 0.15, 0.07, 0.03)
PAGES = ("/", "/search", "/product", "/cart", "/checkout")
REFERRERS = ("google", "email", "direct", "ads")
USER_AGENT = "Mozilla/5.0 (compatible; synthetic-load/1.0)"
N_USERS = 2000
N_SKUS = 300


def _weighted_choice(r: Column, values: tuple[str, ...], weights: tuple[float, ...]) -> Column:
    """Cumulative-CDF ladder over one uniform draw — the declarative
    equivalent of ``random.choices(values, weights)``."""
    expr = None
    cum = 0.0
    for v, w in zip(values[:-1], weights[:-1]):
        cum += w
        expr = (F.when(r < cum, v) if expr is None else expr.when(r < cum, v))
    return expr.otherwise(values[-1])


def _uniform_pick(r: Column, values: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (r * len(values)).cast("int") + 1)


_PURCHASE_CDF = 1.0 - EVENT_WEIGHTS[-1]  # r >= 0.97 -> purchase


def _events_from(base: DataFrame, ts: Column) -> DataFrame:
    """Project event columns from a base frame.

    The uniform draws are materialized as columns FIRST: Spark does not
    deduplicate nondeterministic expressions, so referencing ``rand()``
    twice inside a when-ladder would redraw per branch and skew the
    distribution (the bug our distribution test catches).
    """
    drawn = base.select(
        ts.alias("_ts"),
        F.rand().alias("_r_type"),
        F.rand().alias("_r_user"),
        F.rand().alias("_r_page"),
        F.rand().alias("_r_sku"),
        F.rand().alias("_r_ref"),
        F.rand().alias("_r_price"),
    )
    return drawn.select(
        F.date_format("_ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").alias("event_ts"),
        F.concat(
            F.lit("u_"), ((F.col("_r_user") * N_USERS).cast("int") + 1).cast("string")
        ).alias("user_id"),
        F.expr("uuid()").alias("session_id"),
        _weighted_choice(F.col("_r_type"), EVENT_TYPES, EVENT_WEIGHTS).alias(
            "event_type"
        ),
        _uniform_pick(F.col("_r_page"), PAGES).alias("page"),
        F.concat(
            F.lit("sku_"), ((F.col("_r_sku") * N_SKUS).cast("int") + 1).cast("string")
        ).alias("product_id"),
        # price iff the same draw classified this row as a purchase
        F.when(
            F.col("_r_type") >= _PURCHASE_CDF,
            F.round(F.col("_r_price") * 115 + 5, 2),
        ).alias("price"),
        F.lit("USD").alias("currency"),
        _uniform_pick(F.col("_r_ref"), REFERRERS).alias("referrer"),
        F.lit(USER_AGENT).alias("user_agent"),
    )


def generate_events_batch(
    spark: SparkSession,
    n_events: int,
    start_date: str = "2025-09-01",
    days: int = 7,
    num_partitions: int | None = None,
) -> DataFrame:
    """Fast-forward backfill: ``n_events`` evenly spaced across the
    window, mirroring ``sim_timestamps`` (produce_events.py:49-70)."""
    step_us = int(days * 86_400_000_000 / max(n_events, 1))
    base = spark.range(
        0, n_events, 1, num_partitions or spark.sparkContext.defaultParallelism
    )
    ts = F.timestamp_micros(
        F.unix_micros(F.lit(start_date).cast("timestamp")) + F.col("id") * step_us
    )
    return _events_from(base, ts)


def generate_events_stream(
    spark: SparkSession, rows_per_second: int = 20, num_partitions: int = 1
) -> DataFrame:
    """Realtime mode: the ``rate`` source replaces the 50 ms sleep loop
    (produce_events.py:97-98); each micro-batch row becomes one event
    stamped with the rate-source timestamp."""
    base = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .option("numPartitions", num_partitions)
        .load()
    )
    return _events_from(base, F.col("timestamp"))
