"""Stream-stream joins: click->purchase attribution.

The reference pipeline only counts purchases per day
(daily_kpis.py:118-140); the natural next question — "which click led
to this purchase?" — needs a stream-stream join, which Structured
Streaming supports with watermarks on BOTH sides plus a time-range
bound so each side's buffered state is finite.

State shape at scale: both streams shuffle on ``user_id``; each
executor buffers only rows younger than (watermark + max_gap) for its
key range, so state is O(events in the attribution horizon), not
O(stream). The left-outer variant additionally emits unmatched clicks
once the watermark passes their join horizon — the "clicks that never
converted" feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    max_gap: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
    ts_col: str = "ts",
    user: str = "user_id",
    value: str = "value",
) -> DataFrame:
    """Attribute each purchase to same-user clicks at most ``max_gap``
    before it. ``how='left_outer'`` also emits never-converted clicks
    (purchase columns null) after their horizon expires."""
    c = clicks.withWatermark(ts_col, watermark).alias("c")
    p = purchases.withWatermark(ts_col, watermark).alias("p")
    cond = (
        (F.col(f"c.{user}") == F.col(f"p.{user}"))
        & (F.col(f"p.{ts_col}") >= F.col(f"c.{ts_col}"))
        & (
            F.col(f"p.{ts_col}")
            <= F.col(f"c.{ts_col}") + F.expr(f"INTERVAL {max_gap}")
        )
    )
    return c.join(p, cond, how).select(
        F.col(f"c.{user}").alias("user_id"),
        F.col(f"c.{ts_col}").alias("click_ts"),
        F.col(f"p.{ts_col}").alias("purchase_ts"),
        F.col(f"p.{value}").alias("purchase_value"),
    )


def enrich_with_dimension(
    stream: DataFrame,
    dim: DataFrame,
    key: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment: join each micro-batch against a
    dimension table (product catalog, user attributes) with a
    broadcast hint — the streaming twin of every dim⋈fact join in the
    batch tier.

    Scale shape: the static side ships once per executor as a
    broadcast relation; the stream side keeps its partitioning (no
    shuffle) and the join adds NO state-store state — unlike
    stream-stream joins, a stream-static join is stateless, so it
    composes freely under append mode and needs no watermark. For a
    dimension too big to broadcast, drop the hint and Spark will
    shuffle the batch side per micro-batch instead.

    Freshness caveat (documented, not hidden): Spark re-evaluates the
    static side per micro-batch, but file listings resolved at query
    start may be cached — a slowly-changing dimension is picked up
    reliably only via a restart or by reading a format that
    re-resolves (e.g. an overwritten path with a consistent schema).
    """
    return stream.join(F.broadcast(dim), key, how)
