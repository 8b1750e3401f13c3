"""Arbitrary stateful streaming with ``transformWithStateInPandas`` —
Spark 4's StatefulProcessor API (state-v2), the successor of the
``applyInPandasWithState`` operator in ``streaming/stateful.py``.

What v2 buys over v1 at scale: typed named state variables (value /
list / map) instead of one opaque tuple, per-state-variable TTL
enforced BY THE STORE (v1 expiry runs user code per idle key per
batch; v2 eviction is a store-side sweep, so millions of idle users
cost nothing per batch), and timers decoupled from state.

Example operator: a streaming user-profile store — per user, lifetime
event count, decimal-exact spend, first/last seen — the online twin of
the batch ``rfm_segments`` rollup (queries/funnel_q.py). TTL bounds
the profile store to recently-active users, which is what makes a
per-user state store viable when the key universe grows unboundedly.

Runtime dependency: the state-v2 Python runner speaks protobuf to the
JVM state server (``pyspark/sql/streaming/proto``), so this operator
needs ``google.protobuf`` at runtime. Environments without it (like
this container) keep the ``applyInPandasWithState`` operator in
``streaming/stateful.py`` as the working stateful path; the test gates
on the import accordingly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

PROFILE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_spend", DoubleType()),
        StructField("first_seen_us", LongType()),
        StructField("last_seen_us", LongType()),
    ]
)

_STATE_SCHEMA = (
    "n LONG, spend_c LONG, first_us LONG, last_us LONG"
)  # spend in integer cents -> order/replay deterministic


def _make_processor(ttl_ms: int | None):
    """Build the StatefulProcessor INSIDE a function so cloudpickle
    serializes the class by value: the state-v2 runner is a fresh
    Python process launched by the JVM that does not share the
    driver's sys.path, so a module-level class (pickled by reference)
    dies with ModuleNotFoundError there."""

    class UserProfileProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._profile = handle.getValueState(
                "profile", _STATE_SCHEMA, ttlDurationMs=ttl_ms
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as _pd

            (uid,) = key
            cur = self._profile.get()
            n, spend_c, first_us, last_us = (
                cur if cur else (0, 0, None, None)
            )
            for pdf in rows:
                n += len(pdf)
                # accumulate in integer cents: float summation order
                # cannot drift the stored state across replays
                spend_c += int(
                    round(float(pdf["value"].fillna(0.0).sum()) * 100)
                )
                # dropna BEFORE the int64 view: pandas 2.x converts
                # NaT to INT64_MIN instead of raising, and one NULL ts
                # would poison first_seen_us through min() forever —
                # the stored state can never recover from a sentinel.
                ts = pdf["ts"].dropna()
                if len(ts):
                    ts_us = (ts.astype("int64") // 1000).astype("int64")
                    lo, hi = int(ts_us.min()), int(ts_us.max())
                    first_us = lo if first_us is None else min(first_us, lo)
                    last_us = hi if last_us is None else max(last_us, hi)
            self._profile.update((n, spend_c, first_us, last_us))
            yield _pd.DataFrame(
                {
                    "user_id": [uid],
                    "n_events": [n],
                    "total_spend": [spend_c / 100.0],
                    "first_seen_us": [first_us],
                    "last_seen_us": [last_us],
                }
            )

        def close(self) -> None:
            pass

    return UserProfileProcessor()


def streaming_user_profiles(
    events: DataFrame,
    ttl_ms: int | None = None,
    user: str = "user_id",
    value: str = "value",
    ts: str = "ts",
) -> DataFrame:
    """Emit the updated per-user profile for every user a micro-batch
    touches. ``ttl_ms`` bounds the store to recently-active users."""
    return (
        events.selectExpr(
            f"{user} AS user_id",
            f"CAST({value} AS DOUBLE) AS value",
            f"{ts} AS ts",
        )
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_make_processor(ttl_ms),
            outputStructType=PROFILE_SCHEMA,
            outputMode="update",
            timeMode="processingTime" if ttl_ms else "none",
        )
    )
