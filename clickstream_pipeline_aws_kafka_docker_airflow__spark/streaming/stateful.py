"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the escape hatch for semantics the built-in windowed/session aggs can't
express (SURVEY.md custom-operator rule (b)).

Example operator: per-user running totals with an inactivity timeout —
every micro-batch updates (n_events, total_value) per user and emits
the running value; state for idle users is dropped after the timeout so
the state store stays bounded (the discipline that separates a 100 TB
stream from an OOM).

The state closure is self-contained (no package references) so
cloudpickle ships it by value to executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def running_user_totals(
    events: DataFrame,
    timeout_ms: int = 30 * 60 * 1000,
    user: str = "user_id",
    value: str = "value",
) -> DataFrame:
    """Streaming per-user running (count, sum) with processing-time
    state expiry. Emits one row per user per micro-batch in which the
    user appeared."""

    def _update(key, pdfs, state):
        import pandas as _pd

        (uid,) = key
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        state.setTimeoutDuration(timeout_ms)
        yield _pd.DataFrame(
            {"user_id": [uid], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return (
        events.selectExpr(f"{user} AS user_id", f"{value} AS value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
