"""Streaming observability: a query-progress listener that captures
per-micro-batch metrics (input rows, processed rows/sec, batch
duration, state size) — the engine-side replacement for the operational
visibility the reference got from Airflow task logs
(``ingest_clickstream_to_s3.py``'s print statements and the
``ingest_healthcheck`` DAG).

The freshness healthcheck (:mod:`streaming.healthcheck`) answers "did
data land recently?" from the OUTSIDE (file mtimes); this listener
answers "what is each query doing?" from the INSIDE (throughput,
backlog, state growth) — the two signals a pager needs to separate
"no data arriving" from "query falling behind".
"""

from __future__ import annotations

import json
import threading

from pyspark.sql.streaming import StreamingQueryListener


class ProgressLog(StreamingQueryListener):
    """Collect progress events in memory and optionally append them as
    JSONL (one object per micro-batch) for later analysis — the
    metrics zone next to the data zones.

    Thread-safe: listener callbacks fire on Spark's listener bus
    thread while the driver thread reads ``snapshot()``.
    """

    #: In-memory window: a long-running query at the reference's 60 s
    #: cadence gains ~1.4k rows/day — unbounded, the driver-side list
    #: is a slow leak over months. The JSONL file (when configured)
    #: persists EVERY row; the deque keeps only the recent window for
    #: snapshot()/totals().
    MAX_ROWS = 10_000

    def __init__(self, jsonl_path: str | None = None):
        import collections

        self._lock = threading.Lock()
        self._rows: collections.deque = collections.deque(maxlen=self.MAX_ROWS)
        self._path = jsonl_path

    # -- listener callbacks -------------------------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        row = {
            "query_id": p.get("id"),
            "name": p.get("name"),
            "batch_id": p.get("batchId"),
            "timestamp": p.get("timestamp"),
            "num_input_rows": p.get("numInputRows", 0),
            "input_rows_per_sec": p.get("inputRowsPerSecond"),
            "process_rows_per_sec": p.get("processedRowsPerSecond"),
            "batch_duration_ms": (p.get("durationMs") or {}).get(
                "triggerExecution"
            ),
            "state_rows": sum(
                (op.get("numRowsTotal") or 0)
                for op in p.get("stateOperators", [])
            ),
        }
        with self._lock:
            self._rows.append(row)
            if self._path:
                with open(self._path, "a") as f:
                    f.write(json.dumps(row) + "\n")

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # -- driver-side surface ------------------------------------------------
    def snapshot(self) -> list[dict]:
        with self._lock:
            return list(self._rows)

    def totals(self, name: str | None = None) -> dict:
        """Aggregate view per query name: batches, rows, max state."""
        rows = [
            r
            for r in self.snapshot()
            if name is None or r.get("name") == name
        ]
        return {
            "batches": len(rows),
            "input_rows": sum(r["num_input_rows"] for r in rows),
            "max_state_rows": max(
                (r["state_rows"] for r in rows), default=0
            ),
        }
