#!/usr/bin/env python
"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full computation, no
driver-side collect skew), timed as min of N_RUNS passes after a JVM/scan
warmup pass.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from clickstream_pipeline_aws_kafka_docker_airflow__spark import registry
from clickstream_pipeline_aws_kafka_docker_airflow__spark.session import get_spark

N_RUNS = 2


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark(app_name="bench")
    qs = registry.queries()

    # Warmup: JVM, codegen, file listing (not counted).
    _force(qs["kpi_daily"](spark, sf_dir))

    # Per-query error isolation: one broken query records an "err" entry
    # and the artifact still emits — a crash must never void the run.
    # Rounds are interleaved (full pass, then repeat, min across
    # passes): transient slow windows hit consecutive queries, so
    # back-to-back repeats can both land in one; interleaving puts a
    # query's samples minutes apart and the min shakes the window out.
    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    for _ in range(N_RUNS):
        for name in sorted(qs):
            if name in errors:
                continue
            try:
                t0 = time.perf_counter()
                _force(qs[name](spark, sf_dir))
                t = time.perf_counter() - t0
            except Exception as ex:  # noqa: BLE001 — isolate, record, continue
                errors[name] = f"{type(ex).__name__}: {str(ex).splitlines()[0][:200]}"
                times.pop(name, None)
                continue
            times[name] = round(min(times.get(name, float("inf")), t), 4)

    total = round(sum(times.values()), 4)
    out = {
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
