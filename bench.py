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
    # targeted profiling: SPARK_GRAFT_BENCH_ONLY=q1,q8 runs a subset
    # (the self-report artifact is suppressed so a partial run can
    # never masquerade as a round record)
    only = {n for n in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",") if n}
    if only:
        unknown = sorted(only - set(qs))
        if unknown:
            # mirror scripts/dtype_audit.py's AUDIT_ONLY: name typos exit
            # with a message before any Spark work, not a bare KeyError
            print(
                f"SPARK_GRAFT_BENCH_ONLY: unknown queries {unknown}; "
                f"known names: {sorted(qs)[:8]}...",
                file=sys.stderr,
            )
            sys.exit(2)
        qs = {n: qs[n] for n in only}

    # Warmup: JVM, codegen, file listing (not counted).
    _force(registry.queries()["kpi_daily"](spark, sf_dir))

    # Per-query error isolation: one broken query records an "err" entry
    # and the artifact still emits — a crash must never void the run.
    # Rounds are interleaved (full pass, then repeat, min across
    # passes): transient slow windows hit consecutive queries, so
    # back-to-back repeats can both land in one; interleaving puts a
    # query's samples minutes apart and the min shakes the window out.
    times: dict[str, float] = {}
    jobs: dict[str, int] = {}
    errors: dict[str, str] = {}
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    for i in range(N_RUNS):
        for name in sorted(qs):
            if name in errors:
                continue
            group = f"bench:{name}:{i}"
            sc.setJobGroup(group, name)
            try:
                t0 = time.perf_counter()
                _force(qs[name](spark, sf_dir))
                t = time.perf_counter() - t0
            except Exception as ex:  # noqa: BLE001 — isolate, record, continue
                errors[name] = f"{type(ex).__name__}: {str(ex).splitlines()[0][:200]}"
                times.pop(name, None)
                jobs.pop(name, None)
                continue
            finally:
                sc._jsc.sc().clearJobGroup()
            times[name] = round(min(times.get(name, float("inf")), t), 4)
            # warm-path job count (min across passes): with a ~0.2 s
            # fixed cost per local job, job count IS the local cost
            # model — recorded so regressions show up as integers, not
            # as noise-prone wall-clock drift
            n_jobs = len(tracker.getJobIdsForGroup(group) or [])
            jobs[name] = min(jobs.get(name, 1 << 30), n_jobs)

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

    # Self-reported per-round artifact: the same numbers plus per-query
    # job counts, written where the driver's truncated stdout tail
    # can't lose them. Round index = next after the committed BENCH_r*.
    here = os.path.dirname(os.path.abspath(__file__))
    if only:
        print(json.dumps({"jobs": jobs}), file=sys.stderr)
        return
    rnd = os.environ.get("SPARK_GRAFT_ROUND")
    if rnd is None:
        prior = [
            int(m.group(1))
            for f in os.listdir(here)
            if (m := re.match(r"BENCH_r(\d+)\.json$", f))
        ]
        rnd = f"{(max(prior) + 1) if prior else 1:02d}"
    self_path = os.path.join(here, f"BENCH_SELF_r{rnd}.json")
    provenance = (
        "last full run at this round index wins: the driver re-runs "
        "bench.py AFTER the end-of-round snapshot, overwriting the "
        "builder's pre-commit run in the working tree — identical "
        "code, walls differ by the documented ~50% box band; the "
        "jobs map is the stable cross-run signal"
    )
    with open(self_path, "w") as f:
        json.dump(
            {**out, "jobs": jobs, "n_runs": N_RUNS, "provenance": provenance},
            f,
            indent=1,
        )
    print(f"wrote {self_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
