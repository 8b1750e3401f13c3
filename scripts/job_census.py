#!/usr/bin/env python
"""Warm-path job census for one or more queries: run each query twice
(first run builds artifacts/caches), then print every Spark job of the
SECOND run with its first stage's name — the attribution table for
job-diet work (r8 verdict item 3: at a ~0.1 s/job local floor, job
count IS the sf0.1 bench).

Usage: python scripts/job_census.py q1 [q2 ...] [--sf DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickstream_pipeline_aws_kafka_docker_airflow__spark import registry
from clickstream_pipeline_aws_kafka_docker_airflow__spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        del args[i : i + 2]
    spark = get_spark(app_name="job-census")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    qs = registry.queries()
    for name in args:
        for i in range(2):
            group = f"census:{name}:{i}"
            sc.setJobGroup(group, name)
            try:
                qs[name](spark, sf).write.format("noop").mode(
                    "overwrite"
                ).save()
            finally:
                sc._jsc.sc().clearJobGroup()
        ids = sorted(tracker.getJobIdsForGroup(f"census:{name}:1") or [])
        print(f"\n=== {name}: {len(ids)} warm jobs ===")
        for jid in ids:
            info = tracker.getJobInfo(jid)
            stages = sorted(info.stageIds) if info else []
            first = None
            n_tasks = 0
            for sid in stages:
                si = tracker.getStageInfo(sid)
                if si:
                    n_tasks += si.numTasks
                    if first is None:
                        first = si.name
            print(
                f"  job {jid}: {len(stages)} stages, {n_tasks} tasks — {first}"
            )


if __name__ == "__main__":
    main()
