#!/usr/bin/env python
"""Per-stage wall/runtime census for one query at one core count —
the attribution tool behind the strong-scaling curve (r8 verdict item
4): run the query warm with the UI enabled, then print each stage of
the warm pass with task count, executor runtime, and wall, so a flat
4c->32c curve can be pinned to the stage (scan / exchange / broadcast
build / driver gap) that refuses to parallelize.

Usage: SPARK_GRAFT_CPUS=4 python scripts/stage_census.py <query> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.environ.pop("SPARK_GRAFT_EXTRA_CONFS", None)
    from pyspark.sql import SparkSession

    from clickstream_pipeline_aws_kafka_docker_airflow__spark import registry
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.session import (
        ENGINE_CONFS,
        apply_engine_confs,
    )

    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"stage-census-{name}")
        .config("spark.ui.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))
    )
    for k, v in ENGINE_CONFS.items():
        b = b.config(k, v)
    spark = apply_engine_confs(b.getOrCreate())
    q = registry.queries()[name]
    q(spark, sf).write.format("noop").mode("overwrite").save()  # warm
    sc = spark.sparkContext
    ui = sc.uiWebUrl
    app = sc.applicationId

    def stages() -> dict:
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages") as r:
            return {s["stageId"]: s for s in json.load(r)}

    before = stages()
    t0 = time.perf_counter()
    q(spark, sf).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    time.sleep(0.5)
    after = stages()
    new = [s for sid, s in sorted(after.items()) if sid not in before]
    print(f"{name} @ local[{cpus}] {sf}: warm wall {wall:.2f}s, "
          f"{len(new)} stages")
    tot_rt = 0
    for s in new:
        if s.get("status") != "COMPLETE":
            continue
        rt = s.get("executorRunTime", 0)
        tot_rt += rt
        dur = None
        if s.get("firstTaskLaunchedTime") and s.get("completionTime"):
            pass  # ISO strings; runtime + tasks is the useful signal
        print(
            f"  stage {s['stageId']}: tasks {s['numTasks']:>3} "
            f"runTime {rt/1000:.2f}s "
            f"shuffleRead {s.get('shuffleReadBytes',0)>>20}MB "
            f"shuffleWrite {s.get('shuffleWriteBytes',0)>>20}MB"
        )
    gap = wall - tot_rt / 1000 / cpus
    print(f"  sum executorRunTime {tot_rt/1000:.2f}s "
          f"(ideal wall at {cpus}c = {tot_rt/1000/cpus:.2f}s; "
          f"measured {wall:.2f}s -> serial/driver gap ~{gap:.2f}s)")


if __name__ == "__main__":
    main()
