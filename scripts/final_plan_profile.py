#!/usr/bin/env python
"""Final-plan profiler (r11): run named queries twice (warm path), then
dump each one's POST-AQE executed plan and per-operator row counts via
the Spark UI REST API.

`explain()` shows the INITIAL plan (isFinalPlan=false) — it hides AQE
stage materialization, runtime join conversions, and whether duplicate
subtrees actually reused (the q2/q15/q20/funnel findings this round
were invisible in the initial plan). This script reads the truth.

Usage: python scripts/final_plan_profile.py q1 [q2 ...]
           [--sf DIR] [--out DIR]
Prints warm job count + a node table per query; --out saves the full
final-plan text as <out>/<query>_final.txt.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# static conf: must be set before the session exists
os.environ["SPARK_GRAFT_EXTRA_CONFS"] = (
    os.environ.get("SPARK_GRAFT_EXTRA_CONFS", "")
    + ";spark.ui.enabled=true;spark.ui.port=4055"
).lstrip(";")

from clickstream_pipeline_aws_kafka_docker_airflow__spark import registry
from clickstream_pipeline_aws_kafka_docker_airflow__spark.session import get_spark


def main() -> None:
    args = list(sys.argv[1:])
    sf = "/root/testdata/sf0.1"
    out = None
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        del args[i : i + 2]
    if "--out" in args:
        i = args.index("--out")
        out = args[i + 1]
        del args[i : i + 2]
    spark = get_spark(app_name="final-plan-profile")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    qs = registry.queries()
    # uiWebUrl, not the configured port: Spark falls back to 4056+ when
    # 4055 is busy, and this must follow it
    base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"

    def rest(path: str):
        with urllib.request.urlopen(base + path) as r:
            return json.load(r)

    for name in args:
        for i in range(2):
            group = f"prof:{name}:{i}"
            sc.setJobGroup(group, name)
            try:
                qs[name](spark, sf).write.format("noop").mode(
                    "overwrite"
                ).save()
            finally:
                sc._jsc.sc().clearJobGroup()
        ids = sorted(tracker.getJobIdsForGroup(f"prof:{name}:1") or [])
        # page the /sql listing from an advancing offset: a >1000-
        # execution session would otherwise silently drop the warm
        # executions out of the window and print "no plan" (r11 advice)
        execs = []
        offset = 0
        while True:
            page = rest(
                f"/sql?details=true&planDescription=true"
                f"&offset={offset}&length=1000"
            )
            execs += page
            if len(page) < 1000:
                break
            offset += len(page)
        warm = [
            e for e in execs if set(e.get("successJobIds", [])) & set(ids)
        ]
        if not warm:
            print(
                f"WARNING {name}: no /sql execution matched warm jobs "
                f"{ids} — plan dump will be empty",
                file=sys.stderr,
            )
        print(f"\n########## {name}: {len(ids)} warm jobs")
        texts = []
        for e in warm:
            texts.append(e.get("planDescription", ""))
            for n in e.get("nodes", []):
                mt = {m["name"]: m["value"] for m in n.get("metrics", [])}
                rows = mt.get("number of output rows", "")
                print(f"    [{n['nodeId']:3d}] {n['nodeName']:40s} rows={rows!s:>12s}")
        if out:
            os.makedirs(out, exist_ok=True)
            with open(os.path.join(out, f"{name}_final.txt"), "w") as f:
                f.write("\n\n".join(texts))


if __name__ == "__main__":
    main()
