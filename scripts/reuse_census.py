#!/usr/bin/env python
"""Reuse-killer census (r12): sweep EVERY registered query's POST-AQE
final plan for the duplicate-subtree signature found in r11 (q15 /
funnel_conversion): two scans of the same relation with the same
ReadSchema whose pushed filters differ only by a join-inferred
`isnotnull`, or any same-relation/same-schema scan pair that AQE
exchange reuse failed to dedupe.

For each query the warm (second) execution's final plan is read from
the Spark UI REST API (initial `explain()` hides AQE reuse and runtime
join conversions). Output: one JSON artifact with, per query, the warm
job count, scan census (location -> [ (nodeId, readSchema, pushed) ]),
reuse node counts, and a `flags` list naming suspected duplicate
subtrees. Queries already riding an InMemoryRelation pin are reported
(pins show up as InMemoryTableScan, not parquet scans).

Usage: python scripts/reuse_census.py [--sf DIR] [--out FILE] [names...]
Defaults: all queries, sf0.1, docs/REUSE_CENSUS_r12.json.
"""

from __future__ import annotations

import json
import os
import re
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# static conf: must be set before the session exists
os.environ["SPARK_GRAFT_EXTRA_CONFS"] = (
    os.environ.get("SPARK_GRAFT_EXTRA_CONFS", "")
    + ";spark.ui.enabled=true;spark.ui.port=4057"
).lstrip(";")

from clickstream_pipeline_aws_kafka_docker_airflow__spark import registry
from clickstream_pipeline_aws_kafka_docker_airflow__spark.session import get_spark

_SCAN_DETAIL = re.compile(
    r"^\((\d+)\) (Scan parquet|InMemoryTableScan)", re.MULTILINE
)
_TREE_ID = re.compile(r"\((\d+)\)")
_ISNOTNULL = re.compile(r"IsNotNull\([^)]*\)")


def final_section(plan: str) -> str:
    """The `== Final Plan ==` tree of an AdaptiveSparkPlan dump (whole
    tree when AQE left no marker, e.g. pure-scan plans)."""
    start = plan.find("== Final Plan ==")
    if start == -1:
        # non-adaptive: tree runs until the blank line before "(1) ..."
        m = _SCAN_DETAIL.search(plan)
        return plan[: m.start()] if m else plan
    end = plan.find("== Initial Plan ==", start)
    return plan[start : end if end != -1 else len(plan)]


def detail_blocks(plan: str) -> dict[int, str]:
    """nodeId -> detail text for every `(N) <op>` block in the dump."""
    blocks: dict[int, str] = {}
    parts = re.split(r"^\((\d+)\) ", plan, flags=re.MULTILINE)
    # parts = [prefix, id1, body1, id2, body2, ...]
    for i in range(1, len(parts) - 1, 2):
        blocks[int(parts[i])] = parts[i + 1]
    return blocks


def field(block: str, name: str) -> str:
    m = re.search(rf"^{name}: (.*)$", block, re.MULTILINE)
    return m.group(1).strip() if m else ""


def census_one(plan: str) -> dict:
    """Scan census + duplicate-subtree flags for one plan dump."""
    tree = final_section(plan)
    final_ids = {int(x) for x in _TREE_ID.findall(tree)}
    details = detail_blocks(plan)
    scans: dict[str, list[dict]] = {}
    n_imr = len(re.findall(r"InMemoryTableScan", tree))
    n_reused = len(re.findall(r"Reused(Exchange|Subquery)", tree))
    for nid, body in details.items():
        if nid not in final_ids:
            continue
        first = body.splitlines()[0] if body else ""
        # detail_blocks strips the "(N) " prefix; match on the op name
        if not (
            first.startswith("Scan parquet")
            or first.startswith("InMemoryTableScan")
            or field(body, "Location")
        ):
            continue
        loc = field(body, "Location")
        if not loc:
            continue
        m = re.search(r"\[([^\]]*)\]", loc)
        scans.setdefault(m.group(1) if m else loc, []).append(
            {
                "node": nid,
                "schema": field(body, "ReadSchema"),
                "pushed": field(body, "PushedFilters"),
            }
        )
    flags = []
    for loc, ss in scans.items():
        by_schema: dict[str, list[dict]] = {}
        for s in ss:
            by_schema.setdefault(s["schema"], []).append(s)
        for schema, group in by_schema.items():
            if len(group) < 2:
                continue
            pushed = {g["pushed"] for g in group}
            stripped = {
                re.sub(r"(, )?IsNotNull\([^)]*\)(, )?", "", p) for p in pushed
            }
            kind = (
                "isnotnull-only-delta"
                if len(stripped) == 1
                else "same-schema-multi-scan"
            )
            flags.append(
                {
                    "location": loc,
                    "n_scans": len(group),
                    "kind": kind,
                    "pushed": sorted(pushed),
                }
            )
    return {
        "scans": {loc: len(ss) for loc, ss in scans.items()},
        "in_memory_scans": n_imr,
        "reused_nodes": n_reused,
        "flags": flags,
    }


def main() -> None:
    args = list(sys.argv[1:])
    sf = "/root/testdata/sf0.1"
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs",
        "REUSE_CENSUS_r12.json",
    )
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        del args[i : i + 2]
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        del args[i : i + 2]
    spark = get_spark(app_name="reuse-census")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    qs = registry.queries()
    names = args or sorted(qs)
    base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"

    def rest(path: str):
        with urllib.request.urlopen(base + path) as r:
            return json.load(r)

    report: dict[str, dict] = {}
    # the /sql listing caps at `length`; page from an advancing offset so
    # a >1000-execution session cannot silently hide the warm execution
    # (ADVICE r11) — each query only needs executions newer than the
    # previous query's, so remember the max seen id.
    seen_max = -1
    for name in names:
        err = None
        for i in range(2):
            group = f"census:{name}:{i}"
            sc.setJobGroup(group, name)
            try:
                qs[name](spark, sf).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as ex:  # noqa: BLE001 — isolate and record
                err = f"{type(ex).__name__}: {str(ex)[:160]}"
                break
            finally:
                sc._jsc.sc().clearJobGroup()
        if err:
            report[name] = {"error": err}
            continue
        ids = set(tracker.getJobIdsForGroup(f"census:{name}:1") or [])
        execs = rest(
            f"/sql?details=true&planDescription=true"
            f"&offset={max(seen_max - 5, 0)}&length=1000"
        )
        if execs:
            seen_max = max(seen_max, max(e["id"] for e in execs))
        warm = [e for e in execs if set(e.get("successJobIds", [])) & ids]
        if not warm:
            report[name] = {"error": "no warm execution found in /sql window"}
            print(f"WARN {name}: no warm execution matched", file=sys.stderr)
            continue
        merged = {"scans": {}, "in_memory_scans": 0, "reused_nodes": 0, "flags": []}
        for e in warm:
            c = census_one(e.get("planDescription", ""))
            for loc, n in c["scans"].items():
                merged["scans"][loc] = merged["scans"].get(loc, 0) + n
            merged["in_memory_scans"] += c["in_memory_scans"]
            merged["reused_nodes"] += c["reused_nodes"]
            merged["flags"] += c["flags"]
        merged["warm_jobs"] = len(ids)
        report[name] = merged
        tag = " FLAGGED" if merged["flags"] else ""
        print(f"{name}: jobs={len(ids)} flags={len(merged['flags'])}{tag}")

    flagged = sorted(n for n, r in report.items() if r.get("flags"))
    summary = {
        "n_queries": len(report),
        "n_flagged": len(flagged),
        "flagged": flagged,
        "per_query": report,
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(f"\nwrote {out_path}: {len(flagged)}/{len(report)} flagged")
    print("flagged:", ", ".join(flagged) or "none")


if __name__ == "__main__":
    main()
