#!/usr/bin/env python
"""Static sweep: which plans broadcast a FACT-table subtree, and why
that is (almost always) fine.

Motivation (r8): the scaling curve caught q4 spending its whole sf1
wall in a driver-side single-threaded broadcast build of the 6M-row
lineitem projection — the planner's size estimate for the filtered
2-column scan sat just under the 64 MB autoBroadcastJoinThreshold
while the in-memory HashedRelation it implies is several times larger.
This sweep walks every registered query's SPARK physical plan at a
given sf_dir and reports each BroadcastExchange whose subtree scans a
fact table (lineitem / orders / events / documents / embeddings),
classified as:

* RAW      — only Filter/Project between the scan and the broadcast:
             the broadcast side is a data-sized slice whose planner
             estimate GROWS with the corpus, so at real scale the same
             declarative plan flips to a shuffle join automatically.
             The hazard is only when the estimate sits just under the
             threshold while the true build cost dominates the wall —
             the q4 class; the fix there is reducing before the join
             (per-key rollup), which is better at every scale.
* derived  — an aggregation / window / limit between scan and
             broadcast: the broadcast side is a REDUCED relation
             (per-key rollup, top-k, scalar agg). Bounded by key
             cardinality or k, not corpus bytes; the broadcast is the
             intended plan.

The committed artifact (docs/BROADCAST_SWEEP.json) records the full
inventory at the 10x surface so a NEW raw-fact broadcast in a future
round is a diffable signal, not archaeology.

Usage: python scripts/broadcast_sweep.py [sf_dir] [out_json]
Defaults: /tmp/sf1_split64 (build with make_sf1.py + scaling_curve.py
prep, or point at any sf dir), docs/BROADCAST_SWEEP.json.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# every SF-GROWING table: the big five facts plus the TPC-H "dims"
# that scale with the corpus (customer/supplier/part) — the r8 memory
# probe showed a forced broadcast of a grown "dim" is the same hazard
# class as a fact broadcast, so the inventory tracks them identically.
# Only nation/region (fixed 25/5 rows) are exempt.
FACTS = (
    "lineitem", "orders", "events", "documents", "embeddings",
    "customer", "supplier", "part",
)

# Operators that do NOT reduce cardinality: if the broadcast subtree
# contains only these above the scan, the broadcast side is data-sized.
_PASSTHROUGH = (
    "Project",
    "Filter",
    "ColumnarToRow",
    "FileScan",
    "Scan",
    "InputAdapter",
    "WholeStageCodegen",
    "BroadcastQueryStage",
    "ReusedExchange",
)


def _depth(s: str) -> int:
    return len(re.match(r"[\s:+\-*()]*", s).group(0))


def _audit_plan(plan: str) -> list[dict]:
    lines = plan.splitlines()
    hits = []
    for i, ln in enumerate(lines):
        if "BroadcastExchange" not in ln:
            continue
        d0 = _depth(ln)
        sub = []
        for l2 in lines[i + 1 :]:
            if not l2.strip() or _depth(l2) <= d0:
                break
            sub.append(l2)
        subtxt = "\n".join(sub)
        for f in FACTS:
            if f + ".parquet" not in subtxt:
                continue
            ops = [
                re.sub(r"^[\s:+\-*()]*", "", s).split(" ")[0]
                for s in sub
                if s.strip()
            ]
            reducing = sorted(
                {
                    o
                    for o in ops
                    if o and not o.startswith(_PASSTHROUGH) and o != "*"
                }
            )
            hits.append(
                {
                    "fact": f,
                    "class": "RAW" if not reducing else "derived",
                    "reducers": reducing[:6],
                }
            )
    return hits


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_split64"
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, "docs", "BROADCAST_SWEEP.json")
    )
    from clickstream_pipeline_aws_kafka_docker_airflow__spark import registry
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.session import get_spark

    spark = get_spark(app_name="broadcast-sweep")
    out: dict = {"sf_dir": sf_dir, "queries": {}, "errors": {}}
    for name, fn in sorted(registry.queries().items()):
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # noqa: BLE001 — inventory, not a gate
            out["errors"][name] = f"{type(ex).__name__}: {str(ex)[:120]}"
            continue
        hits = _audit_plan(plan)
        if hits:
            out["queries"][name] = hits
    raw = {
        n: [h["fact"] for h in hs if h["class"] == "RAW"]
        for n, hs in out["queries"].items()
        if any(h["class"] == "RAW" for h in hs)
    }
    out["raw_fact_broadcasts"] = raw
    out["n_queries_with_fact_broadcast"] = len(out["queries"])
    out["triage"] = (
        "RAW splits into three subclasses. (a) Bounded literal slices "
        "— the ANN/sim family broadcasts the k-row QUERY set selected "
        "by a constant predicate (nid < K): bounded by the literal, "
        "correct to broadcast at every scale. (b) Estimate-driven fact "
        "slices — the TPC-H orders date/status windows and the events/"
        "documents slices: the broadcast side's planner estimate grows "
        "with the data, so at production scale the same declarative "
        "plan flips to a shuffle join on its own; they broadcast at "
        "probe scale because they genuinely are small there. (c) The "
        "actionable subclass: a RAW broadcast whose BUILD dominates "
        "the wall (flat core-scaling curve) AND that a pre-join "
        "reduction can shrink — q4 was the one instance (fixed via "
        "per-order MAX rollup, r8; it no longer appears here). "
        "Remaining (b) sides carry per-row columns a rollup cannot "
        "reconstruct (dates, prices, names); their walls are shuffle/"
        "scan-bound per docs/SCALING_CURVE.json."
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        json.dumps(
            {
                "out": out_path,
                "queries_with_fact_broadcast": len(out["queries"]),
                "raw": {k: v for k, v in list(raw.items())[:10]},
                "errors": len(out["errors"]),
            }
        )
    )


if __name__ == "__main__":
    main()
