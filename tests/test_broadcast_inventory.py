"""Raw-fact-broadcast regression gate (r8 verdict item 8): the q4
class — a NEW broadcast of a raw corpus-growing-table slice — must
fail the default suite, not wait for the next scaling-curve probe.

The committed baseline (tests/fixtures/broadcast_baseline_smoke.json,
regenerated via ``python scripts/broadcast_sweep.py <SF_SMOKE dir>
<fixture path>``) is the triaged inventory at the suite's smoke scale:
every (query, fact) RAW pair in it is one of the adjudicated classes
from docs/BROADCAST_SWEEP.json's triage — bounded literal slices (the
ANN query sets) or estimate-driven slices that flip to shuffle joins
at real scale on their own. A pair NOT in the baseline is new plan
behavior and needs the same adjudication before it may be added here.

Fewer raw broadcasts than baseline is always fine (that is the
direction r8 moved q4)."""

from __future__ import annotations

import importlib.util
import json
import os

from clickstream_pipeline_aws_kafka_docker_airflow__spark import registry

from conftest import SF_SMOKE

_HERE = os.path.dirname(os.path.abspath(__file__))
_spec = importlib.util.spec_from_file_location(
    "broadcast_sweep",
    os.path.join(os.path.dirname(_HERE), "scripts", "broadcast_sweep.py"),
)
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)

BASELINE_PATH = os.path.join(
    _HERE, "fixtures", "broadcast_baseline_smoke.json"
)


def test_no_new_raw_fact_broadcast(spark):
    with open(BASELINE_PATH) as f:
        baseline = json.load(f)["raw_fact_broadcasts"]
    new_pairs: dict[str, list[str]] = {}
    build_errors: dict[str, str] = {}
    for name, fn in sorted(registry.queries().items()):
        try:
            plan = (
                fn(spark, SF_SMOKE)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as ex:  # noqa: BLE001 — a build failure is a
            # different regression; report it rather than hide the gate
            build_errors[name] = f"{type(ex).__name__}: {str(ex)[:120]}"
            continue
        raws = sorted(
            h["fact"] for h in _mod._audit_plan(plan) if h["class"] == "RAW"
        )
        allowed = list(baseline.get(name, []))
        extra = []
        for fact in raws:  # multiset diff: a SECOND raw broadcast of the
            # same fact in one plan is as new as a first
            if fact in allowed:
                allowed.remove(fact)
            else:
                extra.append(fact)
        if extra:
            new_pairs[name] = extra
    assert not build_errors, build_errors
    assert not new_pairs, (
        "NEW raw fact-table broadcast(s) vs the triaged baseline — the "
        "q4 hazard class (driver-side single-threaded HashedRelation "
        "build of a data-sized slice). Either reduce before the join "
        "(per-key rollup) or adjudicate + regenerate the baseline "
        f"fixture: {new_pairs}"
    )
