"""Single-partition plan census (r8 verdict 'what's wrong' #2): every
`Exchange SinglePartition` in every registered query's plan, attributed
to its PARENT operator and pinned against an adjudicated allowlist —
so the verify-sweep's residual `WindowExec: No Partition Defined`
warnings stop costing every future reviewer a re-audit.

Two classes are allowed, both BOUNDED by construction (the input of
the single-partition operator is an aggregate/limit output whose row
count is fixed by the schema — hours, days, key-cardinality, top-k —
never by the corpus):

* scalar-agg — the final exchange of an ungrouped aggregate: one
  partial row per map task, corpus-independent.
* bounded-window — an unpartitioned Window/Sort over an ALREADY
  AGGREGATED table (hourly/daily KPI rows, a contingency table, a
  key histogram, a post-limit(k) slice). The r7 verdict adjudicated
  this class as acceptable; the corpus-growing instances (rfm's three
  user-level ntile windows) were eliminated in r8/r9 and must never
  come back — a NEW query in this list fails the suite until it is
  adjudicated here with a rationale.
"""

from __future__ import annotations

import re

from clickstream_pipeline_aws_kafka_docker_airflow__spark import registry

from conftest import SF_SMOKE

# The `scalar-agg` class (the final exchange of an ungrouped
# aggregate: one partial row per map task, corpus-independent) is
# allowed EVERYWHERE — it is bounded by definition. Only the
# window/sort class needs per-query adjudication:
# query -> (allowed classes beyond scalar-agg, rationale).
ALLOWED: dict[str, tuple[set[str], str]] = {
    "chi2_type_by_weekday": (
        {"bounded-window"},
        "windows run over the (event_type x weekday) contingency "
        "table — at most |types| x 7 rows at any corpus",
    ),
    "hourly_anomalies": (
        {"bounded-window"},
        "rolling stats over the HOURLY aggregate — rows bounded by "
        "hours in the data range, never by events",
    ),
    "key_skew_report": (
        {"bounded-window"},
        "top-N over the per-key histogram — key-cardinality rows",
    ),
    "mixture_resample": (
        {"bounded-window"},
        "quota math over the per-source rollup — |sources| rows",
    ),
    "rolling_7d_kpis": (
        {"bounded-window"},
        "7-day rolling window over the DAILY kpi table — days rows",
    ),
}


def _depth(s: str) -> int:
    return len(re.match(r"[\s:+\-*()]*", s).group(0))


def _single_partition_parents(plan: str) -> set[str]:
    """Class of each Exchange SinglePartition by nearest parent op."""
    lines = plan.splitlines()
    out: set[str] = set()
    for i, ln in enumerate(lines):
        if "SinglePartition" not in ln or "Exchange" not in ln:
            continue
        d0 = _depth(ln)
        parent = None
        for j in range(i - 1, -1, -1):
            lj = lines[j]
            if lj.strip() and _depth(lj) < d0:
                parent = re.sub(r"^[\s:+\-*()]*", "", lj).split(" ")[0]
                break
        if parent and ("Window" in parent or "Sort" in parent):
            out.add("bounded-window")
        elif parent and "Aggregate" in parent:
            out.add("scalar-agg")
        else:
            out.add(f"other:{parent}")
    return out


def test_single_partition_census_matches_allowlist(spark):
    unexpected: dict[str, object] = {}
    for name, fn in sorted(registry.queries().items()):
        plan = (
            fn(spark, SF_SMOKE)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        classes = _single_partition_parents(plan) - {"scalar-agg"}
        if not classes:
            continue
        if name not in ALLOWED:
            unexpected[name] = sorted(classes)
            continue
        extra = classes - ALLOWED[name][0]
        if extra:
            unexpected[name] = sorted(extra)
    assert not unexpected, (
        "NEW single-partition exchange(s) outside the adjudicated "
        "census — if the input is corpus-growing this is the "
        "single-reducer hazard class; adjudicate and extend ALLOWED "
        f"with a rationale, or fix the plan: {unexpected}"
    )
