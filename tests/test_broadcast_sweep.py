"""Classifier contract for scripts/broadcast_sweep.py: RAW vs derived
fact-side broadcasts, parsed from physical-plan strings. Pure string
tests — the classification rules must hold without a SparkSession."""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "broadcast_sweep",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "broadcast_sweep.py",
    ),
)
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)
_audit_plan = _mod._audit_plan


RAW_PLAN = """\
AdaptiveSparkPlan
+- HashAggregate(keys=[p], functions=[count(1)])
   +- BroadcastHashJoin LeftSemi BuildRight
      :- Filter isnotnull(o_orderkey)
      :  +- FileScan parquet [o_orderkey] Location: [file:/x/orders.parquet]
      +- BroadcastExchange HashedRelationBroadcastMode
         +- Filter isnotnull(l_orderkey)
            +- FileScan parquet [l_orderkey,l_shipdate] Location: [file:/x/lineitem.parquet]
"""

DERIVED_PLAN = """\
AdaptiveSparkPlan
+- BroadcastHashJoin Inner BuildRight
   :- FileScan parquet [o_orderkey] Location: [file:/x/orders.parquet]
   +- BroadcastExchange HashedRelationBroadcastMode
      +- HashAggregate(keys=[l_orderkey], functions=[max(l_shipdate)])
         +- Exchange hashpartitioning(l_orderkey, 64)
            +- HashAggregate(keys=[l_orderkey], functions=[partial_max(l_shipdate)])
               +- FileScan parquet [l_orderkey,l_shipdate] Location: [file:/x/lineitem.parquet]
"""

DIM_PLAN = """\
AdaptiveSparkPlan
+- BroadcastHashJoin Inner BuildRight
   :- FileScan parquet [l_orderkey] Location: [file:/x/lineitem.parquet]
   +- BroadcastExchange HashedRelationBroadcastMode
      +- FileScan parquet [n_nationkey] Location: [file:/x/nation.parquet]
"""

SIBLING_PLAN = """\
AdaptiveSparkPlan
+- SortMergeJoin Inner
   :- Sort [k ASC]
   :  +- Exchange hashpartitioning(k, 64)
   :     +- FileScan parquet [k] Location: [file:/x/lineitem.parquet]
   +- Sort [k ASC]
      +- BroadcastExchange IdentityBroadcastMode
         +- FileScan parquet [k] Location: [file:/x/nation.parquet]
"""


def test_raw_fact_broadcast_flagged():
    hits = _audit_plan(RAW_PLAN)
    assert hits == [{"fact": "lineitem", "class": "RAW", "reducers": []}]


def test_rollup_above_scan_is_derived():
    hits = _audit_plan(DERIVED_PLAN)
    assert len(hits) == 1 and hits[0]["class"] == "derived"
    assert any("HashAggregate" in r for r in hits[0]["reducers"])


def test_dim_broadcast_not_flagged():
    assert _audit_plan(DIM_PLAN) == []


def test_fact_scan_outside_broadcast_subtree_not_attributed():
    # lineitem is a SIBLING of the BroadcastExchange (probe side); the
    # indentation walk must not leak it into the broadcast subtree
    assert _audit_plan(SIBLING_PLAN) == []


def test_multiple_broadcasts_counted_independently():
    hits = _audit_plan(RAW_PLAN + "\n" + DERIVED_PLAN)
    assert [h["class"] for h in hits] == ["RAW", "derived"]
