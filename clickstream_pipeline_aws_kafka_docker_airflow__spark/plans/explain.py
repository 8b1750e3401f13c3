"""Plan-inspection helpers: make physical-plan properties assertable.

The 100 TB discipline is that plan shape is part of correctness: a scan
that reads all columns for a 2-column projection, a dim join that
shuffles the fact table, or a Python UDF in the hot path are bugs even
when the values come out right. These helpers let tests pin the plan
properties each operator is designed around (tests/test_plans.py).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    jdf = df._jdf
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jdf.queryExecution().explainString(mode)


@dataclass
class PlanFacts:
    text: str
    read_schemas: list[str] = field(default_factory=list)
    pushed_filters: list[str] = field(default_factory=list)
    broadcast_joins: int = 0
    sortmerge_joins: int = 0
    shuffled_hash_joins: int = 0
    exchanges: int = 0
    python_evals: int = 0  # BatchEvalPython/ArrowEvalPython (row-wise UDFs)


def plan_facts(df: DataFrame) -> PlanFacts:
    text = formatted_plan(df)
    facts = PlanFacts(text=text)
    facts.read_schemas = re.findall(r"ReadSchema: (\S+)", text)
    facts.pushed_filters = re.findall(r"PushedFilters: \[([^\]]*)\]", text)
    # count the numbered node-details section only — the tree section at
    # the top of a formatted plan repeats every node name
    facts.broadcast_joins = len(re.findall(r"\(\d+\) BroadcastHashJoin\b", text))
    facts.sortmerge_joins = len(re.findall(r"\(\d+\) SortMergeJoin\b", text))
    facts.shuffled_hash_joins = len(re.findall(r"\(\d+\) ShuffledHashJoin\b", text))
    # count shuffle exchanges only (broadcast exchanges are cheap by design)
    facts.exchanges = len(re.findall(r"\n\s*\(\d+\) Exchange\b", text))
    facts.python_evals = len(re.findall(r"BatchEvalPython|ArrowEvalPython", text))
    return facts


def scan_columns(facts: PlanFacts, table_prefix: str) -> list[str] | None:
    """Column names read by the scan whose schema mentions
    ``table_prefix`` (e.g. 'l_' for lineitem) — None if no such scan."""
    for schema in facts.read_schemas:
        cols = re.findall(r"(\w+):", schema)
        if cols and all(c.startswith(table_prefix) for c in cols):
            return cols
    return None
