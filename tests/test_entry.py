"""Smoke tests of the driver contract itself."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    cols = set(df.columns)
    assert {"dt", "total_events", "unique_users", "pageviews", "purchases",
            "revenue_usd"} <= cols


def test_contract_shapes(spark):
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert qs, "queries() must not be empty"
    assert set(os_) <= set(qs), "every oracle key must have a query"
    for k, fn in qs.items():
        assert callable(fn), k
