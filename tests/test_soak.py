"""Compositional crash-recovery soak (RUN_SLOW): drive the five-stage
streaming pipeline for 30 ticks with seeded crashes on four distinct
stages, assert the crash-riddled run's zones equal a clean run's and
the one-shot batch twins. The committed 100-tick record is
docs/SOAK.json (scripts/soak.py)."""

from __future__ import annotations

import os

import pytest


@pytest.mark.skipif(
    not os.environ.get("RUN_SLOW"),
    reason="~6 min five-stage soak; scripts/soak.py commits the full "
    "100-tick record to docs/SOAK.json",
)
def test_soak_crash_recovery_composes(spark):
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
        ),
    )
    from soak import run_soak

    # seed 5: crashes at ticks {6: sketch, 9: gate, 15: gate,
    # 21: corpus, 24: ingest} — four distinct stages inside 30 ticks
    out = run_soak(spark, ticks=30, seed=5)
    assert out["crashed"]["crashes"] >= 4, out
    bad = {
        z: v
        for z, v in out["zones"].items()
        if not (v["crashed_run_identical"] and v["batch_twin_match"])
    }
    assert out["all_equal"] and not bad, bad
