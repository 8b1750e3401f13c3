#!/usr/bin/env python
"""Per-round fresh-seed fuzz campaign (r8 verdict item 5, made a
ritual): run the cross-engine fuzz suite under FUZZ_SEEDS the committed
defaults have never seen, and commit the record — seeds, HEAD, result,
duration — so cross-engine parity keeps EARNING evidence each round
instead of re-running the same fixed seeds.

Seed policy: five fresh primes per round, disjoint from every prior
campaign (defaults 11–55; r8 extended 66/77/88/99/111). A failure is
reproducible by exporting the recorded FUZZ_SEEDS and re-running the
recorded pytest command.

Usage: python scripts/fuzz_campaign.py <round> <seed[,seed...]>
Writes docs/FUZZ_CAMPAIGN_r<round>.json; exit mirrors pytest.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FUZZ_FILES = [
    "tests/test_crossengine_fuzz.py",
    "tests/test_admission_fuzz.py",
    "tests/test_interval_union_fuzz.py",
    "tests/test_ingest_fuzz.py",
]


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    rnd, seeds = sys.argv[1], sys.argv[2]
    env = dict(os.environ, FUZZ_SEEDS=seeds)
    cmd = [sys.executable, "-m", "pytest", *FUZZ_FILES, "-q", "--tb=line"]
    t0 = time.perf_counter()
    proc = subprocess.run(
        cmd, env=env, cwd=REPO, capture_output=True, text=True
    )
    wall = round(time.perf_counter() - t0, 1)
    tail = [ln for ln in proc.stdout.splitlines() if ln.strip()][-3:]
    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        cwd=REPO,
        capture_output=True,
        text=True,
    ).stdout.strip()
    out = {
        "round": rnd,
        "seeds": [int(s) for s in seeds.split(",") if s.strip()],
        "files": FUZZ_FILES,
        "head": head,
        "passed": proc.returncode == 0,
        "pytest_exit": proc.returncode,
        "wall_s": wall,
        "summary_tail": tail,
        "repro": f"FUZZ_SEEDS={seeds} python -m pytest "
        + " ".join(FUZZ_FILES),
    }
    path = os.path.join(REPO, "docs", f"FUZZ_CAMPAIGN_r{rnd}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    print(f"wrote {path}", file=sys.stderr)
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
