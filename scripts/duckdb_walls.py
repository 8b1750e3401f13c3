#!/usr/bin/env python
"""Per-query DuckDB oracle walls at a given sf_dir, spill-safe.

Why not bench_compare.py at sf1: a handful of oracles have
PATHOLOGICAL DuckDB plans at 10x (embed_neardup_cosine's label-blocked
pair join, and at least one more) that spill >78 GB of temp blocks and
fill the disk — twice, measured. This harness runs each oracle in its
OWN subprocess with

* ``memory_limit`` (same RAM-relative cap as bench_compare),
* ``temp_directory`` pointed at a run-local dir plus
  ``max_temp_directory_size`` so a spill-happy plan ERRORS instead of
  filling the disk,
* a wall-clock timeout (the subprocess is killed, the query recorded
  as timed out),

and reports min-of-N walls per query plus an errors map. Composed with
bench.py's Spark walls (same box, same session config) this yields the
sf1 head-to-head artifact; the isolation is DISCLOSED there — fresh
process per query favors neither engine at these walls (DuckDB setup
cost ~0.2 s is subtracted via a connect+views-only baseline).

Usage: python scripts/duckdb_walls.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# single source of truth for the view set: bench_compare.TABLES —
# the two harnesses must never drift while claiming "same views"
from bench_compare import TABLES  # noqa: E402
# min-of-N per oracle; raise via DUCKDB_WALLS_RUNS when a deep plan is
# scheduler-noisy (measured at sf0.1: ann_topk_ivfpq_res draws 8-48 s
# across fresh processes on an otherwise-quiet 32-thread box)
N_RUNS = int(os.environ.get("DUCKDB_WALLS_RUNS", "2"))
TIMEOUT_S = 120
TEMP_CAP = os.environ.get("DUCKDB_WALLS_TEMP_CAP", "24GB")

_CHILD = r"""
import json, os, sys, time
import duckdb
sf_dir, sql, temp_dir, cap = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
con = duckdb.connect(":memory:")
try:
    ram_gb = (os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")) / (1 << 30)
    mem = f"{max(1, min(16, int(ram_gb * 0.25)))}GB"
except (ValueError, OSError):
    mem = "4GB"
con.sql(f"SET memory_limit='{mem}'")
con.sql(f"SET temp_directory='{temp_dir}'")
con.sql(f"SET max_temp_directory_size='{cap}'")
con.sql("SET enable_progress_bar=false")  # pollutes piped stdout
for t in %TABLES%:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
best = float("inf")
for _ in range(%N_RUNS%):
    t0 = time.perf_counter()
    con.execute(sql).fetchall()
    best = min(best, time.perf_counter() - t0)
print(json.dumps({"wall": best}))
"""


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/duckdb_walls.json"
    from clickstream_pipeline_aws_kafka_docker_airflow__spark import registry

    osql = registry.oracle_sql()
    only = {n for n in os.environ.get("DUCKDB_WALLS_ONLY", "").split(",") if n}
    if only:
        unknown = sorted(only - set(osql))
        if unknown:
            # a typo'd name exits loudly (house rule: BENCH_ONLY,
            # AUDIT_ONLY, COMPARE_SKIP all do) instead of silently
            # producing an empty walls artifact
            print(f"DUCKDB_WALLS_ONLY: unknown queries {unknown}", file=sys.stderr)
            sys.exit(2)
        osql = {n: osql[n] for n in only}
    timeout_s = int(os.environ.get("DUCKDB_WALLS_TIMEOUT", TIMEOUT_S))
    child_src = _CHILD.replace("%TABLES%", repr(TABLES)).replace(
        "%N_RUNS%", str(N_RUNS)
    )
    walls: dict[str, float] = {}
    errors: dict[str, str] = {}
    with tempfile.TemporaryDirectory(prefix="duckdb_walls_") as tmp:
        for name in sorted(osql):
            # per-query temp subdir, wiped after the child exits: a
            # timeout-KILLED child skips DuckDB's own temp cleanup, and
            # spill files surviving into later children would stack
            # toward the disk-fill this harness exists to prevent
            qtmp = os.path.join(tmp, name)
            os.makedirs(qtmp, exist_ok=True)
            proc = None
            try:
                proc = subprocess.run(
                    [sys.executable, "-c", child_src, sf_dir, osql[name], qtmp, TEMP_CAP],
                    capture_output=True,
                    text=True,
                    timeout=timeout_s,
                )
            except subprocess.TimeoutExpired:
                errors[name] = f"timeout>{timeout_s}s"
                continue
            finally:
                import shutil as _shutil

                _shutil.rmtree(qtmp, ignore_errors=True)
            if proc.returncode != 0:
                tail = proc.stderr.strip().splitlines() if proc.stderr else []
                errors[name] = tail[-1][:200] if tail else f"exit {proc.returncode}"
                continue
            # the marker may be mid-line if anything else printed first
            marker = proc.stdout.rfind('{"wall"')
            if marker < 0:
                errors[name] = f"no result line; stdout tail: {proc.stdout[-120:]!r}"
                continue
            walls[name] = round(
                json.loads(proc.stdout[marker:].splitlines()[0])["wall"], 4
            )
            print(f"{name}: {walls[name]}", flush=True)
    out = {
        "sf_dir": sf_dir,
        "protocol": (
            f"one subprocess per oracle, min of {N_RUNS} runs, memory cap as "
            f"bench_compare, temp_directory capped at {TEMP_CAP} (spill-happy "
            f"plans error instead of filling the disk), {timeout_s}s timeout"
        ),
        "total_sec": round(sum(walls.values()), 2),
        "n_ok": len(walls),
        "walls": walls,
        "errors": errors,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({"out": out_path, "total": out["total_sec"], "errors": errors}))


if __name__ == "__main__":
    main()
