#!/usr/bin/env python
"""Head-to-head wall-clock: every oracled query, this engine (Spark,
local[N]) vs DuckDB running the oracle SQL on the same parquet.

DuckDB is the strongest practical single-node baseline for this data
scale (the reference itself is ~450 LoC of row-at-a-time Python four
orders of magnitude slower — see BASELINE.md), so "at-or-under DuckDB
wall-clock at sf0.1, with plans that shard to a cluster" is the
honest statement of single-node competitiveness. Method matches
bench.py: min of N_RUNS after warmup; Spark is forced through the
noop sink, DuckDB through fetchall() (both full materialization, no
result I/O). Prints one JSON line:

  {"metric": "spark_vs_duckdb", "sf": ..., "spark_floor_sec": ...,
   "spark_total_sec": ..., "duckdb_total_sec": ..., "ratio": ...,
   "queries": {name: {"spark": s, "duckdb": s, "ratio": r}}}

ratio < 1 means Spark is faster. Interpreting honestly: DuckDB wins
small single-shuffle aggregates (lower fixed overhead per query —
no JVM job scheduling; ``spark_floor_sec`` measures that constant),
Spark wins as data or operator complexity grows — at sf0.1 the
crossover is visible on the heavy dedup/curation queries, where Spark
is already at or under DuckDB (ratio 0.7-0.8) while both engines do
real work.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

from clickstream_pipeline_aws_kafka_docker_airflow__spark import registry
from clickstream_pipeline_aws_kafka_docker_airflow__spark.session import get_spark

N_RUNS = 2
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(app_name="bench_compare")
    qs, osql = registry.queries(), registry.oracle_sql()
    names = sorted(set(qs) & set(osql))
    # SPARK_GRAFT_COMPARE_SKIP: comma list of queries to EXCLUDE (and
    # disclose in the output). Exists for oracles whose DuckDB plan is
    # pathological at a given scale — e.g. embed_neardup_cosine at sf1
    # hash-joins the label-blocked pair space and spills tens of GB of
    # temp storage to disk (the Spark side runs it fine; bench.py
    # times it). A typo'd name exits loudly, mirroring BENCH_ONLY.
    skip = {n for n in os.environ.get("SPARK_GRAFT_COMPARE_SKIP", "").split(",") if n}
    unknown = sorted(skip - set(names))
    if unknown:
        print(f"SPARK_GRAFT_COMPARE_SKIP: unknown queries {unknown}", file=sys.stderr)
        sys.exit(2)
    names = [n for n in names if n not in skip]

    # SPARK_GRAFT_DUCKDB_WALLS=<json>: source the DuckDB side from a
    # scripts/duckdb_walls.py artifact (one subprocess per oracle,
    # min-of-N, memory + temp caps) instead of the shared in-process
    # connection. Motivation (r8): the shared-process method showed
    # 2-5x run-to-run swings on the heaviest oracle (ann_topk_ivfpq_res
    # 17 -> 51 s same box, ~10 s isolated) — system-level memory churn
    # from neighboring oracles, not connection state (measured: a fresh
    # connection mid-run is equally slow, a quiet process is not).
    # Isolation favors DuckDB (each oracle gets a quiet allocator) and
    # matches the committed sf1 methodology, so the ratio is
    # conservative and reproducible; the artifact self-describes via
    # "duckdb_method".
    walls_path = os.environ.get("SPARK_GRAFT_DUCKDB_WALLS")
    iso_walls: dict[str, float] | None = None
    iso_protocol = None
    if walls_path:
        with open(walls_path) as f:
            wj = json.load(f)
        iso_walls = wj["walls"]
        iso_protocol = wj.get("protocol")
        missing = sorted(set(names) - set(iso_walls) - set(wj.get("errors", {})))
        if missing:
            print(f"DUCKDB_WALLS missing queries: {missing}", file=sys.stderr)
            sys.exit(2)
        # queries the walls run could NOT measure (DuckDB DNF) leave the
        # ratio'd set but are still TIMED on the Spark side below and
        # reported ratio-less — excluding them entirely would silently
        # shrink spark_total_sec's coverage (ADVICE r8)
        walls_dnf = sorted(n for n in names if n not in iso_walls)
        names = [n for n in names if n in iso_walls]

    con = duckdb.connect(":memory:")
    # Both engines share this process. Unbounded, DuckDB's buffer
    # manager (default limit: 80% of RAM) balloons over a 127-query
    # run and the pressure taxes the LATE-alphabet queries of BOTH
    # engines (measured: time_arith_suite 6.1 s late-run vs 0.17 s
    # isolated, DuckDB side 1.6 s vs 0.12 s). Capping DuckDB keeps
    # per-query numbers position-independent — the honest-methodology
    # fix for the compare-vs-driver-bench gap. The cap is RAM-relative
    # (min(16GB, 25% of host RAM), env-overridable) so on small hosts
    # it never RAISES DuckDB's own 80%-of-RAM default.
    cap = os.environ.get("SPARK_GRAFT_DUCKDB_MEM")
    if cap is None:
        try:
            ram_gb = (
                os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
            ) / (1 << 30)
            cap = f"{max(1, min(16, int(ram_gb * 0.25)))}GB"
        except (ValueError, OSError):
            cap = "4GB"
    con.sql(f"SET memory_limit='{cap}'")
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    _force(qs["kpi_daily"](spark, sf_dir))  # JVM/codegen/scan warmup
    con.execute(osql["kpi_daily"]).fetchall()

    # Per-query fixed floor: scheduling + noop-commit cost of a 1-row
    # job. At sf0.1 this floor, not data, dominates most per-query
    # ratios (a 10 ms DuckDB query vs ~300 ms of Spark job overhead);
    # it is constant per query, so it amortizes to noise at real scale
    # while the data-bound times scale with input. Reported so the
    # per-query table can be read honestly.
    floor = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _force(spark.range(1))
        floor = min(floor, time.perf_counter() - t0)

    # Rounds are INTERLEAVED (full pass over all queries, then repeat,
    # min across passes) rather than per-query back-to-back: a
    # transient slow window (GC cycle, page-cache writeback) hits
    # consecutive queries, so back-to-back repeats can both land in it
    # — measured as an alphabetically-contiguous 2-3x band that moved
    # between runs. Interleaving puts each query's samples minutes
    # apart, and the min shakes the window out.
    # COLD pass first: wipe the artifact root once, run every query in
    # order, and record which queries trigger artifact BUILDS plus the
    # build-inclusive wall. The warm passes below then measure the
    # serve path (min across passes); reporting both makes the JSON
    # self-describing — an artifact-served query's warm ratio compares
    # a table read against the oracle's full recompute, and the cold
    # number is what a first run actually costs.
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators import (
        artifacts,
    )

    shutil.rmtree(artifacts.ARTIFACT_ROOT, ignore_errors=True)
    shutil.rmtree("/tmp/spark_graft_quantizers", ignore_errors=True)
    s_cold: dict[str, float] = {}
    build_sec: dict[str, dict[str, float]] = {}
    cold_errors: dict[str, str] = {}
    for name in names:
        artifacts.BUILD_WALLS.clear()
        t0 = time.perf_counter()
        try:
            _force(qs[name](spark, sf_dir))
        except Exception as ex:  # noqa: BLE001 — isolate: a cold-build
            # failure must not void the whole compare run
            cold_errors[name] = (
                f"{type(ex).__name__}: {str(ex).splitlines()[0][:200]}"
            )
            continue
        wall = time.perf_counter() - t0
        if artifacts.BUILD_WALLS:
            s_cold[name] = wall
            build_sec[name] = {
                k: round(v, 4) for k, v in artifacts.BUILD_WALLS.items()
            }

    dnf_names = walls_dnf if iso_walls is not None else []
    s_best = {n: float("inf") for n in [*names, *dnf_names]}
    d_best = {n: float("inf") for n in names}
    for _ in range(N_RUNS):
        for name in [*names, *dnf_names]:
            t0 = time.perf_counter()
            _force(qs[name](spark, sf_dir))
            s_best[name] = min(s_best[name], time.perf_counter() - t0)
        if iso_walls is not None:
            continue
        for name in names:
            t0 = time.perf_counter()
            con.execute(osql[name]).fetchall()
            d_best[name] = min(d_best[name], time.perf_counter() - t0)
    if iso_walls is not None:
        d_best = {n: iso_walls[n] for n in names}
    rows = {}
    for name in names:
        row = {
            "spark": round(s_best[name], 4),
            "duckdb": round(d_best[name], 4),
            "ratio": round(s_best[name] / d_best[name], 3),
        }
        if name in s_cold:
            # build-inclusive first-run wall + per-artifact build cost;
            # "spark"/"ratio" above are the warm serve path
            row["spark_cold"] = round(s_cold[name], 4)
            row["artifact_build_sec"] = build_sec[name]
            row["ratio_cold"] = round(s_cold[name] / d_best[name], 3)
        rows[name] = row

    s_total = round(sum(r["spark"] for r in rows.values()), 4)
    d_total = round(sum(r["duckdb"] for r in rows.values()), 4)
    out = {
        "metric": "spark_vs_duckdb",
        "sf": sf,
        "spark_floor_sec": round(floor, 4),
        "spark_total_sec": s_total,
        "duckdb_total_sec": d_total,
        "ratio": round(s_total / d_total, 3),
        "queries": rows,
    }
    if iso_walls is not None:
        out["duckdb_method"] = (
            f"isolated subprocess walls from {walls_path} — {iso_protocol}"
        )
        if wj.get("errors"):
            # queries the walls run could not measure are EXCLUDED from
            # the ratio'd totals above — disclose the DuckDB failures
            # AND the Spark-side walls of the excluded queries, so the
            # headline ratio is never read as full-surface coverage and
            # the Spark coverage gap is visible, not silent
            out["duckdb_errors"] = wj["errors"]
            out["spark_only_dnf"] = {
                n: round(s_best[n], 4) for n in dnf_names
            }
    if cold_errors:
        out["cold_errors"] = cold_errors
    if skip:
        out["skipped"] = sorted(skip)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
