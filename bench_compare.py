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

    con = duckdb.connect(":memory:")
    # Both engines share this process. Unbounded, DuckDB's buffer
    # manager (default limit: 80% of RAM) balloons over a 127-query
    # run and the pressure taxes the LATE-alphabet queries of BOTH
    # engines (measured: time_arith_suite 6.1 s late-run vs 0.17 s
    # isolated, DuckDB side 1.6 s vs 0.12 s). Capping DuckDB keeps
    # per-query numbers position-independent — the honest-methodology
    # fix for the compare-vs-driver-bench gap.
    con.sql("SET memory_limit='16GB'")
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
    s_best = {n: float("inf") for n in names}
    d_best = {n: float("inf") for n in names}
    for _ in range(N_RUNS):
        for name in names:
            t0 = time.perf_counter()
            _force(qs[name](spark, sf_dir))
            s_best[name] = min(s_best[name], time.perf_counter() - t0)
        for name in names:
            t0 = time.perf_counter()
            con.execute(osql[name]).fetchall()
            d_best[name] = min(d_best[name], time.perf_counter() - t0)
    rows = {
        name: {
            "spark": round(s_best[name], 4),
            "duckdb": round(d_best[name], 4),
            "ratio": round(s_best[name] / d_best[name], 3),
        }
        for name in names
    }

    s_total = round(sum(r["spark"] for r in rows.values()), 4)
    d_total = round(sum(r["duckdb"] for r in rows.values()), 4)
    print(
        json.dumps(
            {
                "metric": "spark_vs_duckdb",
                "sf": sf,
                "spark_floor_sec": round(floor, 4),
                "spark_total_sec": s_total,
                "duckdb_total_sec": d_total,
                "ratio": round(s_total / d_total, 3),
                "queries": rows,
            }
        )
    )


if __name__ == "__main__":
    main()
