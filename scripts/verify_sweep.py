#!/usr/bin/env python
"""Two-partitioning oracle-parity sweep — the local twin of the
driver's correctness gate, plus the dtype drift check.

Runs every registered query at sf0.01 against its DuckDB oracle at
TWO shuffle-partition counts (summation-order-dependent results flip
with partitioning, so one pass can be green on luck). A query is
verified only if it matches at BOTH counts. Exit code 0 = all clean.

Usage: python scripts/verify_sweep.py [sf_dir]
(run from any cwd; a fresh process per invocation keeps sessions
vanilla, mirroring how the driver owns its session)

Since r11 every full default-sf run also writes the machine-readable
per-round artifact ``docs/SWEEP_r{N}.json``: per query x partition
count — status (ok / rows_only / mismatch / error), row count, and the
canonicalization-stable value hash of BOTH the Spark result and the
DuckDB oracle result. This is the durable record for the ~47 queries
the driver's 50-query sample has never drawn: a future round can diff
two artifacts to prove value-identical results without re-reading
prose. Round index mirrors bench.py (SPARK_GRAFT_ROUND env, else
max committed BENCH_r* + 1).
"""

from __future__ import annotations

import json
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as E
from clickstream_pipeline_aws_kafka_docker_airflow__spark.io import TABLES
from clickstream_pipeline_aws_kafka_docker_airflow__spark.testing import (
    compare_frames,
    value_hash,
)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    qs, osql = E.queries(), E.oracle_sql()
    rc = 0
    record: dict[str, dict] = {}
    for parts in ("7", "32"):
        spark = (
            SparkSession.builder.master("local[32]")
            .config("spark.sql.shuffle.partitions", parts)
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        print(f"[p={parts}] SMOKE: {len(E.entry(spark).collect())} rows")
        con = duckdb.connect(":memory:")
        for t in TABLES:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf}/{t}.parquet')"
            )
        bad = []
        for name in sorted(qs):
            rec = record.setdefault(name, {})
            try:
                sdf = qs[name](spark, sf).toPandas()
            except Exception as ex:  # noqa: BLE001 — sweep must finish
                bad.append((name, f"{type(ex).__name__}: {str(ex)[:160]}"))
                rec[f"p{parts}"] = {
                    "status": "error",
                    "error": f"{type(ex).__name__}: {str(ex)[:160]}",
                }
                continue
            entry = {"rows": len(sdf), "spark_hash": value_hash(sdf)}
            if name in osql:
                ddf = con.sql(osql[name]).df()
                entry["oracle_hash"] = value_hash(ddf)
                probs = compare_frames(sdf, ddf)
                if probs:
                    bad.append((name, probs[:3]))
                    entry["status"] = "mismatch"
                    entry["problems"] = [str(p) for p in probs[:3]]
                else:
                    entry["status"] = "ok"
            else:
                entry["status"] = "rows_only"
                print(f"[p={parts}] rows-only: {name} {len(sdf)}")
            rec[f"p{parts}"] = entry
        if bad:
            rc = 1
            print(f"[p={parts}] MISMATCHES:")
            for n, p in bad:
                print("  ", n, p)
        else:
            print(f"[p={parts}] MISMATCHES: none")
        con.close()
        spark.stop()

    if sf.rstrip("/").endswith("sf0.01"):
        rnd = os.environ.get("SPARK_GRAFT_ROUND")
        if rnd is None:
            prior = [
                int(m.group(1))
                for f in os.listdir(_REPO)
                if (m := re.match(r"BENCH_r(\d+)\.json$", f))
            ]
            rnd = f"{(max(prior) + 1) if prior else 1:02d}"
        path = os.path.join(_REPO, "docs", f"SWEEP_r{rnd}.json")
        n_ok = sum(
            1
            for r in record.values()
            if all(e.get("status") == "ok" for e in r.values())
        )
        with open(path, "w") as f:
            json.dump(
                {
                    "sf_dir": sf,
                    "partition_counts": [7, 32],
                    "n_queries": len(record),
                    "n_ok_both": n_ok,
                    "n_rows_only": sum(
                        1
                        for r in record.values()
                        if any(
                            e.get("status") == "rows_only" for e in r.values()
                        )
                    ),
                    "exit_code": rc,
                    "queries": record,
                },
                f,
                indent=1,
                sort_keys=True,
            )
        print(f"wrote {path}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
