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
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as E
from clickstream_pipeline_aws_kafka_docker_airflow__spark.io import TABLES
from clickstream_pipeline_aws_kafka_docker_airflow__spark.testing import (
    compare_frames,
)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    qs, osql = E.queries(), E.oracle_sql()
    rc = 0
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
            try:
                sdf = qs[name](spark, sf).toPandas()
            except Exception as ex:  # noqa: BLE001 — sweep must finish
                bad.append((name, f"{type(ex).__name__}: {str(ex)[:160]}"))
                continue
            if name in osql:
                probs = compare_frames(sdf, con.sql(osql[name]).df())
                if probs:
                    bad.append((name, probs[:3]))
            else:
                print(f"[p={parts}] rows-only: {name} {len(sdf)}")
        if bad:
            rc = 1
            print(f"[p={parts}] MISMATCHES:")
            for n, p in bad:
                print("  ", n, p)
        else:
            print(f"[p={parts}] MISMATCHES: none")
        con.close()
        spark.stop()
    return rc


if __name__ == "__main__":
    sys.exit(main())
