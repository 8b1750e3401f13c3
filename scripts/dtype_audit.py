#!/usr/bin/env python
"""Strict cross-engine canonicalization audit — stronger than the
parity sweep.

The driver's correctness gate hashes values after sorting columns by
name; any value whose *representation* differs across engines (float
bit pattern, Decimal vs float, int width surfacing as float, datetime
unit) can hash-mismatch even when ``==`` says equal. The sweep's
``compare_frames`` catches class drift (int vs float); this audit goes
further and demands, for every oracled query at sf0.01:

  * exact pandas dtype equality per column (int32 vs int64 is a
    WARNING — any sane hasher canonicalizes width; float vs int or
    object-Decimal vs float64 is a FAILURE),
  * bitwise equality for float cells (struct.pack('<d') on aligned
    canonically-sorted rows),
  * repr equality for every other cell (what a stringifying hasher
    would see).

Exit 0 = no failures. Run: python scripts/dtype_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import decimal
import math

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

import __spark_entry__ as E
from clickstream_pipeline_aws_kafka_docker_airflow__spark.io import TABLES
from clickstream_pipeline_aws_kafka_docker_airflow__spark.testing import _canon_value


def _normalize_temporal(df: pd.DataFrame, temporal_cols=None) -> pd.DataFrame:
    """Fold the two provably-benign pandas-BRIDGE dtype classes into
    one canonical container so the warning layer only fires on real
    engine drift (int width, float vs int, Decimal surfacing):

    * ``datetime64[ns]`` -> ``datetime64[us]`` — Spark's toPandas emits
      ns, DuckDB's df() emits us; same instants, different unit.
    * object-of-``datetime.date`` -> ``datetime64[us]`` — Spark DATE
      columns surface as object cells, DuckDB DATE as datetime64[us];
      same logical DATE type, different pandas container.

    Both engines' CORRECTNESS comparison already canonicalizes these
    (four driver-green rounds with the raw containers differing); the
    fold makes ``warnings=0`` the clean baseline so any NEW warning is
    unambiguous signal.

    ``temporal_cols``: schema-declared DATE/TIMESTAMP column names (the
    Spark side knows its own schema) — folds empty/all-NULL object
    columns the value sniff below cannot classify.
    """
    import datetime as _dt

    for c in df.columns:
        s = df[c]
        if str(s.dtype).startswith("datetime64[ns]"):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            nn = s.dropna()
            declared = temporal_cols is not None and c in temporal_cols
            sniffed = len(nn) > 0 and all(
                isinstance(v, _dt.date) and not isinstance(v, _dt.datetime)
                for v in nn.head(20)
            )
            if declared or sniffed:
                df[c] = pd.to_datetime(s).astype("datetime64[us]")
    return df


def _sorted_raw(df: pd.DataFrame):
    """Rows in the canonical (sorted-column, canonical-value) order,
    but with the ORIGINAL cell objects preserved for strict checks."""
    cols = sorted(df.columns)
    raw = list(df[cols].itertuples(index=False, name=None))
    canon = [tuple(_canon_value(v) for v in r) for r in raw]
    order = sorted(
        range(len(raw)),
        key=lambda i: tuple((x is None, str(x)) for x in canon[i]),
    )
    return cols, [raw[i] for i in order]


def _is_null(v) -> bool:
    if v is None or v is pd.NaT:
        return True
    return isinstance(v, float) and math.isnan(v)


def _cell_drift(a, b) -> str | None:
    """Return a drift description for one (spark, duckdb) cell pair,
    or None when any value-hasher would see them identically."""
    if _is_null(a) and _is_null(b):
        return None
    if _is_null(a) != _is_null(b):
        return f"null drift: {a!r} vs {b!r}"
    if isinstance(a, decimal.Decimal) or isinstance(b, decimal.Decimal):
        return f"Decimal surfaced: {a!r} vs {b!r}"
    af = isinstance(a, (float, np.floating))
    bf = isinstance(b, (float, np.floating))
    if af != bf:
        return f"float/non-float: {a!r} ({type(a).__name__}) vs {b!r} ({type(b).__name__})"
    if af:
        pa, pb = struct.pack("<d", float(a)), struct.pack("<d", float(b))
        if pa != pb:
            return f"float bits differ: {float(a)!r} vs {float(b)!r}"
        return None
    if isinstance(a, (list, tuple, np.ndarray)) or isinstance(
        b, (list, tuple, np.ndarray)
    ):
        la = list(a) if not isinstance(a, (list, tuple)) else a
        lb = list(b) if not isinstance(b, (list, tuple)) else b
        if len(la) != len(lb):
            return f"seq length: {len(la)} vs {len(lb)}"
        for x, y in zip(la, lb):
            d = _cell_drift(x, y)
            if d:
                return f"seq elem: {d}"
        return None
    ca, cb = _canon_value(a), _canon_value(b)
    if repr(ca) != repr(cb):
        return f"repr drift: {ca!r} vs {cb!r}"
    return None


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    qs, osql = E.queries(), E.oracle_sql()
    only = {n for n in os.environ.get("AUDIT_ONLY", "").split(",") if n}
    if only:
        unknown = only - set(qs)
        if unknown:
            print(f"AUDIT_ONLY names not in registry: {sorted(unknown)}")
            return 2
        qs = {n: qs[n] for n in only}
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "13")
        .config("spark.ui.enabled", "false")
        # capacity only, never semantics: the default ~1g driver heap
        # thrashes at sf1 (the audit runs everything in one JVM)
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEMORY", "16g"),
        )
        .getOrCreate()
    )
    con = duckdb.connect(":memory:")
    for t in TABLES:
        # layout-agnostic: a table may be one file or a directory of
        # part files (the multi-file layout every real zone has)
        src = f"{sf}/{t}.parquet"
        pat = f"{src}/*.parquet" if os.path.isdir(src) else src
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    progress = bool(os.environ.get("AUDIT_PROGRESS"))
    failures, warnings = [], []
    for name in sorted(qs):
        if name not in osql:
            print(f"rows-only (skipped): {name}")
            continue
        if progress:
            import time as _time

            _t0 = _time.perf_counter()
        try:
            sdf = qs[name](spark, sf)
            tcols = {
                f.name
                for f in sdf.schema.fields
                if f.dataType.typeName() in ("date", "timestamp", "timestamp_ntz")
            }
            s = _normalize_temporal(sdf.toPandas(), tcols)
            d = _normalize_temporal(con.sql(osql[name]).df())
        except Exception as ex:  # noqa: BLE001 — audit must finish
            failures.append((name, f"{type(ex).__name__}: {str(ex)[:160]}"))
            if progress:
                print(
                    f"ERR  {name}: {_time.perf_counter() - _t0:.1f}s",
                    file=sys.stderr,
                    flush=True,
                )
            continue
        sc, s_rows = _sorted_raw(s)
        dc, d_rows = _sorted_raw(d)
        if sc != dc or len(s_rows) != len(d_rows):
            failures.append((name, f"shape: cols {sc}/{dc} rows {len(s_rows)}/{len(d_rows)}"))
            continue
        for c in sc:
            if str(s[c].dtype) != str(d[c].dtype):
                warnings.append((name, f"col {c!r}: dtype {s[c].dtype} vs {d[c].dtype}"))
        n_bad = 0
        for i, (ra, rb) in enumerate(zip(s_rows, d_rows)):
            for c, a, b in zip(sc, ra, rb):
                drift = _cell_drift(a, b)
                if drift:
                    n_bad += 1
                    if n_bad <= 3:
                        failures.append((name, f"row {i} col {c!r}: {drift}"))
        if n_bad > 3:
            failures.append((name, f"... {n_bad} drifting cells total"))
        if progress:
            print(
                f"done {name}: {_time.perf_counter() - _t0:.1f}s",
                file=sys.stderr,
                flush=True,
            )
    con.close()
    spark.stop()
    for n, w in warnings:
        print(f"WARN  {n}: {w}")
    for n, f_ in failures:
        print(f"FAIL  {n}: {f_}")
    print(f"audited={sum(1 for n in qs if n in osql)} warnings={len(warnings)} failures={len(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
