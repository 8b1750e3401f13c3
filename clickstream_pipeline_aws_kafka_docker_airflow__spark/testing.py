"""Local oracle-parity harness — mimics the driver's correctness gate
(Spark result vs DuckDB oracle: row count + column names + value
equality, order-insensitive) so mismatches surface in pytest before the
driver sees them.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math

import duckdb
import numpy as np
import pandas as pd

from .io import TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect(":memory:")
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_value(v):
    """Canonicalize one cell for comparison across engines."""
    if v is None or v is pd.NaT:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return v
    if isinstance(v, (np.floating,)):
        return _canon_value(float(v))
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return None
        # truncate to microseconds (Spark precision)
        return v.floor("us").to_pydatetime().replace(tzinfo=None)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None)
    if isinstance(v, _dt.date):
        return _dt.datetime(v.year, v.month, v.day)
    if isinstance(v, np.ndarray):
        return tuple(_canon_value(x) for x in v)
    if isinstance(v, list):
        return tuple(_canon_value(x) for x in v)
    return v


def _canon_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_value(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


def _col_class(series: pd.Series) -> str | None:
    """Coarse value-class of a result column, for cross-engine dtype
    drift detection. int-vs-float is the signal that matters: DuckDB
    returns SUM(BIGINT) as HUGEINT (pandas float64) while Spark returns
    BIGINT (int64) — Python's ``6.0 == 6`` hides that from the value
    check, but the driver's hash distinguishes it. Decimal and float
    are one class (both engines surface DECIMAL aggregates
    interchangeably); date/datetime are one class (canonicalized by
    ``_canon_value``). Returns None when unclassifiable (empty/all-null
    object column)."""
    kind = series.dtype.kind
    if kind == "b":
        return "bool"
    if kind in "iu":
        return "int"
    if kind == "f":
        return "float"
    if kind == "M":
        return "datetime"
    if kind == "m":
        return "timedelta"
    for v in series:
        if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
            continue
        if isinstance(v, (bool, np.bool_)):
            return "bool"
        if isinstance(v, (int, np.integer)):
            return "int"
        if isinstance(v, (float, np.floating, _decimal.Decimal)):
            return "float"
        if isinstance(v, (pd.Timestamp, _dt.datetime, _dt.date)):
            return "datetime"
        if isinstance(v, str):
            return "str"
        if isinstance(v, (bytes, bytearray)):
            return "bytes"
        if isinstance(v, (list, tuple, np.ndarray)):
            return "seq"
        return type(v).__name__
    return None


def value_hash(pdf: pd.DataFrame) -> str:
    """Stable content hash of a result frame under the SAME
    canonicalization as ``compare_frames`` (sorted columns, canon
    cells, order-insensitive rows). Purpose: a diffable per-query
    fingerprint for the committed sweep artifacts (docs/SWEEP_r*.json)
    — two rounds produced identical values iff the hashes match.
    ``repr`` of canonicalized cells is stable across processes (floats
    via repr round-trip exactly; datetimes via isoformat)."""
    import hashlib

    def _cell(v):
        if isinstance(v, _dt.datetime):
            return v.isoformat()
        if isinstance(v, tuple):
            return tuple(_cell(x) for x in v)
        return v

    h = hashlib.sha256()
    h.update(repr(sorted(pdf.columns)).encode())
    for row in _canon_rows(pdf):
        h.update(repr(tuple(_cell(v) for v in row)).encode())
    return h.hexdigest()[:16]


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == parity)."""
    problems: list[str] = []
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        return [f"column mismatch: spark={sc} duckdb={dc}"]
    for c in sc:
        a, b = _col_class(spark_pdf[c]), _col_class(duck_pdf[c])
        if a is not None and b is not None and a != b:
            problems.append(f"dtype drift: col={c!r} spark={a} duckdb={b}")
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duckdb={len(duck_pdf)}")
    s_rows, d_rows = _canon_rows(spark_pdf), _canon_rows(duck_pdf)
    n_bad = 0
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        if a != b:
            n_bad += 1
            if n_bad <= 5:
                problems.append(f"row {i}: spark={a!r} != duckdb={b!r} (cols={sc})")
    if n_bad > 5:
        problems.append(f"... {n_bad} mismatched rows total of {len(s_rows)}")
    return problems


def assert_parity(spark, sf_dir: str, name: str, query_fn, sql: str) -> None:
    sdf = query_fn(spark, sf_dir).toPandas()
    con = duckdb_connect(sf_dir)
    try:
        ddf = con.sql(sql).df()
    finally:
        con.close()
    problems = compare_frames(sdf, ddf)
    assert not problems, f"[{name}] oracle mismatch:\n" + "\n".join(problems)
