#!/usr/bin/env python
"""Generative cross-engine scalar-expression fuzzer (r10 verdict
next-round #1): FIND the next ANSI divergence class instead of waiting
for it to bite a query.

The r9/r10 censuses closed two divergence classes that were found by
sampling (division-by-zero -> DIVIDE_BY_ZERO vs DuckDB NULL;
element_at out-of-bounds -> INVALID_ARRAY_INDEX vs list_extract NULL).
Both class lists were assembled by inspection. This harness searches
the expression space mechanically:

* a typed expression grammar over the scalar surface the repo's 128
  queries actually use — arithmetic (+ - * / % div pmod), casts and
  try_-variants, math (sqrt ln exp power round floor ceil sign abs),
  strings (|| upper lower trim substring repeat lpad replace instr
  split_part left length), arrays (element_at size slice
  array_contains), temporal (to_date date_add datediff year make_date),
  conditionals (CASE nullif coalesce comparison and/or/not);
* every node is rendered TWICE from one AST — Spark-ANSI SQL and the
  DuckDB twin our oracles would write (element_at<->list_extract,
  instr<->strpos, datediff<->date_diff('day',..), pmod<->((a%b)+b)%b,
  try_divide<->plain `/` ...);
* leaves draw from hostile pools: 0, -1, '', NULL-typed, INT32/INT64
  extremes, 1e308, empty arrays, arrays containing NULL, invalid date
  strings, min/max dates;
* each expression is evaluated on BOTH engines and the outcome is
  classified error / NULL / value (values compared canonically,
  float-tolerant, NaN==NaN); every disagreement is bucketed into a
  class keyed (root_op, spark_kind, duck_kind).

Found classes are adjudicated in ``DISPOSITIONS`` below — each is
either already censused over all 128 analyzed plans, structurally
absent from the plans (asserted by ``tests/test_ansi_divergence.py``),
guarded at every site, or mirrored explicitly in the oracles. A class
with no disposition makes the run exit 1 (the per-round ritual fails
loudly on a NEW find until it is fixed the q14 way — ``try_*`` /
matching DuckDB NULL semantics — or adjudicated here).

Usage: python scripts/ansi_fuzzer.py [n_per_seed] [seed,seed,...]
Writes docs/ANSI_DIVERGENCE.json.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import json
import math
import os
import random
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# ---------------------------------------------------------------- grammar

# type tags: i int32, l int64, d double, s string, dt date, ai int[],
# b bool
_SPARK_T = {"i": "INT", "l": "BIGINT", "d": "DOUBLE", "s": "STRING",
            "dt": "DATE", "b": "BOOLEAN"}
_DUCK_T = {"i": "INTEGER", "l": "BIGINT", "d": "DOUBLE", "s": "VARCHAR",
           "dt": "DATE", "b": "BOOLEAN"}

# literal pools: (spark_sql, duck_sql) pairs — identical unless syntax
# differs (typed NULLs, arrays)
def _null(t):
    return (f"CAST(NULL AS {_SPARK_T[t]})", f"CAST(NULL AS {_DUCK_T[t]})")


_POOLS: dict[str, list[tuple[str, str]]] = {
    "i": [(x, x) for x in ("0", "1", "-1", "2", "7", "100",
                           "2147483647", "(-2147483647 - 1)")] + [_null("i")],
    "l": [(f"CAST({x} AS BIGINT)", f"CAST({x} AS BIGINT)")
          for x in ("0", "1", "-1", "1000000007",
                    "9223372036854775807", "-9223372036854775807")]
         + [_null("l")],
    "d": [(x, x) for x in ("0.0", "-0.0", "1.5", "-2.5", "1e308",
                           "-1e308", "1e-300", "0.1", "3.5", "2.5")]
         + [_null("d")],
    "s": [(repr(x).replace('"', "'"), repr(x).replace('"', "'"))
          for x in ("", " ", "abc", "0", "-1", "Abc aBc", "2020-01-01",
                    "not-a-date", "2020-13-45", "  42  ", "%d", "a,b,c")]
         + [("'ß'", "'ß'")] + [_null("s")],
    "dt": [(f"DATE '{x}'", f"DATE '{x}'")
           for x in ("2020-01-15", "0001-01-01", "9999-12-31")]
          + [_null("dt")],
    "ai": [
        ("array(1, 2, 3)", "[1, 2, 3]"),
        ("array(0, -1, 2147483647)", "[0, -1, 2147483647]"),
        ("CAST(array() AS ARRAY<INT>)", "CAST([] AS INTEGER[])"),
        ("array(CAST(NULL AS INT), 5)", "[CAST(NULL AS INTEGER), 5]"),
    ],
    "b": [("TRUE", "TRUE"), ("FALSE", "FALSE")] + [_null("b")],
}

# (name, ret, argtypes, spark_fmt, duck_fmt)
_OPS: list[tuple[str, str, tuple[str, ...], str, str]] = [
    # integer arithmetic (both engines range-check INT32/64 in their
    # strict modes — overflow parity is itself under test)
    ("add_i", "i", ("i", "i"), "({0} + {1})", "({0} + {1})"),
    ("sub_i", "i", ("i", "i"), "({0} - {1})", "({0} - {1})"),
    ("mul_i", "i", ("i", "i"), "({0} * {1})", "({0} * {1})"),
    ("add_l", "l", ("l", "l"), "({0} + {1})", "({0} + {1})"),
    ("mul_l", "l", ("l", "l"), "({0} * {1})", "({0} * {1})"),
    ("div", "d", ("i", "i"), "({0} / {1})", "({0} / {1})"),
    ("div_d", "d", ("d", "d"), "({0} / {1})", "({0} / {1})"),
    ("intdiv", "l", ("i", "i"), "({0} div {1})", "({0} // {1})"),
    ("mod", "i", ("i", "i"), "({0} % {1})", "({0} % {1})"),
    ("mod_d", "d", ("d", "d"), "({0} % {1})", "({0} % {1})"),
    ("pmod", "i", ("i", "i"), "pmod({0}, {1})",
     "((({0} % {1}) + {1}) % {1})"),
    # the repo's established fix pattern vs the oracle twin it claims
    # to match
    ("try_divide", "d", ("d", "d"), "try_divide({0}, {1})",
     "({0} / {1})"),
    ("try_divide_i", "d", ("i", "i"), "try_divide({0}, {1})",
     "({0} / {1})"),
    ("neg", "i", ("i",), "(- {0})", "(- {0})"),
    ("abs_i", "i", ("i",), "abs({0})", "abs({0})"),
    ("abs_d", "d", ("d",), "abs({0})", "abs({0})"),
    # math
    ("sqrt", "d", ("d",), "sqrt({0})", "sqrt({0})"),
    ("ln", "d", ("d",), "ln({0})", "ln({0})"),
    ("exp", "d", ("d",), "exp({0})", "exp({0})"),
    ("power", "d", ("d", "d"), "power({0}, {1})", "power({0}, {1})"),
    ("round2", "d", ("d", "i"), "round({0}, {1})", "round({0}, {1})"),
    ("floor", "l", ("d",), "CAST(floor({0}) AS BIGINT)",
     "CAST(floor({0}) AS BIGINT)"),
    ("ceil", "l", ("d",), "CAST(ceil({0}) AS BIGINT)",
     "CAST(ceil({0}) AS BIGINT)"),
    ("sign", "d", ("d",), "sign({0})", "sign({0})"),
    # casts (ANSI throwing + try twins)
    ("cast_s_i", "i", ("s",), "CAST({0} AS INT)",
     "CAST({0} AS INTEGER)"),
    ("cast_s_d", "d", ("s",), "CAST({0} AS DOUBLE)",
     "CAST({0} AS DOUBLE)"),
    ("cast_d_i", "i", ("d",), "CAST({0} AS INT)",
     "CAST({0} AS INTEGER)"),
    ("cast_l_i", "i", ("l",), "CAST({0} AS INT)",
     "CAST({0} AS INTEGER)"),
    ("cast_i_s", "s", ("i",), "CAST({0} AS STRING)",
     "CAST({0} AS VARCHAR)"),
    ("cast_d_s", "s", ("d",), "CAST({0} AS STRING)",
     "CAST({0} AS VARCHAR)"),
    ("cast_s_date", "dt", ("s",), "CAST({0} AS DATE)",
     "CAST({0} AS DATE)"),
    ("cast_date_s", "s", ("dt",), "CAST({0} AS STRING)",
     "CAST({0} AS VARCHAR)"),
    ("try_cast_s_i", "i", ("s",), "TRY_CAST({0} AS INT)",
     "TRY_CAST({0} AS INTEGER)"),
    ("try_cast_s_date", "dt", ("s",), "TRY_CAST({0} AS DATE)",
     "TRY_CAST({0} AS DATE)"),
    # strings
    ("concat", "s", ("s", "s"), "({0} || {1})", "({0} || {1})"),
    ("upper", "s", ("s",), "upper({0})", "upper({0})"),
    ("lower", "s", ("s",), "lower({0})", "lower({0})"),
    ("trim", "s", ("s",), "trim({0})", "trim({0})"),
    ("length", "i", ("s",), "length({0})",
     "CAST(length({0}) AS INTEGER)"),
    ("substring", "s", ("s", "i", "i"), "substring({0}, {1}, {2})",
     "substring({0}, {1}, {2})"),
    ("repeat", "s", ("s", "i"), "repeat({0}, {1})",
     "repeat({0}, {1})"),
    ("lpad", "s", ("s", "i"), "lpad({0}, {1}, 'x')",
     "lpad({0}, {1}, 'x')"),
    ("replace", "s", ("s", "s"), "replace({0}, {1}, 'z')",
     "replace({0}, {1}, 'z')"),
    ("instr", "i", ("s", "s"), "instr({0}, {1})",
     "CAST(strpos({0}, {1}) AS INTEGER)"),
    ("split_part", "s", ("s", "i"), "split_part({0}, ',', {1})",
     "split_part({0}, ',', {1})"),
    ("left", "s", ("s", "i"), "left({0}, {1})", "left({0}, {1})"),
    # arrays
    ("element_at", "i", ("ai", "i"), "element_at({0}, {1})",
     "list_extract({0}, {1})"),
    ("try_element_at", "i", ("ai", "i"), "try_element_at({0}, {1})",
     "list_extract({0}, {1})"),
    ("size", "i", ("ai",), "size({0})", "CAST(len({0}) AS INTEGER)"),
    # duck end-bound computed in BIGINT: an INT32 overflow in the
    # TWIN's own arithmetic is a harness artifact, not a divergence
    ("slice", "ai", ("ai", "i", "i"), "slice({0}, {1}, {2})",
     "list_slice({0}, {1}, CAST({1} AS BIGINT) + ({2}) - 1)"),
    ("array_contains", "b", ("ai", "i"), "array_contains({0}, {1})",
     "list_contains({0}, {1})"),
    # temporal
    ("to_date", "dt", ("s",), "to_date({0}, 'yyyy-MM-dd')",
     "strptime({0}, '%Y-%m-%d')::DATE"),
    ("date_add", "dt", ("dt", "i"), "date_add({0}, {1})",
     "({0} + ({1}))"),
    ("datediff", "i", ("dt", "dt"), "datediff({0}, {1})",
     "CAST(date_diff('day', {1}, {0}) AS INTEGER)"),
    ("year", "i", ("dt",), "year({0})",
     "CAST(year({0}) AS INTEGER)"),
    ("make_date", "dt", ("i", "i", "i"), "make_date({0}, {1}, {2})",
     "make_date({0}, {1}, {2})"),
    # conditionals / boolean
    ("eq_i", "b", ("i", "i"), "({0} = {1})", "({0} = {1})"),
    ("lt_d", "b", ("d", "d"), "({0} < {1})", "({0} < {1})"),
    ("eq_s", "b", ("s", "s"), "({0} = {1})", "({0} = {1})"),
    ("case_i", "i", ("b", "i", "i"),
     "(CASE WHEN {0} THEN {1} ELSE {2} END)",
     "(CASE WHEN {0} THEN {1} ELSE {2} END)"),
    ("nullif_i", "i", ("i", "i"), "nullif({0}, {1})",
     "nullif({0}, {1})"),
    ("coalesce_i", "i", ("i", "i"), "coalesce({0}, {1})",
     "coalesce({0}, {1})"),
    ("and", "b", ("b", "b"), "({0} AND {1})", "({0} AND {1})"),
    ("or", "b", ("b", "b"), "({0} OR {1})", "({0} OR {1})"),
    ("not", "b", ("b",), "(NOT {0})", "(NOT {0})"),
]

_BY_RET: dict[str, list] = {}
for op in _OPS:
    _BY_RET.setdefault(op[1], []).append(op)


class Node:
    __slots__ = ("op", "t", "args", "sp", "dk")

    def __init__(self, op, t, args, sp, dk):
        self.op, self.t, self.args, self.sp, self.dk = op, t, args, sp, dk

    def subtrees(self):
        """Proper descendants, post-order (deepest first)."""
        for a in self.args:
            yield from a.subtrees()
            yield a


def gen(rng: random.Random, t: str, depth: int) -> Node:
    if depth <= 0 or t not in _BY_RET or rng.random() < 0.25:
        sp, dk = rng.choice(_POOLS[t])
        return Node("literal", t, [], sp, dk)
    name, _ret, args, spf, dkf = rng.choice(_BY_RET[t])
    kids = [gen(rng, a, depth - 1) for a in args]
    return Node(
        name,
        t,
        kids,
        spf.format(*[k.sp for k in kids]),
        dkf.format(*[k.dk for k in kids]),
    )

# ------------------------------------------------------------- evaluation

_SPARK_ERR = re.compile(r"\[([A-Z0-9_.]+)\]")
_JAVA_ERR = re.compile(r"(java\.lang\.\w+(?:Exception|Error))")


def spark_outcome(spark, sql: str):
    try:
        rows = spark.sql(f"SELECT {sql} AS v").collect()
        return ("value", rows[0][0])
    except Exception as ex:  # noqa: BLE001
        m = _SPARK_ERR.search(str(ex)) or _JAVA_ERR.search(str(ex))
        return ("error", m.group(1) if m else type(ex).__name__)


class Duck:
    """DuckDB eval with automatic reconnect: some error paths leave the
    connection replying 'Attempting to execute an unsuccessful or
    closed pending query' to every later statement — without the
    reconnect those later evals would be misrecorded as divergences."""

    def __init__(self, duckdb):
        self._duckdb = duckdb
        self._con = duckdb.connect(":memory:")

    def outcome(self, sql: str):
        for _ in range(2):
            try:
                v = self._con.sql(f"SELECT {sql} AS v").fetchall()[0][0]
                return ("value", v)
            except Exception as ex:  # noqa: BLE001
                msg = str(ex)
                if "pending query" in msg or "closed" in msg.lower():
                    self._con = self._duckdb.connect(":memory:")
                    continue
                return ("error", f"{type(ex).__name__}: {msg[:80]}")
        return ("error", "ConnectionPoisoned: retried once")


def _canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, _decimal.Decimal):
        return float(v)
    if isinstance(v, (int,)):
        return float(v)
    if isinstance(v, float):
        return v
    if isinstance(v, _dt.datetime):
        return v.date().isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return v


def values_agree(a, b) -> bool:
    a, b = _canon(a), _canon(b)
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        if math.isinf(a) or math.isinf(b):
            return a == b
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(
            values_agree(x, y) for x, y in zip(a, b)
        )
    return a == b


def outcome_kind(o) -> str:
    if o[0] == "error":
        return "error"
    return "null" if o[1] is None else "value"


# ------------------------------------------------------- adjudication map
#
# Every class the fuzzer has found, adjudicated. Key =
# (root_op, spark_kind, duck_kind). A find with no entry => exit 1.
# Dispositions:
#   censused       — a suite test sweeps all 128 analyzed plans for the
#                    class (file named in note)
#   absent         — op family absent from every analyzed plan,
#                    asserted by tests/test_ansi_divergence.py
#   guarded        — all plan sites structurally avoid the divergent
#                    region (adjudicated file:line in note)
#   oracle-mirror  — the repo's oracles express the same semantics
#                    explicitly on both sides, so the raw-SQL
#                    divergence can't reach a query/oracle pair
#   benign-value   — value-level difference inside documented rounding
#                    /dtype conventions (oracles ROUND/CAST per README)
DISPOSITIONS: dict[tuple[str, str, str], dict] = {
    # --- the two classes the r9/r10 censuses closed (anchors) ---
    ("div", "error", "value"): {
        "status": "censused",
        "note": "DIVIDE_BY_ZERO vs DuckDB NULL/inf: "
                "tests/test_div_census.py sweeps every / % pmod site "
                "in all 128 analyzed plans against the adjudicated "
                "structurally-nonzero allowlist",
    },
    ("div_d", "error", "value"): {
        "status": "censused",
        "note": "same class, double operands (DuckDB x/0.0 -> inf, "
                "0.0/0.0 -> NaN; ANSI throws): test_div_census.py",
    },
    ("div", "error", "null"): {
        "status": "censused", "note": "see (div, error, value)",
    },
    ("div_d", "error", "null"): {
        "status": "censused", "note": "see (div_d, error, value)",
    },
    ("mod", "error", "null"): {
        "status": "censused", "note": "x % 0: test_div_census.py",
    },
    ("mod_d", "error", "null"): {
        "status": "censused", "note": "x % 0.0: test_div_census.py",
    },
    ("mod_d", "error", "value"): {
        "status": "censused", "note": "x % 0.0: test_div_census.py",
    },
    ("pmod", "error", "null"): {
        "status": "censused",
        "note": "pmod(x, 0): test_div_census.py sweeps pmod sites",
    },
    ("element_at", "error", "null"): {
        "status": "censused",
        "note": "INVALID_ARRAY_INDEX vs list_extract NULL: "
                "test_div_census.py::test_element_at_census — all 7 "
                "sites adjudicated structurally in-range",
    },
    ("element_at", "error", "value"): {
        "status": "censused",
        "note": "element_at(xs, 0) throws ELEMENT_AT_BY_INDEX_ZERO "
                "where DuckDB list_extract(xs, 0) returns NULL — same "
                "census as index-out-of-bounds",
    },
    # --- classes FOUND by this fuzzer in r11, adjudicated ---
    ("intdiv", "error", "null"): {
        "status": "censused",
        "note": "x div 0 throws DIVIDE_BY_ZERO vs DuckDB // NULL; the "
                "r10 division census missed the div spelling — "
                "scripts/div_census.py now sweeps ' div ' and "
                "tests/test_div_census.py adjudicates all 23 "
                "div-carrying plans (r11)",
    },
    ("cast_d_i", "value", "value"): {
        "status": "censused",
        "note": "CAST(double AS INT): Spark truncates toward zero "
                "(-2.5 -> -2), DuckDB ROUNDS (-2.5 -> -3) — silent "
                "value divergence on any fractional source. "
                "tests/test_ansi_divergence.py::test_cast_to_int_census "
                "pins every cast-to-int site in all 128 analyzed plans "
                "to integer/boolean-valued sources",
    },
    ("slice", "error", "value"): {
        "status": "censused",
        "note": "slice(arr, 0, n) / negative length throws "
                "INVALID_PARAMETER_VALUE where list_slice returns a "
                "value; test_slice_census pins the 3 sites (start >= "
                "1, constant positive length)",
    },
    ("slice", "value", "error"): {
        "status": "censused",
        "note": "complementary direction (huge start: Spark [] vs "
                "DuckDB end-bound overflow error) — same 3 pinned "
                "sites, structurally in-range",
    },
    ("split_part", "error", "value"): {
        "status": "censused",
        "note": "index 0: INVALID_INDEX_OF_ZERO vs DuckDB '' — "
                "test_split_part_absent asserts the function appears "
                "in no plan",
    },
    ("split_part", "null", "value"): {
        "status": "censused",
        "note": "NULL input: Spark NULL-propagates, DuckDB returns '' "
                "— same absence census",
    },
    ("array_contains", "null", "value"): {
        "status": "censused",
        "note": "NULL element + missing needle: Spark three-valued "
                "NULL vs list_contains FALSE — "
                "test_array_contains_census pins the single site "
                "(split() output, elements never NULL)",
    },
    ("try_element_at", "error", "null"): {
        "status": "censused",
        "note": "try_element_at(arr, INT_MIN) throws java.lang."
                "IndexOutOfBoundsException (negation overflow in the "
                "from-end path) instead of NULL — "
                "test_try_element_at_census pins the one site as a "
                "MAP-key lookup (no positional path)",
    },
    ("floor", "value", "error"): {
        "status": "censused",
        "note": "FLOOR(|x| >= 2^63) clamps to the BIGINT extremes "
                "where DuckDB's conversion errors — "
                "test_floor_ceil_census pins the 3 sites as bounded "
                "by construction",
    },
    ("ceil", "value", "error"): {
        "status": "censused",
        "note": "same clamp class as floor — same census",
    },
    ("fold_elision", "null", "error"): {
        "status": "fail-loud",
        "note": "one engine's constant folding / null propagation "
                "skipped a throwing child the other engine evaluated "
                "(e.g. x < NULL folds to NULL before x's error "
                "surfaces). One side ALWAYS errors, so the oracle "
                "gate (sweep + driver) surfaces any real instance "
                "loudly — it cannot silently corrupt a green pair",
    },
    ("fold_elision", "value", "error"): {
        "status": "fail-loud",
        "note": "see (fold_elision, null, error)",
    },
    ("fold_elision", "error", "null"): {
        "status": "fail-loud",
        "note": "see (fold_elision, null, error); reverse direction",
    },
    ("fold_elision", "error", "value"): {
        "status": "fail-loud",
        "note": "see (fold_elision, null, error); reverse direction",
    },
}


def _diverges(spark, duck: "Duck", node: Node):
    """(divergent?, spark_outcome, duck_outcome) for one subtree."""
    so = spark_outcome(spark, node.sp)
    do = duck.outcome(node.dk)
    sk, dkk = outcome_kind(so), outcome_kind(do)
    if sk == "error" and dkk == "error":
        return False, so, do  # both fail-loud: parity holds
    if sk == dkk and (sk != "value" or values_agree(so[1], do[1])):
        return False, so, do
    return True, so, do


def shrink(spark, duck: "Duck", node: Node):
    """(minimal divergent subtree, spark_outcome, duck_outcome,
    saw_both_error): if any proper descendant already diverges on its
    own, the root op is an innocent carrier — classify by the deepest
    divergent subtree instead (post-order scan). ``saw_both_error``
    marks a descendant on which BOTH engines threw: when the minimal
    node then shows one-side-error divergence, the mechanism is
    error-elision-by-folding (one engine's constant folding / null
    propagation skipped a throwing child the other engine evaluated)
    rather than an op-specific semantic — classified as the synthetic
    ``fold_elision`` class regardless of carrier op. A few extra evals
    per FIND, not per expression."""
    saw_both_error = False
    for sub in node.subtrees():
        if sub.op == "literal":
            continue
        so = spark_outcome(spark, sub.sp)
        do = duck.outcome(sub.dk)
        sk, dkk = outcome_kind(so), outcome_kind(do)
        if sk == "error" and dkk == "error":
            saw_both_error = True
            continue
        if sk == dkk and (sk != "value" or values_agree(so[1], do[1])):
            continue
        return sub, so, do, saw_both_error
    _d, so, do = _diverges(spark, duck, node)
    return node, so, do, saw_both_error


def classify_key(mini: Node, mso, mdo, saw_both_error: bool):
    sk, dkk = outcome_kind(mso), outcome_kind(mdo)
    one_side_error = (sk == "error") != (dkk == "error")
    if saw_both_error and one_side_error:
        return ("fold_elision", sk, dkk)
    return (mini.op, sk, dkk)


def _cap(x, limit: int = 256) -> str:
    """Render a captured outcome value for the artifact, truncated.
    r11 shipped values verbatim and lpad('...', 2147483647, 'x') put a
    ~0.5 GB string of 'x' into docs/ANSI_DIVERGENCE.json (r11 verdict
    What's-wrong #1); the class is identified by its first bytes plus
    the true length, never by half a gigabyte of payload."""
    s = str(x)
    return s if len(s) <= limit else f"{s[:limit]}...<len={len(s)}>"


def main() -> int:
    n_per_seed = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    seeds = (
        [int(s) for s in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [127, 131, 137]
    )
    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    # every ANSI throw logs a full stack trace via SQLQueryContextLogger
    # — thousands of intentional errors would flood the terminal
    spark.sparkContext.setLogLevel("OFF")
    duck = Duck(duckdb)

    classes: dict[tuple[str, str, str], dict] = {}
    n_total = n_agree = 0
    kind_matrix: dict[str, int] = {}
    for seed in seeds:
        rng = random.Random(seed)
        for _ in range(n_per_seed):
            t = rng.choice(["i", "l", "d", "s", "dt", "ai", "b"])
            tree = gen(rng, t, rng.randint(1, 4))
            if tree.op == "literal":
                continue
            d, so, do = _diverges(spark, duck, tree)
            sk, dkk = outcome_kind(so), outcome_kind(do)
            n_total += 1
            kind_matrix[f"{sk}/{dkk}"] = (
                kind_matrix.get(f"{sk}/{dkk}", 0) + 1
            )
            if not d:
                n_agree += 1
                continue
            mini, mso, mdo, sbe = shrink(spark, duck, tree)
            key = classify_key(mini, mso, mdo, sbe)
            c = classes.setdefault(
                key, {"n": 0, "examples": [], "seeds": set()}
            )
            c["n"] += 1
            c["seeds"].add(seed)
            if len(c["examples"]) < 3:
                c["examples"].append(
                    {
                        "spark_sql": _cap(mini.sp),
                        "duck_sql": _cap(mini.dk),
                        "spark": [_cap(x) for x in mso],
                        "duck": [_cap(x) for x in mdo],
                    }
                )

    new = {k: v for k, v in classes.items() if k not in DISPOSITIONS}
    out = {
        "n_expressions": n_total,
        "n_agree": n_agree,
        "n_divergent": n_total - n_agree,
        "seeds": seeds,
        "outcome_matrix": dict(sorted(kind_matrix.items())),
        "classes": {
            "|".join(k): {
                "n": v["n"],
                "seeds": sorted(v["seeds"]),
                "examples": v["examples"],
                **DISPOSITIONS.get(
                    k, {"status": "NEW", "note": "UNADJUDICATED"}
                ),
            }
            for k, v in sorted(classes.items())
        },
        "anchors_expected": [
            "|".join(k)
            for k in (
                ("div", "error", "value"),
                ("element_at", "error", "null"),
            )
        ],
        "n_new": len(new),
    }
    path = os.path.join(_REPO, "docs", "ANSI_DIVERGENCE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v["n"] for k, v in out["classes"].items()},
                     indent=1))
    print(f"total={n_total} agree={n_agree} "
          f"divergent_classes={len(classes)} NEW={len(new)}")
    print(f"wrote {path}")
    spark.stop()
    duck._con.close()
    return 1 if new else 0


if __name__ == "__main__":
    sys.exit(main())
