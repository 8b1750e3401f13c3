"""Static division-by-zero census over every registered query plan.

The r9 fuzz campaign proved this Spark build (ANSI mode on by default
in Spark 4.x) throws ``DIVIDE_BY_ZERO`` for ANY numeric division with
a zero denominator — including double/double — where DuckDB (the
oracle semantics) returns NULL. Two instances were found by sampling
(`q14_promo_revenue`, `q8_market_share`, both fixed with
``try_divide``); this census closes the CLASS statically, the way the
r7 nullable-order-key sweep closed NULL ordering.

Method: for each of the 128 registered queries, walk the ANALYZED
logical plan string (the optimized plan erases the distinction —
``try_divide`` is rewritten to a ``/`` with an invisible TRY eval
mode, verified empirically) and extract every ANSI-throwing site:

* ``(num / den)``   — Divide
* ``(num % den)``   — Remainder
* ``pmod(num, den)`` — Pmod
* ``(num div den)`` — IntegralDivide (added r11: the generative ANSI
  fuzzer found ``x div 0`` throws DIVIDE_BY_ZERO where DuckDB ``//``
  returns NULL — a class this census had missed because it only
  scanned the ``/ % pmod`` spellings; 23 plans carry ``div`` sites)

``try_divide(...)`` / ``try_mod(...)`` calls are skipped (their inner
rendering is the function form, not the operator form). Each site's
DENOMINATOR is extracted by balanced-paren parse and normalized
(expr-ids ``#123`` stripped, whitespace collapsed) into a signature.

Output: JSON map ``query -> sorted list of denominator signatures``
for adjudication in ``tests/test_div_census.py``.
"""

from __future__ import annotations

import json
import re
import sys

sys.path.insert(0, "/root/repo")

_OPS = (" / ", " % ", " div ")
_OP_SIG = {" / ": "/", " % ": "%", " div ": "div"}


def _denominator_after(s: str, pos: int) -> str:
    """Balanced-paren parse of the operand starting at ``pos``."""
    depth = 0
    i = pos
    while i < len(s):
        c = s[i]
        if c == "(":
            depth += 1
        elif c == ")":
            if depth == 0:
                break
            depth -= 1
        elif c == "," and depth == 0:
            break
        i += 1
    return s[pos:i]


def _pmod_denominator(s: str, open_paren: int) -> str:
    """Second argument of a pmod( call whose '(' is at open_paren."""
    depth = 0
    i = open_paren
    comma = None
    while i < len(s):
        c = s[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                break
        elif c == "," and depth == 1:
            comma = i
        i += 1
    if comma is None:
        return ""
    return s[comma + 1 : i].strip()


def normalize(sig: str) -> str:
    sig = re.sub(r"#\d+L?", "", sig)
    # lambda variable ids are session-order-dependent (x_13, y_14, ...);
    # SQL-parsed lambdas keep their written names (x, acc, ...) with no
    # numeric suffix — normalize both spellings of the same arithmetic
    sig = re.sub(r"\blambda [a-z]+(_\d+)?\b", "lambda v", sig)  # keep in sync with the twin normalizer (div_census.py <-> plan_census.py)
    sig = re.sub(r"\s+", " ", sig).strip()
    return sig


def division_sites(plan: str) -> set[str]:
    """Normalized denominator signatures of every ANSI-throwing
    division/remainder/pmod in a plan string."""
    out: set[str] = set()
    for line in plan.splitlines():
        for op in _OPS:
            start = 0
            while True:
                j = line.find(op, start)
                if j < 0:
                    break
                den = _denominator_after(line, j + len(op))
                if den:
                    out.add(_OP_SIG[op] + " " + normalize(den))
                start = j + len(op)
        for m in re.finditer(r"\bpmod\(", line):
            den = _pmod_denominator(line, m.end() - 1)
            if den:
                out.add("pmod " + normalize(den))
    return out


def is_safe_literal(sig: str) -> bool:
    """True when the denominator is a nonzero constant literal
    (possibly cast): structurally can never be zero."""
    body = re.sub(r"^(?:/|%|pmod|div) ", "", sig)
    # strip arbitrarily nested casts: cast(X as type)
    prev = None
    while prev != body:
        prev = body
        body = re.sub(r"^cast\((.*) as [a-z0-9() ,]+\)$", r"\1", body)
    try:
        return float(body) != 0.0
    except ValueError:
        return False


def main() -> None:
    from pyspark.sql import SparkSession

    from clickstream_pipeline_aws_kafka_docker_airflow__spark import registry

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    census: dict[str, list[str]] = {}
    errs: dict[str, str] = {}
    for name, fn in sorted(registry.queries().items()):
        try:
            df = fn(spark, sf)
            plan = df._jdf.queryExecution().analyzed().toString()
            sites = {
                s for s in division_sites(plan) if not is_safe_literal(s)
            }
            if sites:
                census[name] = sorted(sites)
        except Exception as e:  # pragma: no cover
            errs[name] = repr(e)[:200]
    print(json.dumps({"census": census, "errors": errs}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
