"""Generic analyzed-plan call-site extraction — shared by the ANSI
divergence censuses (tests/test_ansi_divergence.py, and the
div/element_at censuses' successors).

A Spark analyzed-plan string renders scalar calls as
``fname(arg1, arg2, ...)`` and casts as ``cast(expr as type)``. These
helpers pull out normalized argument signatures for a named call so a
suite test can pin an adjudicated allowlist per divergence class, the
way scripts/div_census.py does for division sites.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")


def _normalize(sig: str) -> str:
    sig = re.sub(r"#\d+L?", "", sig)
    # DSL lambdas get numeric suffixes (x_13); SQL-parsed lambdas keep
    # their written names (x, acc) — normalize both
    sig = re.sub(r"\blambda [a-z]+(_\d+)?\b", "lambda v", sig)  # keep in sync with the twin normalizer (div_census.py <-> plan_census.py)
    sig = re.sub(r"\s+", " ", sig).strip()
    return sig


def _balanced_args(s: str, open_paren: int) -> list[str] | None:
    """Split the argument list of a call whose '(' is at ``open_paren``
    into top-level comma-separated pieces. None if unbalanced (line
    truncation)."""
    depth = 0
    args: list[str] = []
    start = open_paren + 1
    i = open_paren
    while i < len(s):
        c = s[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                args.append(s[start:i])
                return args
        elif c == "," and depth == 1:
            args.append(s[start:i])
            start = i + 1
        i += 1
    return None


def call_sites(plan: str, fname: str) -> list[tuple[str, ...]]:
    """All ``fname(...)`` call sites in a plan string, as tuples of
    normalized top-level argument signatures. Word-boundary match, so
    ``element_at`` does not match ``try_element_at``."""
    out: list[tuple[str, ...]] = []
    pat = re.compile(r"(?<![\w_])" + re.escape(fname) + r"\(")
    for line in plan.splitlines():
        for m in pat.finditer(line):
            args = _balanced_args(line, m.end() - 1)
            if args is not None:
                out.append(tuple(_normalize(a) for a in args))
    return out


def cast_sites(plan: str, target: str) -> list[str]:
    """Normalized source-expression signatures of every
    ``cast(expr as <target>)`` in a plan string."""
    out: list[str] = []
    pat = re.compile(r"(?<![\w_])cast\(")
    suffix = f" as {target}"
    for line in plan.splitlines():
        for m in pat.finditer(line):
            args = _balanced_args(line, m.end() - 1)
            if args is None or len(args) != 1:
                continue
            body = args[0]
            if body.rstrip().endswith(suffix):
                out.append(_normalize(body[: body.rfind(suffix)]))
    return out
