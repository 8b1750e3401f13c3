"""Property test for the sorted-array run-length fold that
``repetition_score`` now uses instead of two corpus groupBys: for any
token list, the longest run in the sorted gram array must equal the
max gram multiplicity a Counter computes, and n_grams must equal the
gram count."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

REP_N = 3


def _spark_scores(spark, docs: list[list[str]]):
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    # same projection chain as queries/text_q.py::repetition_score
    # (kept in lockstep by the plan test and the oracle; this test pins
    # the FOLD arithmetic itself against a Counter brute force)
    base = df.select(
        "doc_id", F.split(F.trim(F.lower("text")), r"\s+").alias("t")
    ).where(F.size("t") >= REP_N)
    grams = F.expr(
        f"array_sort(transform(sequence(1, size(t) - {REP_N - 1}), "
        f"i -> concat_ws(' ', slice(t, i, {REP_N}))))"
    )
    top = F.expr(
        "aggregate("
        "  _grams,"
        "  named_struct('prev', '', 'run', CAST(0 AS BIGINT),"
        "               'best', CAST(0 AS BIGINT)),"
        "  (acc, x) -> named_struct("
        "    'prev', x,"
        "    'run', IF(x = acc.prev, acc.run + 1, CAST(1 AS BIGINT)),"
        "    'best', GREATEST(acc.best,"
        "            IF(x = acc.prev, acc.run + 1, CAST(1 AS BIGINT)))),"
        "  acc -> acc.best)"
    )
    out = base.select("doc_id", grams.alias("_grams")).select(
        "doc_id",
        F.size("_grams").cast("bigint").alias("n_grams"),
        top.alias("top"),
    )
    return {r["doc_id"]: (r["n_grams"], r["top"]) for r in out.collect()}


@given(
    st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd"]),
            min_size=0,
            max_size=24,
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=12, deadline=None)
def test_run_length_fold_equals_counter_max(spark, docs):
    got = _spark_scores(spark, docs)
    for i, toks in enumerate(docs):
        grams = [
            " ".join(toks[j : j + REP_N])
            for j in range(len(toks) - REP_N + 1)
        ]
        if len(toks) < REP_N:
            assert i not in got
            continue
        n, top = got[i]
        assert n == len(grams), (toks, n)
        assert top == max(Counter(grams).values()), (toks, top)
