"""Hypothesis fuzz for the gaps-and-islands merge kernel behind
``interval_union_coverage``: race the running-MAX-of-ends island
detection against a Python sweep-line merge on random VARIABLE-length
intervals — the case a lag-of-starts sessionizer gets wrong (a long
interval swallowing a later-starting shorter one)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import Window, functions as F


def _python_merge(iv: list[tuple[int, int]]) -> tuple[int, int]:
    """(n_islands, covered) by sweep line."""
    islands = []
    for s, e in sorted(iv):
        if islands and s <= islands[-1][1]:
            islands[-1][1] = max(islands[-1][1], e)
        else:
            islands.append([s, e])
    return len(islands), sum(e - s for s, e in islands)


def _spark_merge(spark, users: dict[str, list[tuple[int, int]]]):
    df = spark.createDataFrame(
        [(u, s, e) for u, iv in users.items() for s, e in iv],
        "user_id string, s long, e long",
    )
    order = Window.partitionBy("user_id").orderBy("s", "e")
    prev_max_e = F.max("e").over(
        order.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = F.when(
        prev_max_e.isNull() | (F.col("s") > prev_max_e), 1
    ).otherwise(0)
    cum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = (
        df.withColumn("new_island", new_island)
        .withColumn("island_id", F.sum("new_island").over(cum))
        .groupBy("user_id", "island_id")
        .agg((F.max("e") - F.min("s")).alias("span_us"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.sum("span_us").alias("covered_us"),
        )
    )
    return {
        r["user_id"]: (r["n_islands"], r["covered_us"]) for r in out.collect()
    }


@given(
    st.dictionaries(
        st.sampled_from(["u1", "u2"]),
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=50),
                st.integers(min_value=1, max_value=40),
            ).map(lambda t: (t[0], t[0] + t[1])),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=2,
    )
)
@settings(max_examples=12, deadline=None)
def test_island_merge_matches_sweep_line(spark, users):
    got = _spark_merge(spark, users)
    for u, iv in users.items():
        assert got[u] == _python_merge(iv), (u, sorted(iv), got[u])
