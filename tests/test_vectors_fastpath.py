"""The r11 single-parse SQL spelling of dot/norm must be semantically
IDENTICAL to the Column-DSL fold it replaced — same products, same
strict left fold from 0.0, same NULL propagation (NULL element -> NULL
sum; NULL array -> NULL; unequal lengths -> zip_with NULL padding ->
NULL) — the fast path only changes how the expression tree is BUILT
(one JVM parse instead of ~25 py4j round-trips).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clickstream_pipeline_aws_kafka_docker_airflow__spark.functions import vectors as V


def _frame(spark):
    return spark.createDataFrame(
        [
            (1, [1.5, 2.25, -3.125], [0.5, 1.1, 2.2]),
            (2, [0.1, 0.2, 0.3], [0.0, 0.0, 0.0]),
            (3, None, [1.0, 2.0, 3.0]),          # NULL array
            (4, [1.0, None, 3.0], [1.0, 2.0, 3.0]),  # NULL element
            (5, [1.0, 2.0], [1.0, 2.0, 3.0]),    # unequal lengths
            (6, [], []),                          # empty arrays
        ],
        "id bigint, a array<double>, b array<double>",
    )


def test_fastpath_matches_dsl_path_bitwise(spark):
    df = _frame(spark)
    fast = df.select(
        "id", V.dot("a", "b").alias("d"), V.norm("a").alias("n")
    ).collect()
    slow = df.select(
        "id",
        V.dot(F.col("a"), F.col("b")).alias("d"),
        V.norm(F.col("a")).alias("n"),
    ).collect()
    assert [tuple(r) for r in fast] == [tuple(r) for r in slow]
    # spot-pin the fold semantics the oracles mirror (ns_dot_sql)
    by_id = {r["id"]: r for r in fast}
    assert by_id[3]["d"] is None and by_id[4]["d"] is None
    assert by_id[5]["d"] is None  # zip_with pads the short side with NULL
    assert by_id[6]["d"] == 0.0  # empty fold returns the 0.0 seed


def test_fastpath_rejects_non_identifier_inputs(spark):
    # qualified / expression inputs must take the DSL path, not be
    # spliced into SQL text — including qualified STRING names, which
    # is the case that actually exercises the _NAME guard (a Column
    # arg bypasses it by type)
    df = _frame(spark).alias("t")
    name_path = df.select(V.dot("a", "b").alias("d"))
    qual_str = df.select(V.dot("t.a", "t.b").alias("d"))  # fails _NAME
    col_path = df.select(V.dot(F.col("t.a"), F.col("t.b")).alias("d"))
    expected = [r["d"] for r in name_path.collect()]
    assert [r["d"] for r in qual_str.collect()] == expected
    assert [r["d"] for r in col_path.collect()] == expected


def test_fastpath_keyword_column_names_resolve_as_columns(spark):
    # a column named like a niladic SQL function must resolve as the
    # COLUMN on the fast path (backtick quoting), exactly like F.col
    df = spark.createDataFrame(
        [([1.0, 2.0], [3.0, 4.0])],
        "current_date array<double>, current_user array<double>",
    )
    got = df.select(V.dot("current_date", "current_user").alias("d")).collect()
    assert got[0]["d"] == 1.0 * 3.0 + 2.0 * 4.0
