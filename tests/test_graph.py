"""Integer-exact PageRank operator vs a pure-Python reference."""

from __future__ import annotations

from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.graph import (
    PR_DAMP_PCT,
    PR_SCALE,
    pagerank_int,
)

_EDGES = [  # (src, dst, n) — includes a dangling node (3 has no out-edge)
    (0, 1, 3),
    (0, 2, 1),
    (1, 2, 2),
    (2, 0, 5),
    (2, 3, 1),
]


def _reference(edges, n_iters, damp=PR_DAMP_PCT, scale=PR_SCALE):
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    out = {}
    for s, _, n in edges:
        out[s] = out.get(s, 0) + n
    nn = len(nodes)
    pr = {v: scale // nn for v in nodes}
    for _ in range(n_iters):
        s = {v: 0 for v in nodes}
        for u, v, n in edges:
            s[v] += (pr[u] * n) // out[u]
        pr = {
            v: (scale * (100 - damp)) // (100 * nn) + (damp * s[v]) // 100
            for v in nodes
        }
    return pr


def test_pagerank_matches_python_reference(spark):
    edges = spark.createDataFrame(_EDGES, "src bigint, dst bigint, n bigint")
    got = {r["node"]: r["pr"] for r in pagerank_int(edges, n_iters=3).collect()}
    assert got == _reference(_EDGES, 3)


def test_pagerank_sink_gains_hub_loses(spark):
    """2 -> 0 carries weight 5: node 0 should outrank the dangling
    node 3 (weight-1 in-edge from the same source), and every score is
    positive (damping base term)."""
    edges = spark.createDataFrame(_EDGES, "src bigint, dst bigint, n bigint")
    got = {r["node"]: r["pr"] for r in pagerank_int(edges, n_iters=3).collect()}
    assert set(got) == {0, 1, 2, 3}
    assert got[0] > got[3]
    assert all(v > 0 for v in got.values())


def test_pagerank_deterministic_across_partitionings(spark):
    edges = spark.createDataFrame(_EDGES, "src bigint, dst bigint, n bigint")
    a = {r["node"]: r["pr"] for r in pagerank_int(edges).collect()}
    b = {
        r["node"]: r["pr"]
        for r in pagerank_int(edges.repartition(7)).collect()
    }
    assert a == b


def test_ewma_series_matches_python_reference(spark):
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.timeseries import (
        EWMA_DEN,
        EWMA_NUM,
        EWMA_SCALE,
        ewma_series,
    )

    rows = [("a", i, v) for i, v in enumerate([10, 0, 40, 40, 7])] + [
        ("b", i, v) for i, v in enumerate([5, 5, 5])
    ]
    df = spark.createDataFrame(rows, "s string, t bigint, x bigint")
    got = {
        (r["s"], r["t"]): (r["x"], r["ewma"])
        for r in ewma_series(df.repartition(5), ["s"], "t", "x").collect()
    }

    def ref(xs):
        out, prev = [], None
        for x in xs:
            prev = (
                x * EWMA_SCALE
                if prev is None
                else (EWMA_NUM * x * EWMA_SCALE + (EWMA_DEN - EWMA_NUM) * prev)
                // EWMA_DEN
            )
            out.append(prev)
        return out

    for s, xs in [("a", [10, 0, 40, 40, 7]), ("b", [5, 5, 5])]:
        expect = ref(xs)
        for t, (x, e) in enumerate(zip(xs, expect)):
            assert got[(s, t)] == (x, e), (s, t, got[(s, t)], (x, e))
    # constant series: EWMA equals the constant at every tick
    assert all(got[("b", t)][1] == 5 * EWMA_SCALE for t in range(3))


def test_ewma_fold_matches_spark_recursive_cte(spark):
    """Spark 4 recursive CTEs (UNION ALL form) can spell the same
    recurrence the engine-side fold runs — the fold and the SQL
    recursion must agree cell-for-cell. (The DuckDB oracle is the
    third spelling; the driver hash ties it to the fold.)"""
    from pyspark.sql import functions as F

    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.timeseries import (
        EWMA_DEN,
        EWMA_NUM,
        EWMA_SCALE,
        ewma_series,
    )

    rows = [("a", i, (i * 37) % 11) for i in range(40)] + [
        ("b", i, (i * 13) % 7) for i in range(25)
    ]
    df = spark.createDataFrame(rows, "s string, t bigint, x bigint")
    df.createOrReplaceTempView("series")
    spark.conf.set("spark.sql.cteRecursionLevelLimit", "200")
    try:
        sql = spark.sql(f"""
WITH RECURSIVE idx AS (
    SELECT s, t, x,
           ROW_NUMBER() OVER (PARTITION BY s ORDER BY t) AS i
    FROM series
), r(s, t, x, i, ewma) AS (
    SELECT s, t, x, i, CAST(x * {EWMA_SCALE} AS BIGINT) FROM idx WHERE i = 1
    UNION ALL
    SELECT n.s, n.t, n.x, n.i,
           CAST(({EWMA_NUM} * n.x * {EWMA_SCALE}
                 + {EWMA_DEN - EWMA_NUM} * r.ewma) div {EWMA_DEN} AS BIGINT)
    FROM r JOIN idx n ON n.s = r.s AND n.i = r.i + 1
)
SELECT s, t, x, ewma FROM r
""").collect()
    finally:
        spark.conf.unset("spark.sql.cteRecursionLevelLimit")
    got_sql = {(r["s"], r["t"]): r["ewma"] for r in sql}
    got_fold = {
        (r["s"], r["t"]): r["ewma"]
        for r in ewma_series(df, ["s"], "t", "x").collect()
    }
    assert len(got_sql) == 65
    assert got_sql == got_fold
