"""Input file-layout invariance: same tables, different part files,
same answers.

Scan partitioning drives Arrow batch boundaries, fold/union orders,
``spark_partition_id`` values, and applyInPandas group delivery — all
places a result could accidentally depend on HOW the bytes are laid
out rather than WHAT they say. Every real zone is multi-file, while
the committed fixtures (and the driver testdata) are single-file, so
this axis is otherwise never exercised.

The full audit ran 128-0 on a 3-file split of the adversarial fixture
(see SURVEY round 6); this test keeps the most layout-sensitive
queries pinned: Arrow matmul batching, applyInPandas sequential state,
the spark_partition_id-spread as-of join, engine-side fold recursions,
and both sessionize strategies.
"""

from __future__ import annotations

import glob
import os

import duckdb
import pytest

import __spark_entry__ as E
from clickstream_pipeline_aws_kafka_docker_airflow__spark.io import TABLES
from clickstream_pipeline_aws_kafka_docker_airflow__spark.testing import compare_frames

ADV_SF = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "fixtures", "adv_sf"
)

LAYOUT_SENSITIVE = [
    "sim_topk_vectorized",     # Arrow matmul batch boundaries + rescore
    "pack_sequences_greedy",   # applyInPandas per-shard sequential state
    "asof_last_purchase",      # spark_partition_id spread keys
    "ewma_hourly",             # engine-side sequential fold
    "sessionize_30min",        # window over re-partitioned scan
    "mad_outliers",            # histogram + checkpoint reuse
    "dedup_near_minhash",      # artifact build over multi-file scan
    "media_histogram",         # mapInPandas batches
]


@pytest.fixture(scope="module")
def split_sf(spark, tmp_path_factory):
    """The adversarial fixture re-materialized as 3 part files per
    table (row-ranges, identical content)."""
    root = str(tmp_path_factory.mktemp("adv_split"))
    con = duckdb.connect()
    try:
        for t in TABLES:
            os.makedirs(f"{root}/{t}.parquet")
            n = con.sql(
                f"SELECT count(*) FROM read_parquet('{ADV_SF}/{t}.parquet')"
            ).fetchone()[0]
            per = max(1, (n + 2) // 3)
            for i in range(3):
                con.sql(
                    f"COPY (SELECT * FROM read_parquet('{ADV_SF}/{t}.parquet')"
                    f" LIMIT {per} OFFSET {i * per})"
                    f" TO '{root}/{t}.parquet/part{i}.parquet' (FORMAT PARQUET)"
                )
    finally:
        con.close()
    return root


@pytest.mark.parametrize("name", LAYOUT_SENSITIVE)
def test_layout_invariant_vs_oracle(spark, split_sf, name):
    sdf = E.queries()[name](spark, split_sf).toPandas()
    con = duckdb.connect(":memory:")
    try:
        for t in TABLES:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{split_sf}/{t}.parquet/*.parquet')"
            )
        ddf = con.sql(E.oracle_sql()[name]).df()
    finally:
        con.close()
    problems = compare_frames(sdf, ddf)
    assert not problems, f"[{name}] split-layout mismatch:\n" + "\n".join(problems)


def test_split_fixture_really_is_multifile(split_sf):
    for t in ("events", "documents"):
        assert len(glob.glob(f"{split_sf}/{t}.parquet/*.parquet")) == 3
