"""Contract tests of the multimodal binary-column operators: bounded
thumb size, binary round-trip through Arrow, determinism. (Value-level
checks of the histogram/meta/frame paths live in the DuckDB oracles.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from clickstream_pipeline_aws_kafka_docker_airflow__spark.io import load_table
from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.multimodal import (
    THUMB_H,
    THUMB_W,
    attach_fake_media,
    media_byte_histogram,
    resize_thumb_stub,
)

SF_DIR = "/root/testdata/sf0.001"


def test_resize_thumb_bounded_and_deterministic(spark):
    media = attach_fake_media(load_table(spark, SF_DIR, "documents"))
    out = resize_thumb_stub(media).collect()
    src_len = {
        r["doc_id"]: r["n"]
        for r in media.select(
            "doc_id", F.length("media").alias("n")
        ).collect()
    }
    assert len(out) == len(src_len)
    budget = THUMB_W * THUMB_H
    for r in out:
        expect = min(src_len[r["doc_id"]], budget)
        assert len(r["thumb"]) == expect
        assert (r["t_width"], r["t_height"]) == (THUMB_W, THUMB_H)
    # determinism: identical bytes on a re-run
    again = {r["doc_id"]: bytes(r["thumb"]) for r in resize_thumb_stub(media).collect()}
    assert {r["doc_id"]: bytes(r["thumb"]) for r in out} == again


def test_histogram_counts_sum_to_length(spark):
    media = attach_fake_media(load_table(spark, SF_DIR, "documents"))
    rows = media_byte_histogram(media.select("doc_id", "media")).collect()
    assert rows
    for r in rows:
        assert sum(r[f"c{j}"] for j in range(16)) == r["n_bytes"]
