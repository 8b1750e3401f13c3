"""Online near-dup corpus ingestion: within-batch collapse, cross-batch
rejection against the persisted signature zone, and batch-keyed
idempotent admission."""

from __future__ import annotations

import glob
import shutil

from pyspark.sql import Row

from clickstream_pipeline_aws_kafka_docker_airflow__spark.streaming.corpus_ingest import (
    load_corpus,
    start_dedup_corpus_ingest,
)


def _drop_parquet(df, src_dir, name):
    """Write one parquet file FLAT into the streamed directory (the file
    stream source does not recurse into subdirectories)."""
    tmp = src_dir.parent / f"_stage_{name}"
    df.coalesce(1).write.parquet(str(tmp))
    src_dir.mkdir(parents=True, exist_ok=True)
    part = glob.glob(str(tmp / "part-*.parquet"))[0]
    shutil.copy(part, str(src_dir / f"{name}.parquet"))
    shutil.rmtree(str(tmp))

BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "green turtles watch from the river bank in the warm afternoon sun"
)
NEAR_DUP = BASE.replace("afternoon sun", "evening light")  # high Jaccard
FRESH = (
    "completely different subject matter entirely about compilers "
    "register allocation and loop invariant code motion optimization passes"
)
FRESH2 = (
    "yet another unrelated document describing sourdough fermentation "
    "timing hydration ratios and oven spring troubleshooting for bakers"
)


def _run_stream(spark, src_dir, corpus_dir, ckpt_dir):
    stream = spark.readStream.schema("doc_id bigint, text string").parquet(
        str(src_dir)
    )
    q = start_dedup_corpus_ingest(stream, str(corpus_dir), str(ckpt_dir))
    assert q.awaitTermination(180), "stream did not drain within timeout"


def test_online_dedup_within_and_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    corpus = tmp_path / "corpus"
    ckpt = tmp_path / "ckpt"

    # batch 1: base doc, its near-dup (should collapse to min id), fresh
    _drop_parquet(
        spark.createDataFrame(
            [Row(doc_id=1, text=BASE), Row(doc_id=2, text=NEAR_DUP),
             Row(doc_id=3, text=FRESH)]
        ),
        src, "b1",
    )
    _run_stream(spark, src, corpus, ckpt)

    got1 = sorted(r["doc_id"] for r in load_corpus(spark, str(corpus)).collect())
    assert got1 == [1, 3], f"batch-1 corpus wrong: {got1}"

    # batch 2: exact replay of doc 1's text under a new id (must be
    # rejected against the STORED signatures), plus a genuinely new doc
    _drop_parquet(
        spark.createDataFrame(
            [Row(doc_id=10, text=BASE), Row(doc_id=11, text=FRESH2)]
        ),
        src, "b2",
    )
    _run_stream(spark, src, corpus, ckpt)

    got2 = sorted(r["doc_id"] for r in load_corpus(spark, str(corpus)).collect())
    assert got2 == [1, 3, 11], f"batch-2 corpus wrong: {got2}"

    # signature zone stays consistent with the docs zone
    sigs = spark.read.parquet(str(corpus / "signatures"))
    assert sorted(r["doc_id"] for r in sigs.collect()) == [1, 3, 11]


def test_redacting_ingest_stores_no_raw_pii(spark, tmp_path):
    """redact=True: admitted docs carry masks instead of raw PII, the
    signature zone's minhashes derive from the REDACTED text, and two
    docs differing only in their PII collapse as duplicates."""
    import re

    from pyspark.sql import functions as F

    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.pii import (
        EMAIL_RE,
    )

    src = tmp_path / "src"
    corpus = tmp_path / "corpus"
    ckpt = tmp_path / "ckpt"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=BASE + " contact alice@example.com for details"),
            Row(doc_id=2, text=BASE + " contact bob@other.org for details"),
            Row(doc_id=3, text=FRESH),
        ]
    )
    _drop_parquet(docs, src, "b0")
    stream = spark.readStream.schema("doc_id bigint, text string").parquet(str(src))
    q = start_dedup_corpus_ingest(stream, str(corpus), str(ckpt), redact=True)
    q.awaitTermination(120)

    kept = load_corpus(spark, str(corpus)).collect()
    ids = sorted(r["doc_id"] for r in kept)
    # docs 1 and 2 differ ONLY in their email -> after redaction they
    # are exact dups and collapse to the min id
    assert ids == [1, 3]
    for r in kept:
        assert not re.search(EMAIL_RE, r["text"]), r["text"]
        assert "alice" not in r["text"] and "bob" not in r["text"]
    assert any("<EMAIL>" in r["text"] for r in kept)
    # the signature zone never saw raw PII either: signatures of doc 1
    # must equal signatures computed from the redacted text
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.dedup import (
        minhash_signatures,
        shingle_table,
    )
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.pii import (
        redact_pii,
    )

    sigs = spark.read.parquet(str(corpus / "signatures")).where("doc_id = 1")
    expect = minhash_signatures(
        shingle_table(
            docs.where("doc_id = 1").select("doc_id", redact_pii("text").alias("text"))
        )
    )
    got = {k: v for k, v in sigs.collect()[0].asDict().items() if k.startswith("mh")}
    want = {k: v for k, v in expect.collect()[0].asDict().items() if k.startswith("mh")}
    assert got == want
