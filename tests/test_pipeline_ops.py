"""Behavioral tests of the training-pipeline operators (clustering,
splits, quotas, contamination) on constructed data with KNOWN structure
— oracle parity proves engine agreement, these prove the semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.clustering import (
    connected_components,
)


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    return {
        r["id"]: r["label"] for r in connected_components(df).collect()
    }


def test_cc_transitive_chain(spark):
    # A-B, B-C, C-D: one component even though A,D never share an edge
    labels = _cc(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_cc_direction_and_cycles(spark):
    # reversed edges and cycles must not matter
    labels = _cc(spark, [(5, 2), (2, 5), (9, 5), (2, 9)])
    assert labels == {2: 2, 5: 2, 9: 2}


def test_cc_long_path_converges(spark):
    # a 12-node path needs ~diameter rounds — exercises the loop depth
    labels = _cc(spark, [(i, i + 1) for i in range(12)])
    assert set(labels.values()) == {0}


def test_cc_iteration_cap_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(8)], "id_a bigint, id_b bigint")
    with pytest.raises(RuntimeError, match="fixpoint"):
        connected_components(df, max_iters=1)


def test_dedup_clusters_collapses_transitively(spark, sf_dir):
    # three mutually-similar docs via A~B and B~C (A and C share enough
    # shingles too, but the point is the single canonical id)
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.queries.pipeline_q import (
        DUP_JACCARD,
    )
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.dedup import (
        minhash_near_dup,
    )

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=base),
            Row(doc_id=2, text=base.replace("theta", "theta2")),
            Row(doc_id=3, text=base.replace("theta", "theta2").replace("pi", "pi2")),
            Row(doc_id=9, text="unrelated words entirely different content here now"),
        ]
    )
    pairs = minhash_near_dup(docs).where(F.col("jaccard") >= DUP_JACCARD)
    comp = connected_components(pairs)
    labels = {r["id"]: r["label"] for r in comp.collect()}
    assert labels == {1: 1, 2: 1, 3: 1}


def test_train_split_is_deterministic_and_complete(spark, sf_dir):
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.queries.pipeline_q import (
        train_split,
    )

    a = {r["doc_id"]: r["split"] for r in train_split(spark, sf_dir).collect()}
    b = {r["doc_id"]: r["split"] for r in train_split(spark, sf_dir).collect()}
    assert a == b  # same doc -> same slice, every run
    counts = {}
    for s in a.values():
        counts[s] = counts.get(s, 0) + 1
    n = sum(counts.values())
    # 80/10/10 within loose tolerance (hash buckets, small n)
    assert counts["train"] / n == pytest.approx(0.8, abs=0.1)
    assert set(counts) == {"train", "val", "test"}


def test_quota_sample_caps_each_language(spark, sf_dir):
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.queries.pipeline_q import (
        QUOTA_PER_LANG,
        quota_sample,
    )

    rows = quota_sample(spark, sf_dir).collect()
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r["lang"], []).append(r)
    for lang, docs in per_lang.items():
        assert len(docs) <= QUOTA_PER_LANG
        # ranks are 1..n and quality is non-increasing along them
        ranked = sorted(docs, key=lambda r: r["rn"])
        assert [r["rn"] for r in ranked] == list(range(1, len(ranked) + 1))
        qs = [r["quality"] for r in ranked]
        assert qs == sorted(qs, reverse=True)


def test_contamination_flags_planted_leak(spark):
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.queries.pipeline_q import (
        N_BENCH_DOCS,
    )
    import clickstream_pipeline_aws_kafka_docker_airflow__spark.queries.pipeline_q as P

    bench_text = "one two three four five six seven eight nine ten"
    clean = "totally fresh words that never appear in any benchmark document at all"
    docs = spark.createDataFrame(
        [Row(doc_id=0, text=bench_text)]
        + [Row(doc_id=N_BENCH_DOCS + 1, text=bench_text)]   # full leak
        + [Row(doc_id=N_BENCH_DOCS + 2, text=clean)]        # clean
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        docs.write.parquet(os.path.join(td, "documents.parquet"))
        out = {
            r["doc_id"]: r["contamination_rate"]
            for r in P.contamination_check(spark, td).collect()
        }
    assert out[N_BENCH_DOCS + 1] == 1.0
    assert out[N_BENCH_DOCS + 2] == 0.0


def test_pack_sequences_invariants(spark, sf_dir):
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.queries.pipeline_q import (
        PACK_MAX_TOKENS,
        pack_sequences_greedy,
    )

    rows = pack_sequences_greedy(spark, sf_dir).collect()
    assert rows, "packing produced no rows"
    by_chunk: dict[tuple, list] = {}
    for r in rows:
        by_chunk.setdefault((r["shard"], r["chunk_id"]), []).append(r)
    for (shard, chunk), members in by_chunk.items():
        total = sum(r["n_tokens"] for r in members)
        # a chunk only exceeds the budget when a single doc does
        assert total <= PACK_MAX_TOKENS or len(members) == 1
        # chunk_fill is the running total, so the max equals the sum
        assert max(r["chunk_fill"] for r in members) == total
    # chunks are contiguous doc_id ranges within a shard: sorting docs
    # by id must visit chunks in nondecreasing order
    for shard in {s for s, _ in by_chunk}:
        seq = sorted(
            (r for r in rows if r["shard"] == shard),
            key=lambda r: r["doc_id"],
        )
        chunk_seq = [r["chunk_id"] for r in seq]
        assert chunk_seq == sorted(chunk_seq)


def test_mixture_resample_hits_target_proportions(spark, sf_dir):
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.queries.pipeline_q import (
        MIX_WEIGHTS,
        mixture_resample,
    )

    out = mixture_resample(spark, sf_dir).toPandas()
    got = out.groupby("lang").size().to_dict()
    assert set(got) <= set(MIX_WEIGHTS)
    total = sum(got.values())
    # each language's achieved share matches its weight to within the
    # floor-rounding of the permille caps (1 doc per 1000 weight units)
    for lang, wt in MIX_WEIGHTS.items():
        assert abs(got.get(lang, 0) - total * wt / 1000) <= 2
    # determinism: a second run selects the identical doc set
    again = mixture_resample(spark, sf_dir).toPandas()
    assert sorted(out["doc_id"]) == sorted(again["doc_id"])
