"""Property-based tests (hypothesis): the Spark operators against
independent pure-Python references on generated inputs — catching the
edge shapes hand-written cases miss (singleton components, zero-length
docs, oversize docs, dense cycles)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.clustering import (
    connected_components,
)


def _union_find(edges):
    """Independent reference: path-compressed union-find."""
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id label per node
    return {x: find(x) for x in parent}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=40,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    # self-loops are legal input; direction and duplicates must not matter
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    got = {
        r["id"]: r["label"] for r in connected_components(df).collect()
    }
    want = _union_find(edges)
    # union-find's find() after all unions may not be fully compressed
    # to the min id: normalize by a second resolution pass
    roots = {}
    for x in want:
        r = want[x]
        while want.get(r, r) != r:
            r = want[r]
        roots[x] = r
    comp_min: dict[int, int] = {}
    for x, r in roots.items():
        comp_min[r] = min(comp_min.get(r, x), x)
    want_min = {x: comp_min[r] for x, r in roots.items()}
    assert got == want_min


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(st.integers(0, 700), min_size=1, max_size=60),
)
def test_pack_invariants_on_generated_lengths(spark, tmp_path_factory, n_tokens):
    """Greedy packing on documents with arbitrary (including oversize
    and near-budget) token counts keeps every invariant."""
    from pyspark.sql import Row

    from clickstream_pipeline_aws_kafka_docker_airflow__spark.queries.pipeline_q import (
        PACK_MAX_TOKENS,
        pack_sequences_greedy,
    )

    docs = [
        Row(doc_id=i, text=" ".join(["w"] * n) if n else "")
        for i, n in enumerate(n_tokens)
    ]
    td = tmp_path_factory.mktemp("packprop")
    spark.createDataFrame(docs).write.mode("overwrite").parquet(
        str(td / "documents.parquet")
    )
    rows = pack_sequences_greedy(spark, str(td)).collect()
    assert len(rows) == len(docs)
    by_chunk: dict[tuple, list] = {}
    for r in rows:
        by_chunk.setdefault((r["shard"], r["chunk_id"]), []).append(r)
    for members in by_chunk.values():
        total = sum(r["n_tokens"] for r in members)
        assert total <= PACK_MAX_TOKENS or len(members) == 1
        assert max(r["chunk_fill"] for r in members) == total


def _jaccard_pairs_ref(docsets, t_num, t_den):
    """Independent reference: brute-force token-set Jaccard >= t."""
    out = set()
    ids = sorted(docsets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sa, sb = docsets[a], docsets[b]
            if not sa or not sb:
                continue
            o = len(sa & sb)
            if o * t_den >= (len(sa) + len(sb) - o) * t_num:
                out.add((a, b))
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=8),
        min_size=2,
        max_size=12,
    )
)
def test_ppjoin_matches_bruteforce(spark, corpora):
    """The prefix-filter join against a pure-Python brute force on tiny
    random corpora over an 8-token alphabet — dense overlap, empty
    docs, singletons, and threshold-boundary pairs all land here. Full
    recall AND precision must hold on every example."""
    from pyspark.sql import functions as F

    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.dedup import (
        PPJ_T_DEN,
        PPJ_T_NUM,
        ppjoin_pairs,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(corpora)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    tk = (
        docs.select(
            "doc_id", F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token")
        )
        .where(F.col("token") != "")
        .distinct()
    )
    got = {
        (r.doc_a, r.doc_b) for r in ppjoin_pairs(docs, toks=tk).collect()
    }
    ref = _jaccard_pairs_ref(
        {i: set(toks) for i, toks in enumerate(corpora)}, PPJ_T_NUM, PPJ_T_DEN
    )
    assert got == ref
