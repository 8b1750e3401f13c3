"""Behavioral tests of near-dup/similarity operators on constructed
data with KNOWN duplicates — the driver testdata has none, so oracle
parity alone can't prove recall."""

from __future__ import annotations

from pyspark.sql import Row

from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.dedup import (
    minhash_near_dup,
    shingle_table,
    simhash_fingerprints,
)


def _docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the tall fence near the old barn every morning"
    )
    near = base.replace("lazy", "sleepy")  # 1-word edit -> high jaccard
    far = "completely different text about spark query engines and distributed shuffles at scale"
    return spark.createDataFrame(
        [
            Row(doc_id=1, text=base),
            Row(doc_id=2, text=base),          # exact dup
            Row(doc_id=3, text=near),          # near dup
            Row(doc_id=4, text=far),           # unrelated
            Row(doc_id=5, text="tiny doc"),    # < 3 tokens -> no shingles
        ]
    )


def test_minhash_finds_known_dups(spark):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_near_dup(_docs(spark)).collect()
    }
    assert pairs[(1, 2)] == 1.0  # exact dup always collides, J=1
    assert (1, 3) in pairs and pairs[(1, 3)] > 0.7  # near dup found
    assert all(4 not in p for p in pairs)  # unrelated never pairs
    assert all(5 not in p for p in pairs)  # shingle-less doc never pairs


def test_shingles_short_doc_empty(spark):
    sh = shingle_table(_docs(spark))
    assert sh.where("doc_id = 5").count() == 0
    assert sh.where("doc_id = 1").count() > 0


def test_simhash_properties(spark):
    fps = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(_docs(spark)).collect()}
    assert fps[1] == fps[2]  # identical text -> identical fingerprint
    ham_near = bin(fps[1] ^ fps[3]).count("1")
    ham_far = bin(fps[1] ^ fps[4]).count("1")
    assert ham_near < ham_far  # near dup closer in hamming space
    assert 0 <= fps[1] < 2**32


def test_ann_bucket_recall_on_clusters(spark):
    """Vectors built as tight clusters must find their cluster peers."""
    import numpy as np

    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.similarity import (
        ann_topk_bucketed,
    )

    rng = np.random.default_rng(0)
    rows = []
    for cluster in range(5):
        center = rng.standard_normal(64)
        for j in range(6):
            v = center + rng.standard_normal(64) * 0.01
            rows.append(
                Row(vec_id=cluster * 6 + j, embedding=[float(x) for x in v], label=cluster)
            )
    emb = spark.createDataFrame(rows)
    out = ann_topk_bucketed(emb, n_queries=6, k=3)  # queries = cluster 0
    got = {(r["qid"], r["nid"]) for r in out.collect()}
    # every cluster-0 query finds only cluster-0 neighbors, at sim ~1
    assert got, "no neighbors found"
    assert all(nid < 6 for _, nid in got)
    sims = [r["sim"] for r in out.collect()]
    assert min(sims) > 0.99


def test_ivf_recall_on_clusters(spark):
    """IVF with sampled centroids: cluster members must find cluster
    peers through the probed cells."""
    import numpy as np
    from pyspark.sql import Row

    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.similarity import (
        ivf_topk,
    )

    rng = np.random.default_rng(1)
    rows = []
    # ids interleaved (vec_id % 4 == cluster) so the sampled centroids
    # (vec_id < 4) cover one member of EACH cluster
    for cluster in range(4):
        center = rng.standard_normal(64) * 3
        for j in range(8):
            v = center + rng.standard_normal(64) * 0.05
            rows.append(
                Row(vec_id=j * 4 + cluster, embedding=[float(x) for x in v])
            )
    emb = spark.createDataFrame(rows)
    out = ivf_topk(emb, n_queries=4, k=3, n_centroids=4, nprobe=1)
    got = {(r["qid"], r["nid"]) for r in out.collect()}
    assert got
    # with tight clusters, every retrieved neighbor shares the query's
    # cluster (same id residue)
    assert all(nid % 4 == qid % 4 for qid, nid in got), got


def test_ngram_jaccard_df_cap_bounds_hot_shingle(spark):
    """A boilerplate shingle shared by more docs than SHINGLE_DF_CAP
    must be dropped before the self-join: no quadratic candidate group,
    and pairs only arise from genuinely shared rare shingles."""
    from pyspark.sql import functions as F

    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.dedup import (
        SHINGLE_DF_CAP,
        ngram_jaccard_all_pairs,
    )

    n_docs = SHINGLE_DF_CAP + 10  # boilerplate shingle exceeds the cap
    boiler = "click here to unsubscribe now"
    rows = [(i, f"{boiler} unique{i} filler{i} token{i} tail{i}") for i in range(n_docs)]
    # one true near-dup pair sharing rare content
    rows += [(1000, "alpha beta gamma delta epsilon zeta"),
             (1001, "alpha beta gamma delta epsilon eta")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    pairs = ngram_jaccard_all_pairs(docs, threshold=0.05)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # without the cap every boilerplate pair would appear: ~n_docs^2/2
    assert (1000, 1001) in got
    assert all(a >= 1000 for a, _ in got), got  # no boilerplate-only pairs

    # sanity: with a huge cap the boilerplate DOES pair everything
    uncapped = ngram_jaccard_all_pairs(docs, threshold=0.05, df_cap=10**6)
    assert uncapped.where(F.col("id_a") < 1000).count() > 1000


def test_minhash_lsh_recall_vs_exact_jaccard(spark):
    """LSH recall measured against exhaustive exact Jaccard on the real
    corpus (sf0.01): every TRUE near-dup pair (J >= 0.5 over the full
    3-gram vocabulary) must be produced by the banded MinHash pipeline
    at a stated floor. Precision is 1.0 by construction (candidates are
    exact-verified), so the recall floor is the whole quality story."""
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.io import load_table
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.dedup import (
        minhash_near_dup,
        ngram_jaccard_all_pairs,
    )

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    truth = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_all_pairs(
            docs, threshold=0.5, df_cap=10**9
        ).collect()
    }
    found = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_dup(docs).where("jaccard >= 0.5").collect()
    }
    assert truth, "corpus has no true near-dup pairs; eval is vacuous"
    recall = len(truth & found) / len(truth)
    print(f"\nminhash-LSH recall vs exact J>=0.5: {recall:.3f} "
          f"({len(truth)} true pairs, {len(found)} found)")
    # 4 bands x 2 hashes: P(candidate | J=0.5) ~ 0.68, rising steeply
    # with J; the corpus's planted dups are high-J so empirical recall
    # should be well above the knife-edge probability
    assert recall >= 0.8
    # no false positives above threshold: found pairs are exact-verified
    extra = found - truth
    assert not extra, f"verified pairs missing from exhaustive truth: {extra}"


def test_simhash_near_dup_full_recall_vs_bruteforce(spark):
    # pigeonhole contract: banded blocking + exact popcount verify must
    # find EXACTLY the brute-force hamming<=3 pairs (full recall, zero
    # false positives) as long as no band value exceeds the df cap
    from itertools import combinations

    from conftest import SF_SMOKE

    from clickstream_pipeline_aws_kafka_docker_airflow__spark.io import load_table
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.dedup import (
        SIMHASH_MAX_HAMMING,
        SIMHASH_ND_BITS,
        simhash_near_dup,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    fps = {
        r["doc_id"]: r["simhash"]
        for r in simhash_fingerprints(docs, bits=SIMHASH_ND_BITS).collect()
    }
    truth = {
        (a, b)
        for a, b in combinations(sorted(fps), 2)
        if bin(fps[a] ^ fps[b]).count("1") <= SIMHASH_MAX_HAMMING
    }
    found = {
        (r["id_a"], r["id_b"]) for r in simhash_near_dup(docs).collect()
    }
    assert truth, "no within-distance pairs; eval is vacuous"
    assert found == truth


def test_ngram_jaccard_capped_recall_delta(spark):
    """The cap's recall contract, pinned as a set relationship: capped
    pairs are a subset of uncapped pairs, every under-cap-overlap pair
    survives (full recall on pairs sharing >=1 rare shingle), and every
    LOST pair overlapped ONLY in over-cap boilerplate — exactly the
    class the operator's scale-boundary docstring excludes by design."""
    from pyspark.sql import functions as F

    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.dedup import (
        ngram_jaccard_all_pairs,
        shingle_table,
    )

    df_cap = 4
    boiler = "one two three four five"
    rows = [(i, f"{boiler} filler{i} pad{i} end{i}") for i in range(8)]
    rows += [(100, "red green blue cyan magenta"),
             (101, "red green blue cyan yellow")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    capped = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_all_pairs(docs, threshold=0.0, df_cap=df_cap).collect()
    }
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_all_pairs(docs, threshold=0.0, df_cap=10**9).collect()
    }
    assert capped <= uncapped
    assert (100, 101) in capped  # rare-shingle pair always found

    sh = shingle_table(docs)
    over_cap = {
        r["shingle"]
        for r in sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > df_cap)
        .collect()
    }
    by_doc = {
        d: {r["shingle"] for r in sh.where(F.col("doc_id") == d).collect()}
        for d in {i for p in (uncapped - capped) for i in p}
    }
    for a, b in uncapped - capped:
        overlap = by_doc[a] & by_doc[b]
        assert overlap and overlap <= over_cap, (a, b, overlap - over_cap)


def test_incremental_admission_verdicts(spark):
    """New-batch docs: a near-dup of an old-zone doc is rejected with
    the right match; a unique doc and a shingle-less doc are admitted;
    a doc duplicating only ANOTHER NEW doc is still admitted (admission
    screens against the existing zone, not within-batch)."""
    from pyspark.sql import Row

    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.dedup import (
        band_table,
        incremental_admission,
        minhash_signatures,
        shingle_table,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and keeps running "
        "through the quiet forest at dawn every single day"
    )
    fresh = "completely different text about spark query engines and distributed shuffles at scale"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=base),                               # old
            Row(doc_id=2, text="unrelated old corpus text about kafka topics and parquet files stored daily"),  # old
            Row(doc_id=10, text=base.replace("lazy", "sleepy")),    # new: near-dup of 1
            Row(doc_id=11, text=fresh),                             # new: unique
            Row(doc_id=12, text=fresh),                             # new: dup of ANOTHER NEW doc only
            Row(doc_id=13, text="tiny doc"),                        # new: no shingles
        ]
    )
    sh = shingle_table(docs)
    old_bands = band_table(minhash_signatures(sh.where("doc_id < 10")))
    new_ids = docs.where("doc_id >= 10").select("doc_id")
    out = {
        r["doc_id"]: r
        for r in incremental_admission(new_ids, sh, old_bands).collect()
    }
    assert set(out) == {10, 11, 12, 13}
    assert not out[10]["admitted"] and out[10]["dup_of"] == 1
    assert out[10]["jaccard"] > 0.7
    assert out[11]["admitted"] and out[11]["dup_of"] is None
    assert out[12]["admitted"]  # within-batch dup is NOT the old zone's call
    assert out[13]["admitted"]  # shingle-less -> never pairs -> admitted


def test_ppjoin_exact_vs_bruteforce(spark):
    """The prefix-filter join's whole claim: output EQUALS the
    brute-force all-pairs exact-Jaccard join at the threshold — full
    recall (the prefix lemma drops no qualifying pair) and full
    precision (the verify stage is exact) — on the real sf0.001 shingle
    universe, plus a hand-built corpus with pairs straddling the 0.6
    boundary."""
    from pyspark.sql import functions as F

    from clickstream_pipeline_aws_kafka_docker_airflow__spark.io import (
        load_table,
    )
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.dedup import (
        PPJ_T_DEN,
        PPJ_T_NUM,
        ppjoin_pairs,
        shingle_table,
    )
    from conftest import SF_SMOKE

    def brute(tk):
        a = tk.select(F.col("doc_id").alias("doc_a"), "token")
        b = tk.select(F.col("doc_id").alias("doc_b"), "token")
        sizes = tk.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
        o = (
            a.join(b, "token")
            .where(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("o"))
            .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "n_a"), "doc_a")
            .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "n_b"), "doc_b")
        )
        return {
            (r.doc_a, r.doc_b)
            for r in o.where(
                F.col("o") * PPJ_T_DEN
                >= (F.col("n_a") + F.col("n_b") - F.col("o")) * PPJ_T_NUM
            ).collect()
        }

    docs = load_table(spark, SF_SMOKE, "documents")
    tk = shingle_table(docs).withColumnRenamed("shingle", "token")
    got = {
        (r.doc_a, r.doc_b)
        for r in ppjoin_pairs(docs, toks=tk).collect()
    }
    assert got == brute(tk) and got, "sf0.001 shingle universe"

    # boundary corpus: unit-token sets with J = 3/5 (in), 4/7, 1/2 (out)
    rows = [
        (1, "a b c d e"),       # {a,b,c,d,e}
        (2, "a b c d x"),       # J(1,2) = 4/6 = 0.667 -> in
        (3, "a b c y z"),       # J(1,3) = 3/7 = 0.43 -> out
        (4, "a b c d e"),       # J(1,4) = 1.0 -> in
        (5, "p q r"),           # disjoint
    ]
    hand = spark.createDataFrame(rows, "doc_id long, text string")
    tk2 = hand.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).distinct()
    got2 = {
        (r.doc_a, r.doc_b, r.j_permille)
        for r in ppjoin_pairs(hand, toks=tk2).collect()
    }
    assert got2 == {(1, 2, 666), (1, 4, 1000), (2, 4, 666)}, got2


def test_lsh_band_df_cap_bounds_duplicate_flood(spark):
    """The duplicate-flood guard: byte-identical docs land in the same
    bucket of EVERY band (md5 band keys are uniform over VALUES, not
    over duplicates), so an uncapped self-join pairs them quadratically.
    With band_df_cap the flood buckets drop before the join while pairs
    supported by small buckets keep full recall — the exact-dedup pass
    owns the flood (probe: docs/PROBE_DUPFLOOD.json)."""
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        shingle_table,
    )

    flood = "lorem ipsum dolor sit amet " * 4
    near_a = "the quick brown fox jumps over the lazy dog again and again ok"
    near_b = "the quick brown fox jumps over the lazy dog again and again no"
    rows = [(i, flood) for i in range(10)] + [(100, near_a), (101, near_b)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = minhash_signatures(shingle_table(docs))

    uncapped = {
        (r.id_a, r.id_b) for r in lsh_candidate_pairs(sigs).collect()
    }
    assert (100, 101) in uncapped
    assert sum(1 for a, b in uncapped if a < 100 and b < 100) == 45  # 10C2

    capped = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(sigs, band_df_cap=5).collect()
    }
    assert capped == {(100, 101)}  # flood buckets (size 10 > 5) dropped


def test_incremental_admission_stale_sizes_raises(spark):
    """A ``sizes`` artifact that misses a candidate doc must FAIL the
    batch loudly, not silently drop the pair (an INNER join would admit
    the duplicate); a complete artifact reproduces the no-artifact
    verdicts exactly."""
    import pytest
    from pyspark.sql import Row, functions as F

    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.dedup import (
        band_table,
        incremental_admission,
        minhash_signatures,
        shingle_table,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and keeps running "
        "through the quiet forest at dawn every single day"
    )
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=base),
            Row(doc_id=10, text=base.replace("lazy", "sleepy")),
        ]
    )
    sh = shingle_table(docs)
    old_bands = band_table(minhash_signatures(sh.where("doc_id < 10")))
    new_ids = docs.where("doc_id >= 10").select("doc_id")
    full_sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))

    ok = {
        r["doc_id"]: r
        for r in incremental_admission(
            new_ids, sh, old_bands, sizes=full_sizes
        ).collect()
    }
    assert not ok[10]["admitted"] and ok[10]["dup_of"] == 1

    # stale artifact: old zone's doc 1 missing -> loud failure, never admit
    stale = full_sizes.where(F.col("doc_id") != 1)
    with pytest.raises(Exception, match="sizes artifact has no row"):
        incremental_admission(new_ids, sh, old_bands, sizes=stale).collect()
