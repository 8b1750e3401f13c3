"""Hypothesis fuzz for incremental_admission: race the Spark verdicts
(admitted / dup_of / jaccard) against a pure-Python twin of the whole
chain — md5 minhash signatures, banded blocking, exact-Jaccard verify,
integer cross-multiplied threshold, best-match tie-break.

The md5 spelling is deliberately engine-portable (operators/dedup.py),
so the Python twin reproduces the Spark bands bit-for-bit; any
divergence is a real defect in the candidate generation, the verify
join, or the verdict arithmetic."""

from __future__ import annotations

import hashlib
from itertools import product

from hypothesis import given, settings, strategies as st

from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.dedup import (
    BAND_SIZE,
    J_ADMIT_DEN,
    J_ADMIT_NUM,
    NUM_HASHES,
    band_table,
    incremental_admission,
    minhash_signatures,
)

_MD5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731


def _twin(new: dict[int, set], old: dict[int, set]):
    """Pure-Python admission verdicts: {doc_id: (admitted, dup_of, j4)}."""

    def bands_of(sh: set) -> set:
        if not sh:
            return set()
        mh = [min(_MD5(f"{i}|{s}") for s in sh) for i in range(NUM_HASHES)]
        return {
            (b, _MD5("".join(mh[b * BAND_SIZE : (b + 1) * BAND_SIZE])))
            for b in range(NUM_HASHES // BAND_SIZE)
        }

    old_b = {i: bands_of(sh) for i, sh in old.items() if sh}
    out = {}
    for i, sh in new.items():
        nb = bands_of(sh)
        best = None  # (j_exact, id_old, j4)
        for o, ob in old_b.items():
            if not (nb & ob):
                continue
            n_common = len(sh & old[o])
            n_union = len(sh) + len(old[o]) - n_common
            if n_common * J_ADMIT_DEN < n_union * J_ADMIT_NUM:
                continue
            j = n_common / n_union
            if best is None or j > best[0] or (j == best[0] and o < best[1]):
                best = (j, o)
        if best is None:
            out[i] = (True, None, None)
        else:
            out[i] = (False, best[1], round(best[0] + 1e-12, 4))
    return out


@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=9),
        st.sets(st.sampled_from("abcdefg"), min_size=0, max_size=6),
        min_size=2,
        max_size=8,
    )
)
@settings(max_examples=10, deadline=None)
def test_admission_verdicts_match_python_twin(spark, corpora):
    new = {i: sh for i, sh in corpora.items() if i % 2 == 0}
    old = {i: sh for i, sh in corpora.items() if i % 2 == 1}
    if not new or not old:
        return
    sh_rows = [
        (i, s) for i, sh in {**new, **old}.items() for s in sh
    ]
    if not sh_rows:
        return
    shingles = spark.createDataFrame(sh_rows, "doc_id long, shingle string")
    new_ids = spark.createDataFrame(
        [(i,) for i in new], "doc_id long"
    )
    old_bands = band_table(
        minhash_signatures(
            shingles.join(
                spark.createDataFrame([(i,) for i in old], "doc_id long"),
                "doc_id",
                "left_semi",
            )
        )
    )
    got = {
        r["doc_id"]: (r["admitted"], r["dup_of"], r["jaccard"])
        for r in incremental_admission(new_ids, shingles, old_bands).collect()
    }
    want = _twin(new, old)
    assert set(got) == set(new)
    for i in new:
        g, w = got[i], want[i]
        assert g[0] == w[0], (i, g, w, new, old)
        assert g[1] == w[1], (i, g, w, new, old)
        if w[2] is not None:
            assert abs(g[2] - w[2]) < 5e-4, (i, g, w)
