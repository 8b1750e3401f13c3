"""Characterization: where Spark's and DuckDB's lower() DIVERGE.

Full-Unicode lowercasing is engine policy, not a bug to fix: Java (and
therefore Spark's ``lower``) applies the context-sensitive SpecialCasing
rules — dotted capital İ lowers to ``i`` + COMBINING DOT ABOVE, a
word-final Σ becomes final sigma ς — while DuckDB's utf8proc does the
simple one-codepoint fold (İ -> i, every Σ -> σ). Both are defensible
readings of Unicode; they cannot hash-match each other.

The repo's contract, documented here and in docs/architecture.md:
text normalization IS the engine's lower(); cross-engine oracle parity
is guaranteed on the simple-fold-stable subset (everything the
generated corpora and the adversarial fixtures contain — ASCII, Latin-1
accents, CJK, emoji, ß which neither engine expands); the
context-sensitive Turkish/Greek edges are engine-specific. This test
pins the exact divergence so an engine upgrade that CHANGES either
behavior (e.g. Spark collation-aware lowercasing) surfaces as a test
failure instead of a silent oracle drift.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

# (input, spark/Java expectation, duckdb/utf8proc expectation)
CASES = [
    ("İstanbul", "i̇stanbul", "istanbul"),      # dotted capital I
    ("ΣΙΣΥΦΟΣ", "σισυφος", "σισυφοσ"),               # final sigma
    ("STRASSE ß", "strasse ß", "strasse ß"),          # agree: ß unexpanded
    ("ǅungla", "ǆungla", "ǆungla"),                  # agree: digraph
    ("ﬁle", "ﬁle", "ﬁle"),                            # agree: ligature kept
    ("MiXeD CaSe", "mixed case", "mixed case"),       # agree: ASCII
    ("héllo wörld", "héllo wörld", "héllo wörld"),    # agree: Latin-1
]


def test_lower_divergence_is_exactly_the_documented_set(spark):
    texts = [c[0] for c in CASES]
    sdf = spark.createDataFrame([(t,) for t in texts], "t string").select(
        F.lower("t").alias("l")
    )
    got_spark = [r["l"] for r in sdf.collect()]
    con = duckdb.connect(":memory:")
    try:
        got_duck = [
            con.sql("SELECT lower(?)", params=[t]).fetchone()[0] for t in texts
        ]
    finally:
        con.close()
    for (t, want_s, want_d), gs, gd in zip(CASES, got_spark, got_duck):
        assert gs == want_s, f"Spark lower({t!r}) changed: {gs!r}"
        assert gd == want_d, f"DuckDB lower({t!r}) changed: {gd!r}"


def test_fixture_text_is_casefold_stable(spark):
    """Every document in the committed adversarial fixture lowers
    identically on both engines — the oracle-parity precondition the
    fixtures must keep satisfying as they grow."""
    import os

    adv = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "fixtures", "adv_sf"
    )
    sdf = (
        spark.read.parquet(f"{adv}/documents.parquet")
        .where(F.col("text").isNotNull())
        .select("doc_id", F.lower("text").alias("l"))
    )
    got_spark = {r["doc_id"]: r["l"] for r in sdf.collect()}
    con = duckdb.connect(":memory:")
    try:
        got_duck = dict(
            con.sql(
                f"SELECT doc_id, lower(text) FROM "
                f"read_parquet('{adv}/documents.parquet') "
                f"WHERE text IS NOT NULL"
            ).fetchall()
        )
    finally:
        con.close()
    assert got_spark == got_duck
