"""Round-4c additions: interval union, Gini, expectations audit,
priority sampling, inverted-index search, PPJoin — semantic invariants
and plan contracts beyond the oracle parity the sweep already covers."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from clickstream_pipeline_aws_kafka_docker_airflow__spark import registry
from clickstream_pipeline_aws_kafka_docker_airflow__spark.io import load_table
from clickstream_pipeline_aws_kafka_docker_airflow__spark.plans.explain import (
    formatted_plan,
)

from conftest import SF_CORRECTNESS, SF_SMOKE

_Q = registry.queries()


def _fake_events(spark, monkeypatch, tmp_path, rows, schema, module):
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "events.parquet")
    df.write.parquet(path)
    monkeypatch.setattr(
        module, "load_table", lambda spark, sf_dir, name: spark.read.parquet(path)
    )


def test_interval_union_merge_math(spark, monkeypatch, tmp_path):
    """Hand case: events at t0, t0+100s, t0+400s with 5-min widths chain
    into ONE island ([0,300)+[100,400)+[400,700) — half-open adjacency
    merges) = 700s; an isolated event far away is its own 300s island."""
    import datetime as dt

    import clickstream_pipeline_aws_kafka_docker_airflow__spark.queries.events_q as m

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = dt.timedelta(seconds=1)
    rows = [
        (1, t0, "u1"),
        (2, t0 + 100 * s, "u1"),
        (3, t0 + 400 * s, "u1"),
        (4, t0 + 10_000 * s, "u1"),
        (5, t0, "u2"),
    ]
    _fake_events(
        spark, monkeypatch, tmp_path, rows,
        "event_id long, ts timestamp, user_id string", m,
    )
    out = {
        r["user_id"]: r
        for r in m.interval_union_coverage(spark, "ignored").collect()
    }
    assert out["u1"]["n_islands"] == 2
    assert out["u1"]["covered_us"] == (700 + 300) * 1_000_000
    assert out["u2"]["n_islands"] == 1
    assert out["u2"]["covered_us"] == 300 * 1_000_000


def test_revenue_gini_known_values(spark, monkeypatch, tmp_path):
    """Equal values -> G=0; [1.00, 3.00] -> G=0.25 (250 permille);
    zero/null values excluded."""
    import datetime as dt

    import clickstream_pipeline_aws_kafka_docker_airflow__spark.queries.misc_q as m

    t0 = dt.datetime(2024, 1, 1)
    rows = (
        [(i, t0, "equal", 2.0) for i in range(4)]
        + [(10, t0, "skewed", 1.0), (11, t0, "skewed", 3.0)]
        + [(12, t0, "skewed", 0.0), (13, t0, "skewed", None)]
    )
    _fake_events(
        spark, monkeypatch, tmp_path, rows,
        "event_id long, ts timestamp, event_type string, value double", m,
    )
    out = {r["event_type"]: r for r in m.revenue_gini(spark, "ignored").collect()}
    assert out["equal"]["gini_permille"] == 0
    assert out["equal"]["n"] == 4
    assert out["skewed"]["n"] == 2  # zero and null excluded
    assert out["skewed"]["total_cents"] == 400
    assert out["skewed"]["gini_permille"] == 250


def test_expectations_audit_detects_and_passes(spark):
    """On the driver corpus the suite must show exactly one failing
    check (ship dates run past the contract date — proves violations
    are detected) and pass the rest (proves no false alarms)."""
    rows = {r["check_name"]: r for r in _Q["expectations_audit"](spark, SF_CORRECTNESS).collect()}
    assert len(rows) == 6
    assert rows["lineitem_ship_before_1999"]["n_violations"] > 0
    for name, r in rows.items():
        assert r["n_checked"] > 0, name
        if name != "lineitem_ship_before_1999":
            assert r["n_violations"] == 0, name


def test_priority_sample_is_length_biased(spark):
    """Weight = n_chars, so the sampled docs' mean length must exceed
    the corpus mean (the whole point of weighted inclusion), and each
    source contributes exactly k docs, deterministically."""
    sample = _Q["priority_sample_weighted"](spark, SF_CORRECTNESS).toPandas()
    docs = (
        load_table(spark, SF_CORRECTNESS, "documents")
        .where(F.col("n_chars") > 0)
        .agg(F.avg("n_chars"))
        .collect()[0][0]
    )
    assert (sample.groupby("source").size() == 8).all()
    assert sample["n_chars"].mean() > docs
    again = _Q["priority_sample_weighted"](spark, SF_CORRECTNESS).toPandas()
    assert sorted(sample["doc_id"]) == sorted(again["doc_id"])


def test_keyword_search_reads_index_not_corpus(spark):
    """The search plan must push the token IN-filter into the index
    scan (PushedFilters) — a search that scans the whole index (or
    retokenizes the corpus) defeats the inverted index."""
    plan = formatted_plan(_Q["keyword_search_conj"](spark, SF_SMOKE))
    scans = re.findall(r"PushedFilters: \[(.*?)\]", plan)
    assert any("token" in s and "In(" in s or "In(token" in s for s in scans), plan
    # hit verification: every reported doc really contains all terms
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.queries.text_q import (
        SEARCH_TERMS,
    )

    hits = _Q["keyword_search_conj"](spark, SF_SMOKE)
    joined = hits.join(load_table(spark, SF_SMOKE, "documents"), "doc_id")
    toks = F.split(F.trim(F.lower("text")), r"\s+")
    ok = joined.select(
        *[F.array_contains(toks, t).alias(t) for t in SEARCH_TERMS]
    ).collect()
    assert ok and all(all(r) for r in ok)


def test_chi2_contributions_known_table(spark, monkeypatch, tmp_path):
    """2x2 hand table (30/10 vs 10/30, all marginals 40, N=80): every
    expected count is exactly 20 and every cell contributes
    (30-20)^2/20 = 5.000000 (5,000,000 ppm); total chi2 = 20."""
    import datetime as dt

    import clickstream_pipeline_aws_kafka_docker_airflow__spark.queries.misc_q as m

    mon = dt.datetime(2024, 1, 1, 12)   # Monday  -> dow 2
    tue = dt.datetime(2024, 1, 2, 12)   # Tuesday -> dow 3
    rows = (
        [(i, mon, "A", 1.0) for i in range(30)]
        + [(100 + i, tue, "A", 1.0) for i in range(10)]
        + [(200 + i, mon, "B", 1.0) for i in range(10)]
        + [(300 + i, tue, "B", 1.0) for i in range(30)]
    )
    _fake_events(
        spark, monkeypatch, tmp_path, rows,
        "event_id long, ts timestamp, event_type string, value double", m,
    )
    out = m.chi2_type_by_weekday(spark, "ignored").collect()
    assert len(out) == 4
    for r in out:
        assert r["expected_floor"] == 20, r
        assert r["chi2_contrib_ppm"] == 5_000_000, r
    assert sum(r["chi2_contrib_ppm"] for r in out) == 20_000_000


def test_trimmed_mean_drops_exactly_the_tails(spark, monkeypatch, tmp_path):
    """20 values, 5% trim -> exactly rank 1 and rank 20 drop: the
    planted outliers (-10.00, 1000.00) vanish and the mean is the
    exact integer mean of 1.00..18.00 = 9.50 (950,000,000 microcents)."""
    import datetime as dt

    import clickstream_pipeline_aws_kafka_docker_airflow__spark.queries.misc_q as m

    t0 = dt.datetime(2024, 1, 1)
    vals = [i / 1.0 for i in range(1, 19)] + [-10.0, 1000.0]
    rows = [(i, t0, "t", v) for i, v in enumerate(vals)]
    _fake_events(
        spark, monkeypatch, tmp_path, rows,
        "event_id long, ts timestamp, event_type string, value double", m,
    )
    r = m.trimmed_mean_value(spark, "ignored").collect()[0]
    assert r["n_total"] == 20
    assert r["n_used"] == 18
    assert r["trimmed_mean_microcents"] == 950 * 1_000_000


def test_session_trigrams_session_boundary(spark, monkeypatch, tmp_path):
    """Trigrams never straddle the 30-minute session gap, and order
    within a session is event-time order."""
    import datetime as dt

    import clickstream_pipeline_aws_kafka_docker_airflow__spark.queries.events_q as m

    t0 = dt.datetime(2024, 1, 1, 12)
    mn = dt.timedelta(minutes=1)
    rows = [
        (1, t0, "u1", "view"),
        (2, t0 + mn, "u1", "click"),
        (3, t0 + 2 * mn, "u1", "purchase"),
        (4, t0 + 3 * mn, "u1", "view"),
        # new session (45 min later): would form a cross-gap trigram
        # with events 3,4 if the boundary leaked
        (5, t0 + 48 * mn, "u1", "click"),
        (6, t0 + 49 * mn, "u1", "click"),
        (7, t0 + 50 * mn, "u1", "click"),
    ]
    _fake_events(
        spark, monkeypatch, tmp_path, rows,
        "event_id long, ts timestamp, user_id string, event_type string", m,
    )
    got = {r["trigram"]: r["n"] for r in m.session_trigrams(spark, "ignored").collect()}
    assert got == {
        "view>click>purchase": 1,
        "click>purchase>view": 1,
        "click>click>click": 1,
    }
