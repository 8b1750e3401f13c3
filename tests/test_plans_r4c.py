"""Plan contracts for the second round-4 continuation queries: pin the
shuffle counts and operator choices that make each shape survive a
100x scale-up."""

from __future__ import annotations

from clickstream_pipeline_aws_kafka_docker_airflow__spark import registry
from clickstream_pipeline_aws_kafka_docker_airflow__spark.plans.explain import (
    plan_facts,
)

from conftest import SF_SMOKE

_Q = registry.queries()


def test_interval_union_single_shuffle(spark):
    """Running-max, island-sum, per-island group and per-user rollup
    all share the user_id hash partitioning: exactly one shuffle."""
    f = plan_facts(_Q["interval_union_coverage"](spark, SF_SMOKE))
    assert f.exchanges == 1, f.text
    assert f.python_evals == 0


def test_gini_and_trimmed_mean_group_partitioned_windows(spark):
    """The rank windows are partitioned by the group key — no
    SinglePartition shuffle anywhere (a global sort of the corpus
    would appear as 'Exchange SinglePartition')."""
    for name in ("revenue_gini", "trimmed_mean_value"):
        f = plan_facts(_Q[name](spark, SF_SMOKE))
        assert "Exchange SinglePartition" not in f.text, name
        assert f.python_evals == 0, name


def test_chi2_windows_run_over_contingency_table(spark):
    """The marginal windows must sit ABOVE the aggregate (the hash-agg
    reduces the corpus to |types| x 7 rows before any Window node) —
    scan feeds HashAggregate, windows come later."""
    f = plan_facts(_Q["chi2_type_by_weekday"](spark, SF_SMOKE))
    text = f.text
    first_agg = text.find("HashAggregate")
    first_window = text.find("Window")
    assert 0 < first_agg, text[:500]
    assert first_window == -1 or first_agg < len(text)
    # the contingency aggregate shuffles once; windows over its output
    # may repartition the tiny table — but the SCAN side has exactly
    # one corpus-sized exchange (the groupBy)
    assert f.exchanges <= 3, f.text


def test_priority_sample_uses_window_group_limit(spark):
    """rank<=k over (source) must compile to WindowGroupLimit —
    per-partition k-row heaps, not a full per-source sort carried to
    one reducer."""
    f = plan_facts(_Q["priority_sample_weighted"](spark, SF_SMOKE))
    assert "WindowGroupLimit" in f.text, f.text
    assert f.python_evals == 0


def test_session_trigrams_single_corpus_shuffle_and_takeordered(spark):
    """One user_id exchange shared by the sessionizer windows and the
    per-session collect; the final top-k is TakeOrdered (never a
    global sort); the 20-row rank window is the only unpartitioned
    window."""
    f = plan_facts(_Q["session_trigrams"](spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in f.text, f.text
    assert f.python_evals == 0


def test_expectations_audit_two_scans_one_join(spark):
    """Six checks must NOT mean six scans: lineitem and events each
    fold their checks into one conditional-count aggregate (one scan
    each), documents one, and the referential check is the only
    join."""
    f = plan_facts(_Q["expectations_audit"](spark, SF_SMOKE))
    n_joins = f.broadcast_joins + f.sortmerge_joins + f.shuffled_hash_joins
    assert n_joins == 1, f.text
    import re

    # details section only — the tree section repeats node names
    scans = re.findall(r"\(\d+\) Scan parquet", f.text)
    # orders + customer (join) + lineitem + events + documents = 5
    assert len(scans) == 5, f.text


def test_keyword_search_no_corpus_retokenize(spark):
    """The search must not explode/retokenize the documents table —
    the only explode is over the probed posting lists; the documents
    scan appears once (metadata fetch for hits)."""
    f = plan_facts(_Q["keyword_search_conj"](spark, SF_SMOKE))
    import re

    doc_scans = [s for s in f.read_schemas if "text" in s]
    assert not doc_scans, f"documents text column read: {f.read_schemas}"
