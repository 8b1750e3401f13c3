"""Job-layer tests: run-date resolution precedence and the daily KPI
job against a real raw zone."""

from __future__ import annotations

import datetime as dt
import json

from clickstream_pipeline_aws_kafka_docker_airflow__spark.jobs import (
    resolve_run_date,
    run_daily_kpis,
)


def test_resolve_run_date_precedence():
    logical = dt.datetime(2025, 9, 3, 12, 0)
    # 1. explicit conf wins, any supported format, quotes trimmed
    assert resolve_run_date('"2025-09-01"', logical, env={}) == "2025-09-01"
    assert resolve_run_date("2025-09-01T08:30:00", logical, env={}) == "2025-09-01"
    # 2. env RUN_DATE next
    assert resolve_run_date(None, logical, env={"RUN_DATE": "2025-09-02"}) == "2025-09-02"
    # 3. unparseable conf falls through to env (reference behavior)
    assert (
        resolve_run_date("not-a-date", logical, env={"RUN_DATE": "2025-09-02"})
        == "2025-09-02"
    )
    # 4. logical date
    assert resolve_run_date(None, logical, env={}) == "2025-09-03"
    # 5. today-in-TZ fallback
    today_utc = dt.datetime.now(dt.timezone.utc).date().isoformat()
    assert resolve_run_date(None, None, env={}) == today_utc


def test_run_daily_kpis_job(spark, tmp_path):
    raw = tmp_path / "raw"
    day_dir = raw / "date=2025-09-01" / "hour=10"
    day_dir.mkdir(parents=True)
    ev = {
        "event_ts": "2025-09-01T10:00:00Z",
        "user_id": "u_1",
        "session_id": "s1",
        "event_type": "purchase",
        "page": "/",
        "product_id": "sku_1",
        "price": 10.0,
        "currency": "USD",
        "referrer": "google",
        "user_agent": "UA",
    }
    lines = [json.dumps(ev), json.dumps(dict(ev, user_id="u_2", event_type="page_view", price=None))]
    (day_dir / "b.jsonl").write_text("\n".join(lines) + "\n")

    assert run_daily_kpis(spark, str(raw), str(tmp_path / "kpis"), "2025-09-01") == "OK"
    out = spark.read.parquet(str(tmp_path / "kpis")).collect()
    assert len(out) == 1
    row = out[0].asDict()
    assert row["total_events"] == 2
    assert row["purchases"] == 1 and row["revenue_usd"] == 10.0
    assert str(row["dt"]) == "2025-09-01"

    # missing partition -> NO_INPUT marker, not an exception
    assert (
        run_daily_kpis(spark, str(raw), str(tmp_path / "kpis2"), "2099-01-01")
        == "NO_INPUT"
    )


def test_dags_importable_without_airflow():
    import importlib
    import sys

    sys.path.insert(0, "/root/repo/dags")
    mod = importlib.import_module("clickstream_dags")
    assert mod.HAVE_AIRFLOW is False  # container has no airflow
    # task callables still defined and reference real jobs
    assert callable(mod._task_daily_kpis)


def test_run_daily_kpis_two_days_survive(spark, tmp_path):
    """Day-N run must rewrite ONLY dt=<day> (dynamic partition
    overwrite): under static mode a second day-run deletes the first
    day's partition — the data-loss race of a catchup backfill."""
    raw = tmp_path / "raw"
    ev = {
        "event_ts": "2025-09-01T10:00:00Z",
        "user_id": "u_1",
        "session_id": "s1",
        "event_type": "purchase",
        "page": "/",
        "product_id": "sku_1",
        "price": 10.0,
        "currency": "USD",
        "referrer": "google",
        "user_agent": "UA",
    }
    for day in ("2025-09-01", "2025-09-02"):
        d = raw / f"date={day}" / "hour=10"
        d.mkdir(parents=True)
        (d / "b.jsonl").write_text(
            json.dumps(dict(ev, event_ts=f"{day}T10:00:00Z")) + "\n"
        )
    kpi = str(tmp_path / "kpis")
    prior = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    assert run_daily_kpis(spark, str(raw), kpi, "2025-09-01") == "OK"
    assert run_daily_kpis(spark, str(raw), kpi, "2025-09-02") == "OK"
    days = sorted(
        str(r["dt"]) for r in spark.read.parquet(kpi).select("dt").collect()
    )
    assert days == ["2025-09-01", "2025-09-02"]
    # the dynamic-overwrite conf must not leak into the shared session
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode") == prior


def test_run_daily_kpis_no_input_vs_error(spark, tmp_path):
    """Missing day-partition -> NO_INPUT; any other read failure must
    propagate (the reference only treats an empty listing as NO_INPUT,
    daily_kpis.py:155-159)."""
    import pytest

    from clickstream_pipeline_aws_kafka_docker_airflow__spark import jobs

    assert (
        run_daily_kpis(
            spark, str(tmp_path / "nowhere"), str(tmp_path / "kpis"), "2025-09-01"
        )
        == "NO_INPUT"
    )
    # a non-path failure (corrupt store, permissions, ...) must NOT be
    # masked as an empty day — the old bare-except swallowed it
    def _boom(*a, **k):
        raise RuntimeError("storage failure")

    orig = jobs.read_jsonl_drop_malformed
    jobs.read_jsonl_drop_malformed = _boom
    try:
        with pytest.raises(RuntimeError, match="storage failure"):
            run_daily_kpis(spark, str(tmp_path), str(tmp_path / "kpis"), "2025-09-01")
    finally:
        jobs.read_jsonl_drop_malformed = orig


def test_object_store_conf_surface():
    """The s3a block carries SSE parity with the reference (AES256,
    ingest_clickstream_to_s3.py:74-79) and a zero-rename committer —
    builder-time confs, asserted without starting a session."""
    from pyspark.sql import SparkSession

    from clickstream_pipeline_aws_kafka_docker_airflow__spark.session import (
        OBJECT_STORE_CONFS,
        object_store_builder_confs,
    )

    assert OBJECT_STORE_CONFS["spark.hadoop.fs.s3a.encryption.algorithm"] == "AES256"
    assert OBJECT_STORE_CONFS["spark.hadoop.fs.s3a.committer.name"] == "magic"
    b = object_store_builder_confs(SparkSession.builder)
    opts = b._options
    for k, v in OBJECT_STORE_CONFS.items():
        assert opts.get(k) == v


def test_run_corpus_curation_writes_consistent_zones(spark, sf_dir, tmp_path):
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.jobs import (
        run_corpus_curation,
    )
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.queries.curation_q import (
        corpus_curation,
    )

    out = str(tmp_path / "curated")
    counts = run_corpus_curation(spark, sf_dir, out)
    assert counts["curated_docs"] == corpus_curation(spark, sf_dir).count()
    stats = spark.read.parquet(f"{out}/source_stats")
    assert 0 < counts["kept_sources"] <= stats.count()
    # idempotent rerun: same zones, same counts
    again = run_corpus_curation(spark, sf_dir, out)
    assert again == counts


def test_run_kpi_backfill_range_one_job(spark, tmp_path):
    """A 2-day backfill rebuilds exactly its range in one job: days
    outside the range survive untouched, missing days inside the range
    contribute nothing, and the written days match a per-day rerun."""
    import json as _json

    from clickstream_pipeline_aws_kafka_docker_airflow__spark.jobs import (
        run_kpi_backfill,
    )

    raw = tmp_path / "raw"

    def _day(day, users):
        d = raw / f"date={day}" / "hour=10"
        d.mkdir(parents=True)
        rows = [
            {
                "event_ts": f"{day}T10:00:00Z",
                "user_id": u,
                "session_id": f"s_{u}",
                "event_type": "purchase",
                "page": "/",
                "product_id": "sku",
                "price": 5.0,
                "currency": "USD",
                "referrer": "r",
                "user_agent": "UA",
            }
            for u in users
        ]
        (d / "b.jsonl").write_text(
            "\n".join(_json.dumps(r) for r in rows) + "\n"
        )

    _day("2025-09-01", ["u1"])
    _day("2025-09-02", ["u1", "u2"])
    _day("2025-09-04", ["u3"])  # outside the backfill range

    kpis = tmp_path / "kpis"
    # seed the zone with all days, then corrupt the 09-02 row's source
    # and backfill 09-01..09-03 (09-03 missing -> contributes nothing)
    assert run_kpi_backfill(
        spark, str(raw), str(kpis), "2025-09-01", "2025-09-04"
    ) == {"days_written": 3}
    _day("2025-09-03", ["u9"])  # lands late
    out = run_kpi_backfill(spark, str(raw), str(kpis), "2025-09-01", "2025-09-03")
    assert out == {"days_written": 3}
    got = {
        str(r["dt"]): r["total_events"]
        for r in spark.read.parquet(str(kpis)).collect()
    }
    assert got == {
        "2025-09-01": 1,
        "2025-09-02": 2,
        "2025-09-03": 1,
        "2025-09-04": 1,  # untouched by the second (narrower) backfill
    }
    # empty range -> writes nothing
    assert run_kpi_backfill(
        spark, str(raw), str(kpis), "2099-01-01", "2099-01-02"
    ) == {"days_written": 0}


def test_build_corpus_artifacts_counts(spark):
    from conftest import SF_SMOKE as SF

    from clickstream_pipeline_aws_kafka_docker_airflow__spark.jobs import (
        run_build_corpus_artifacts,
    )

    counts = run_build_corpus_artifacts(spark, SF)
    assert set(counts) == {
        "shingles", "simhash_fps32", "simhash_fps60",
        "dup_pairs", "cluster_labels", "contamination", "lsh_bands",
        "pq_codes", "ivf_centroids", "ivf_cells", "ivfpq_index",
        "pq_res_codes", "ivfpq_res_index",
        "ppjoin_pairs", "inverted_index", "textrank_keywords",
        "ngram_pairs", "semdedup", "cms_daily_zone", "simhash_pairs",
    }
    assert counts["semdedup"] == spark.read.parquet(
        f"{SF}/embeddings.parquet"
    ).count()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    n_vecs = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert counts["cluster_labels"] == n_docs
    assert counts["simhash_fps32"] == n_docs
    assert counts["simhash_fps60"] == n_docs
    assert counts["shingles"] > n_docs  # many distinct n-grams per doc
    assert counts["lsh_bands"] == n_vecs * 8
    assert counts["pq_codes"] == n_vecs
    assert counts["ivf_cells"] == n_vecs
    assert counts["ivfpq_index"] == n_vecs
    assert counts["pq_res_codes"] == n_vecs
    assert counts["ivfpq_res_index"] == n_vecs
    assert counts["inverted_index"] > 0  # one row per distinct token
    assert counts["textrank_keywords"] == 20
    assert counts["ivf_centroids"] > 0
    # idempotent: second run reads, counts identical
    assert run_build_corpus_artifacts(spark, SF) == counts


def test_daily_kpis_ignores_uncommitted_sink_orphans(spark, tmp_path):
    """Exactly-once END-TO-END: the raw zone is a Structured Streaming
    file sink, so its root carries a _spark_metadata commit log. A data
    file left by a micro-batch that crashed before its manifest commit
    (simulated by dropping an orphan into the day dir) must be
    INVISIBLE to run_daily_kpis — the job reads the root through the
    log, not the partition subdir through plain listing (r6 review)."""
    import glob as _glob

    from pyspark.sql import Row

    from clickstream_pipeline_aws_kafka_docker_airflow__spark.streaming.ingest import (
        start_ingest,
    )

    src = tmp_path / "src"
    src.mkdir()
    ev = {
        "event_ts": "2025-09-01T10:00:00Z",
        "user_id": "u_1",
        "session_id": "s1",
        "event_type": "purchase",
        "page": "/",
        "product_id": "sku_1",
        "price": 10.0,
        "currency": "USD",
        "referrer": "google",
        "user_agent": "UA",
    }
    lines = [
        json.dumps(ev),
        json.dumps(dict(ev, user_id="u_2", event_type="page_view", price=None)),
    ]
    spark.createDataFrame(
        [Row(value=v) for v in lines]
    ).coalesce(1).write.mode("overwrite").text(str(src / "b1"))

    raw = tmp_path / "raw"
    stream = spark.readStream.text(str(src / "*"))
    q = start_ingest(stream, str(raw), str(tmp_path / "ck"))
    q.awaitTermination(120)
    assert (raw / "_spark_metadata").exists()

    kpi1 = tmp_path / "kpis1"
    assert run_daily_kpis(spark, str(raw), str(kpi1), "2025-09-01") == "OK"
    base = spark.read.parquet(str(kpi1)).collect()[0]

    # forge the crash orphan: a duplicate of the committed data file
    # under the same partition, absent from the commit log
    committed = _glob.glob(str(raw / "date=2025-09-01" / "hour=*" / "part-*"))
    assert committed
    import shutil as _sh

    _sh.copy(committed[0], committed[0].replace("part-", "part-orphan-"))

    kpi2 = tmp_path / "kpis2"
    assert run_daily_kpis(spark, str(raw), str(kpi2), "2025-09-01") == "OK"
    redo = spark.read.parquet(str(kpi2)).collect()[0]
    assert redo["total_events"] == base["total_events"] == 2
    assert redo["revenue_usd"] == base["revenue_usd"]
