#!/usr/bin/env python
"""Reproducible scale probes behind the README's measured tables.

Usage: python scripts/scale_probe.py [events|sketch|ann|iterative|all]

* events — generate 10M synthetic events (30 days), run the KPI family
  (exact, HLL, hourly, sessionize) and print wall times.
* sketch — build the daily HLL sketch zone over the 10M events and
  serve a 30-day range-distinct from it vs re-scanning raw.
* ann    — 100k clustered 64-dim vectors: brute-force vs IVF vs
  IVF-PQ raw/residual codes, timings + recall@5.
* iterative — 10M events: PageRank over the product-transition graph,
  the per-series EWMA fold, and the daily CMS zone build + range serve.

Everything is seeded; numbers vary with hardware but orderings and
recalls reproduce exactly. Each probe prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from clickstream_pipeline_aws_kafka_docker_airflow__spark.session import (  # noqa: E402
    get_spark,
)

N_EVENTS = 10_000_000
DAYS = 30
ANN_N, ANN_D, ANN_C = 100_000, 64, 100
ANN_QUERIES, ANN_K = 20, 5


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 2)


def _events_parquet(spark, d):
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.sources.generator import (
        generate_events_batch,
    )

    path = f"{d}/events10m"
    gen_s = _t(
        lambda: generate_events_batch(spark, N_EVENTS, days=DAYS)
        .write.parquet(path)
    )
    return path, gen_s


def probe_events(spark) -> dict:
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.kpis import (
        daily_kpis,
    )

    d = tempfile.mkdtemp(prefix="probe_events_")
    path, gen_s = _events_parquet(spark, d)
    e = spark.read.parquet(path).withColumn("ts", F.col("event_ts"))

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    out = {
        "probe": "events",
        "n_events": N_EVENTS,
        "generate_write_s": gen_s,
        "daily_kpis_exact_s": _t(
            lambda: run(
                daily_kpis(
                    e, ts="ts", user="user_id", session="session_id",
                    etype="event_type", price="price",
                )
            )
        ),
        "daily_kpis_hll_s": _t(
            lambda: run(
                daily_kpis(
                    e, ts="ts", user="user_id", session="session_id",
                    etype="event_type", price="price",
                    approx_distinct=True,
                )
            )
        ),
        "sessionize_30min_s": _t(
            lambda: run(
                e.groupBy(
                    F.session_window("ts", "30 minutes").alias("sw"),
                    "user_id",
                ).agg(F.count(F.lit(1)).alias("n_events"))
            )
        ),
    }
    return out


def probe_sketch(spark) -> dict:
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.streaming.sketch_zone import (
        SKETCH_LG_K,
        range_distinct_from_zone,
    )

    d = tempfile.mkdtemp(prefix="probe_sketch_")
    path, gen_s = _events_parquet(spark, d)
    e = spark.read.parquet(path)
    zone = f"{d}/zone"
    build_s = _t(
        lambda: e.groupBy(F.to_date("event_ts").cast("string").alias("dt"))
        .agg(F.hll_sketch_agg("user_id", F.lit(SKETCH_LG_K)).alias("sk"))
        .repartition(1)
        .write.partitionBy("dt")
        .parquet(zone)
    )
    lo = e.agg(F.min(F.to_date("event_ts"))).collect()[0][0].isoformat()
    hi = e.agg(F.max(F.to_date("event_ts"))).collect()[0][0].isoformat()
    t0 = time.perf_counter()
    row = range_distinct_from_zone(spark, zone, lo, hi).collect()[0]
    serve_s = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    exact = e.agg(F.countDistinct("user_id")).collect()[0][0]
    exact_s = round(time.perf_counter() - t0, 3)
    return {
        "probe": "sketch",
        "n_events": N_EVENTS,
        "build_zone_s": build_s,
        "serve_range_s": serve_s,
        "rescan_exact_s": exact_s,
        "estimate": int(row.est_distinct),
        "exact": int(exact),
        "rel_err_pct": round(abs(row.est_distinct - exact) / exact * 100, 3),
    }


def probe_ann(spark) -> dict:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.pq import (
        encode_pq,
        ivfpq_topk,
        ivfpq_topk_residual,
        residual_frame,
        train_pq,
    )
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.similarity import (
        _assign_to_centroids,
        ivf_topk,
        kmeans_centroid_list,
        topk_matmul_arrow,
    )

    rng = np.random.default_rng(7)
    cents_np = rng.normal(0, 1, (ANN_C, ANN_D))
    asg = rng.integers(0, ANN_C, ANN_N)
    vecs = (cents_np[asg] + rng.normal(0, 0.3, (ANN_N, ANN_D))).astype(
        "float32"
    )
    d = tempfile.mkdtemp(prefix="probe_ann_")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(ANN_N)),
                "embedding": pa.array(
                    vecs.tolist(), pa.list_(pa.float32())
                ),
            }
        ),
        f"{d}/emb.parquet",
        row_group_size=10_000,
    )
    emb = spark.read.parquet(f"{d}/emb.parquet")

    out: dict = {"probe": "ann", "n_vectors": ANN_N, "n_clusters": ANN_C}
    t0 = time.perf_counter()
    bf = {
        (r.qid, r.nid)
        for r in topk_matmul_arrow(emb, ANN_QUERIES, ANN_K).collect()
    }
    out["bruteforce_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    cents = kmeans_centroid_list(emb, 16, 2)
    cells = _assign_to_centroids(emb, cents, top=1).select(
        "vec_id", "centroid_id"
    )
    cells.write.parquet(f"{d}/cells")
    cellsr = spark.read.parquet(f"{d}/cells")
    out["build_ivf_s"] = round(time.perf_counter() - t0, 2)

    def recall(pairs):
        return round(len(pairs & bf) / len(bf), 2)

    t0 = time.perf_counter()
    ivf = {
        (r.qid, r.nid)
        for r in ivf_topk(
            emb, ANN_QUERIES, ANN_K, cents=cents, corpus_cells=cellsr
        ).collect()
    }
    out["ivf_search_s"], out["ivf_recall"] = (
        round(time.perf_counter() - t0, 2),
        recall(ivf),
    )

    for label, frame in (("raw", emb), ("residual", None)):
        src = frame if frame is not None else residual_frame(
            emb, cellsr, cents
        )
        books = train_pq(src)
        t0 = time.perf_counter()
        idx = cellsr.join(encode_pq(src, books), "vec_id")
        idx.write.mode("overwrite").parquet(f"{d}/idx_{label}")
        idxr = spark.read.parquet(f"{d}/idx_{label}")
        build = round(time.perf_counter() - t0, 2)
        search = ivfpq_topk if label == "raw" else ivfpq_topk_residual
        for margin in (50, 200):
            t0 = time.perf_counter()
            got = {
                (r.qid, r.nid)
                for r in search(
                    emb, ANN_QUERIES, ANN_K, cents=cents, books=books,
                    rescore_margin=margin, index=idxr,
                ).collect()
            }
            out[f"ivfpq_{label}_m{margin}_s"] = round(
                time.perf_counter() - t0, 2
            )
            out[f"ivfpq_{label}_m{margin}_recall"] = recall(got)
        out[f"ivfpq_{label}_build_s"] = build
    return out


def probe_iterative(spark) -> dict:
    """Iterative/sequential operators at 10M events: PageRank over the
    product-transition graph, the EWMA fold over hourly series, and the
    mergeable daily CMS zone (build + range serve)."""
    from pyspark.sql import Window

    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.graph import (
        pagerank_int,
    )
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.timeseries import (
        ewma_series,
    )
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.streaming.cms_zone import (
        _cells,
        estimates_from_zone,
    )

    d = tempfile.mkdtemp(prefix="probe_iter_")
    path, gen_s = _events_parquet(spark, d)
    e = spark.read.parquet(path).withColumn("ts", F.col("event_ts"))

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    w = Window.partitionBy("user_id").orderBy("ts")
    edges = (
        e.select(
            F.col("product_id").alias("src"),
            F.lead("product_id").over(w).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hh")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    zone = f"{d}/cms_zone"

    def build_zone():
        from clickstream_pipeline_aws_kafka_docker_airflow__spark.session import (
            temp_confs,
        )

        with temp_confs(
            spark, {"spark.sql.sources.partitionOverwriteMode": "dynamic"}
        ):
            (
                _cells(e, "ts", "user_id")
                .withColumn("batch_id", F.lit(0))
                .repartition(1)
                .write.partitionBy("batch_id")
                .mode("overwrite")
                .parquet(zone)
            )

    out = {
        "probe": "iterative",
        "n_events": N_EVENTS,
        "generate_write_s": gen_s,
        "pagerank_3iter_s": _t(lambda: run(pagerank_int(edges))),
        "ewma_hourly_fold_s": _t(
            lambda: run(ewma_series(hourly, ["event_type"], "hh", "cnt"))
        ),
        "cms_zone_build_s": _t(build_zone),
        "cms_zone_serve_s": _t(
            lambda: run(
                estimates_from_zone(
                    spark, zone, [f"u_{i}" for i in range(1, 11)],
                    "2025-09-01", "2025-09-30",
                )
            )
        ),
    }
    return out


PROBES = {"events": probe_events, "sketch": probe_sketch, "ann": probe_ann, "iterative": probe_iterative}


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    names = list(PROBES) if which == "all" else [which]
    spark = get_spark(app_name="scale-probe")
    for n in names:
        print(json.dumps(PROBES[n](spark)), flush=True)


if __name__ == "__main__":
    main()
