"""ProgressLog listener: captures per-batch metrics for a named query
and appends a JSONL metrics zone."""

from __future__ import annotations

import json
import time

from pyspark.sql import Row


def test_progress_log_captures_batches(spark, tmp_path):
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.streaming.observability import (
        ProgressLog,
    )

    log_path = str(tmp_path / "metrics.jsonl")
    listener = ProgressLog(jsonl_path=log_path)
    spark.streams.addListener(listener)
    try:
        df = spark.createDataFrame([Row(x=i) for i in range(10)])
        src = tmp_path / "src"
        df.repartition(2).write.parquet(str(src))
        stream = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = (
            stream.writeStream.format("noop")
            .queryName("obs_probe")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        assert q.awaitTermination(120)
        # listener bus is async — give it a moment to drain
        deadline = time.time() + 30
        while time.time() < deadline:
            if listener.totals("obs_probe")["input_rows"] >= 10:
                break
            time.sleep(0.5)

        t = listener.totals("obs_probe")
        assert t["input_rows"] == 10
        assert t["batches"] >= 2  # one per input file
        assert t["max_state_rows"] == 0  # stateless sink

        with open(log_path) as f:
            lines = [json.loads(line) for line in f if line.strip()]
        probe = [r for r in lines if r["name"] == "obs_probe"]
        assert sum(r["num_input_rows"] for r in probe) == 10
        assert all(r["batch_duration_ms"] is not None for r in probe)
    finally:
        spark.streams.removeListener(listener)
