"""Lake-maintenance operators: compaction collapses micro-batch files,
clustered writes narrow per-file stat ranges, dynamic partition
overwrite leaves sibling partitions untouched."""

from __future__ import annotations

import glob
import json

from pyspark.sql import Row, functions as F

from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.maintenance import (
    compact_partitioned,
    overwrite_day_partition,
    write_clustered,
)


def test_compaction_collapses_small_files(spark, tmp_path):
    src = tmp_path / "raw"
    # simulate 12 micro-batches into one (date,hour) partition
    for i in range(12):
        part = src / "date=2025-09-01" / "hour=10"
        part.mkdir(parents=True, exist_ok=True)
        (part / f"batch{i}.json").write_text(
            "\n".join(json.dumps({"user_id": f"u{j}", "v": i}) for j in range(50)) + "\n"
        )
    before = len(glob.glob(str(src / "date=*" / "hour=*" / "*.json")))
    assert before == 12
    dst = tmp_path / "compacted"
    compact_partitioned(spark, str(src), str(dst), ["date", "hour"])
    after = glob.glob(str(dst / "date=*" / "hour=*" / "part-*"))
    assert 1 <= len(after) <= 2  # 600 tiny rows -> one file
    # values preserved
    assert spark.read.json(str(dst)).count() == 600


def test_clustered_write_narrows_file_ranges(spark, tmp_path):
    df = spark.range(100_000).select(
        F.col("id").alias("k"), (F.col("id") % 997).alias("v")
    )
    out = tmp_path / "clustered"
    write_clustered(df, str(out), range_col="k", cluster_cols=["k"], n_files=8)
    files = glob.glob(str(out / "part-*.parquet"))
    assert len(files) == 8
    # each file must cover a narrow, disjoint slice of k
    import pyarrow.parquet as pq

    spans = []
    for f in files:
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        spans.append((min(mins), max(maxs)))
    spans.sort()
    total = 100_000
    for lo, hi in spans:
        assert hi - lo < total / 4  # narrow band, not full-range files
    for (_lo_prev, hi_prev), (lo_next, _hi_next) in zip(spans, spans[1:]):
        assert lo_next > hi_prev  # disjoint -> pruning-friendly


def test_dynamic_partition_overwrite(spark, tmp_path):
    kpi = tmp_path / "kpis"
    d1 = spark.createDataFrame([Row(dt="2025-09-01", n=1), Row(dt="2025-09-02", n=2)])
    overwrite_day_partition(spark, d1, str(kpi))
    # rebuild ONLY day 2 with a corrected value
    d2 = spark.createDataFrame([Row(dt="2025-09-02", n=99)])
    day1_files = set(glob.glob(str(kpi / "dt=2025-09-01" / "*")))
    overwrite_day_partition(spark, d2, str(kpi))
    assert set(glob.glob(str(kpi / "dt=2025-09-01" / "*"))) == day1_files  # untouched
    out = {str(r["dt"]): r["n"] for r in spark.read.parquet(str(kpi)).collect()}
    assert out == {"2025-09-01": 1, "2025-09-02": 99}


def test_vacuum_date_partitions_retention(spark, tmp_path):
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.maintenance import (
        vacuum_date_partitions,
    )

    raw = tmp_path / "raw"
    for day in ("2025-08-30", "2025-08-31", "2025-09-01", "2025-09-02"):
        d = raw / f"date={day}"
        d.mkdir(parents=True)
        (d / "part.jsonl").write_text('{"x": 1}\n')
    (raw / "_not_a_partition").mkdir()

    # dry run: reports but deletes nothing
    listed = vacuum_date_partitions(spark, str(raw), "2025-09-01")
    assert [p.rsplit("/", 1)[1] for p in listed] == [
        "date=2025-08-30",
        "date=2025-08-31",
    ]
    assert (raw / "date=2025-08-30").exists()

    # real run: removes exactly the old partitions, keeps the rest
    vacuum_date_partitions(spark, str(raw), "2025-09-01", dry_run=False)
    left = sorted(p.name for p in raw.iterdir())
    assert left == ["_not_a_partition", "date=2025-09-01", "date=2025-09-02"]

    # missing root is a no-op
    assert vacuum_date_partitions(spark, str(tmp_path / "nope"), "2025-01-01") == []


def test_morton_key_interleaves(spark):
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.maintenance import (
        morton_key,
    )
    from pyspark.sql import functions as F

    rows = spark.range(1).select(
        morton_key(F.lit(0b101), F.lit(0b011), bits=3).alias("k")
    ).collect()
    # a=101, b=011 -> bits (a2 b2 a1 b1 a0 b0) = 1 0 0 1 1 1 = 0b100111
    assert rows[0].k == 0b100111

    # monotone on each axis within the other held at 0
    vals = spark.range(16).select(
        morton_key(F.col("id"), F.lit(0), bits=4).alias("ka"),
        morton_key(F.lit(0), F.col("id"), bits=4).alias("kb"),
    ).collect()
    ka = [r.ka for r in vals]
    kb = [r.kb for r in vals]
    assert ka == sorted(ka) and kb == sorted(kb)


def test_zorder_files_are_tiles_in_both_dims(spark, tmp_path):
    """The Z-order claim, measured from parquet footers: every output
    file covers a narrow min/max band in BOTH dimensions, while a
    lexicographic sort leaves the trailing dimension spanning its full
    range in every file."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.maintenance import (
        write_zordered,
    )

    n = 1 << 14
    # two independent uniform dims (id bit-reversed for the second)
    df = spark.range(n).select(
        F.col("id").alias("x"),
        ((F.col("id") * 2654435761) % n).alias("y"),
    )

    def spans(path, col):
        out = []
        for f in sorted(glob.glob(f"{path}/part-*.parquet")):
            md = pq.ParquetFile(f).metadata
            lo = min(
                md.row_group(i).column(
                    [md.schema.column(j).name for j in range(md.num_columns)].index(col)
                ).statistics.min
                for i in range(md.num_row_groups)
            )
            hi = max(
                md.row_group(i).column(
                    [md.schema.column(j).name for j in range(md.num_columns)].index(col)
                ).statistics.max
                for i in range(md.num_row_groups)
            )
            out.append((hi - lo) / (n - 1))
        return out

    zpath = str(tmp_path / "z")
    write_zordered(df, zpath, "x", "y", n_files=16)
    # lexicographic baseline: range by x, sort by (x, y)
    lpath = str(tmp_path / "lex")
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x", "y")
        .write.parquet(lpath)
    )

    zx, zy = spans(zpath, "x"), spans(zpath, "y")
    lx, ly = spans(lpath, "x"), spans(lpath, "y")
    # lexicographic: x prunes great, y not at all
    assert max(lx) <= 0.20
    assert min(ly) >= 0.90
    # z-order: every file is one aligned Z-tile — with 16 files each
    # dim spans at most 1/4 of its range (+ grid rounding), and the
    # routing is exact (no sampled boundaries), so this is deterministic
    assert max(zx) <= 0.30, zx
    assert max(zy) <= 0.30, zy


def test_morton_key_matches_python_reference(spark):
    """Spark bit-expression vs a straightforward Python reference over
    random grid points — the full interleave, not just the axes."""
    import random

    from pyspark.sql import functions as F

    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.maintenance import (
        morton_key,
    )

    def ref(a, b, bits=16):
        k = 0
        for i in range(bits):
            k |= ((a >> i) & 1) << (2 * i + 1) | ((b >> i) & 1) << (2 * i)
        return k

    rnd = random.Random(4)
    pairs = [(rnd.randrange(1 << 16), rnd.randrange(1 << 16)) for _ in range(1000)]
    df = spark.createDataFrame(pairs, "a long, b long").select(
        "a", "b", morton_key("a", "b").alias("k")
    )
    for r in df.collect():
        assert r.k == ref(r.a, r.b), (r.a, r.b)
