"""Contract tests of the multimodal binary-column operators: bounded
thumb size, binary round-trip through Arrow, determinism. (Value-level
checks of the histogram/meta/frame paths live in the DuckDB oracles.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from clickstream_pipeline_aws_kafka_docker_airflow__spark.io import load_table
from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.multimodal import (
    THUMB_H,
    THUMB_W,
    attach_fake_media,
    media_byte_histogram,
    resize_thumb,
)

SF_DIR = "/root/testdata/sf0.001"


def test_resize_thumb_bounded_and_deterministic(spark):
    media = attach_fake_media(load_table(spark, SF_DIR, "documents"))
    out = resize_thumb(media).collect()
    src_len = {
        r["doc_id"]: r["n"]
        for r in media.select(
            "doc_id", F.length("media").alias("n")
        ).collect()
    }
    assert len(out) == len(src_len)
    budget = THUMB_W * THUMB_H
    for r in out:
        expect = min(src_len[r["doc_id"]], budget)
        assert len(r["thumb"]) == expect
        assert (r["t_width"], r["t_height"]) == (THUMB_W, THUMB_H)
    # determinism: identical bytes on a re-run
    again = {r["doc_id"]: bytes(r["thumb"]) for r in resize_thumb(media).collect()}
    assert {r["doc_id"]: bytes(r["thumb"]) for r in out} == again


def test_histogram_counts_sum_to_length(spark):
    media = attach_fake_media(load_table(spark, SF_DIR, "documents"))
    rows = media_byte_histogram(media.select("doc_id", "media")).collect()
    assert rows
    for r in rows:
        assert sum(r[f"c{j}"] for j in range(16)) == r["n_bytes"]


def test_decode_real_round_trips_forged_containers(spark):
    """The decoder reads back EXACTLY the geometry the forger encoded —
    over every doc in the smoke table, all three container types."""
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.multimodal import (
        attach_forged_media,
        decode_real,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    media = attach_forged_media(docs).collect()
    assert len(media) == docs.count()
    seen = set()
    for r in media:
        d = r["doc_id"]
        got = decode_real(bytes(r["media"]), r["media_type"])
        seen.add(r["media_type"])
        if r["media_type"] == "image":
            assert got == {
                "width": 4 + d % 29, "height": 3 + d % 17, "n_frames": 1
            }
        elif r["media_type"] == "audio":
            assert got["sample_rate"] == 8000 + (d % 8) * 1000
        else:
            assert got["n_frames"] == 1 + d % 4
            assert (got["width"], got["height"]) == (4 + d % 29, 3 + d % 17)
    assert seen == {"image", "audio", "video"}


def test_decode_real_rejects_garbage():
    import pytest

    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.multimodal import (
        decode_real,
    )

    for t in ("image", "audio", "video"):
        with pytest.raises(ValueError):
            decode_real(b"\x00" * 64, t)


def test_forged_bmp_is_spec_valid():
    """Byte-level BMP invariants a third-party viewer relies on: magic,
    pixel offset 54, declared file size == len, row padding to 4."""
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.multimodal import (
        _bmp_bytes,
    )

    for w, h, fill in ((5, 3, b"abcdef"), (4, 17, b""), (32, 1, b"\xff")):
        b = _bmp_bytes(w, h, fill)
        assert b[:2] == b"BM"
        assert int.from_bytes(b[2:6], "little") == len(b)
        assert int.from_bytes(b[10:14], "little") == 54
        rowsize = ((3 * w + 3) // 4) * 4
        assert len(b) == 54 + h * rowsize
        assert rowsize % 4 == 0


def test_forged_wav_is_spec_valid():
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.multimodal import (
        _wav_bytes,
        decode_real,
    )

    b = _wav_bytes(11000, b"abc")  # odd payload -> padded to 4
    assert int.from_bytes(b[4:8], "little") == len(b) - 8  # RIFF size
    got = decode_real(b, "audio")
    assert got == {"sample_rate": 11000, "n_samples": 2}


def test_resize_thumb_real_bmp_pixels(spark):
    """Pixel fidelity of the real nearest-neighbor kernel: a BMP whose
    left half is red and right half is blue must thumbnail to a left-
    red/right-blue 16x16 RGB block (top-down), not a byte subsample."""
    import numpy as np

    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.multimodal import (
        THUMB_H,
        THUMB_W,
        resize_thumb,
    )

    w, h = 32, 8
    rowsize = ((3 * w + 3) // 4) * 4
    import struct

    rows = b""
    for _ in range(h):
        row = b"\x00\x00\xff" * (w // 2) + b"\xff\x00\x00" * (w // 2)  # BGR!
        rows += row + b"\x00" * (rowsize - 3 * w)
    bmp = (
        struct.pack("<2sIHHI", b"BM", 54 + h * rowsize, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, h * rowsize,
                      2835, 2835, 0, 0)
        + rows
    )
    df = spark.createDataFrame(
        [(1, bytearray(bmp), "image")], "doc_id long, media binary, media_type string"
    )
    out = resize_thumb(df).collect()[0]
    arr = np.frombuffer(bytes(out["thumb"]), np.uint8).reshape(
        THUMB_H, THUMB_W, 3
    )
    assert arr.shape == (16, 16, 3)
    # left half BGR red (0,0,255), right half BGR blue (255,0,0)
    assert (arr[:, :8] == [0, 0, 255]).all()
    assert (arr[:, 8:] == [255, 0, 0]).all()


def test_bmp_forge_decode_fuzz():
    """Hypothesis: forge->decode round-trips any geometry; the thumb
    kernel's structural validator accepts every forged BMP."""
    from hypothesis import given, settings, strategies as st

    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.multimodal import (
        _bmp_bytes,
        decode_real,
    )

    @given(
        st.integers(1, 64), st.integers(1, 64),
        st.binary(min_size=0, max_size=64),
    )
    @settings(max_examples=100, deadline=None)
    def _roundtrip(w, h, fill):
        b = _bmp_bytes(w, h, fill)
        assert int.from_bytes(b[2:6], "little") == len(b)
        got = decode_real(b, "image")
        assert (got["width"], got["height"]) == (w, h)

    _roundtrip()


def test_forge_closure_matches_module_helpers(spark):
    """The mapInPandas forge closure inlines the BMP/WAV builders by
    value (cloudpickle self-containment); this pins the inlined copies
    BYTE-FOR-BYTE to the module-level _bmp_bytes/_wav_bytes the spec
    and fuzz tests exercise — a one-byte drift between the copies
    fails here, not silently in production."""
    import struct

    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.multimodal import (
        _bmp_bytes,
        _wav_bytes,
        attach_forged_media,
    )

    docs = spark.createDataFrame(
        [(d, f"payload-{d}" * (d % 5 + 1)) for d in range(12)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: bytes(r["media"]) for r in attach_forged_media(docs).collect()}
    for d in range(12):
        data = f"payload-{d}".encode() * (d % 5 + 1)
        w, h = 4 + d % 29, 3 + d % 17
        if d % 3 == 0:
            want = _bmp_bytes(w, h, data)
        elif d % 3 == 1:
            want = _wav_bytes(8000 + (d % 8) * 1000, data)
        else:
            f = 1 + d % 4
            want = b"VID0" + struct.pack("<II", f, 0) + _bmp_bytes(w, h, data) * f
        assert got[d] == want, d


def test_resize_thumb_pixfmt_contract(spark):
    """pixfmt names the per-row size contract: rgb24 rows are exactly
    3*tw*th bytes, bytes rows at most tw*th."""
    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.multimodal import (
        THUMB_H,
        THUMB_W,
        attach_forged_media,
        resize_thumb,
    )

    docs = spark.createDataFrame(
        [(d, "x" * 400) for d in range(9)], "doc_id long, text string"
    )
    rows = resize_thumb(attach_forged_media(docs)).collect()
    fmts = set()
    for r in rows:
        fmts.add(r["pixfmt"])
        if r["pixfmt"] == "rgb24":
            assert len(r["thumb"]) == 3 * THUMB_W * THUMB_H
            assert r["media_type"] in ("image", "video")
        else:
            assert len(r["thumb"]) <= THUMB_W * THUMB_H
            assert r["media_type"] == "audio"
    assert fmts == {"rgb24", "bytes"}


def test_wav_forge_decode_fuzz():
    """WAV twin of the BMP fuzz: any (rate, payload) round-trips, odd
    payloads pad to even, declared RIFF size always matches."""
    from hypothesis import given, settings, strategies as st

    from clickstream_pipeline_aws_kafka_docker_airflow__spark.operators.multimodal import (
        _wav_bytes,
        decode_real,
    )

    @given(st.integers(1, 192_000), st.binary(min_size=0, max_size=64))
    @settings(max_examples=100, deadline=None)
    def _roundtrip(rate, data):
        b = _wav_bytes(rate, data)
        assert int.from_bytes(b[4:8], "little") == len(b) - 8
        got = decode_real(b, "audio")
        assert got["sample_rate"] == rate
        assert got["n_samples"] == (len(data) + len(data) % 2) // 2

    _roundtrip()
