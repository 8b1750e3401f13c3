"""Multimodal column handling: opaque ``binary`` payloads + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The image/audio libraries are not available in this container, so the
actual pixel/sample decode is STUBBED: :func:`decode_real` raises
``NotImplementedError`` and :func:`_fake_decode_meta` derives
deterministic metadata from the payload bytes instead. Everything
Spark-side is real and load-bearing — binary column schema, Arrow batch
transfer, ``mapInPandas`` signature, per-batch vectorized work — which
is what matters at 100 TB: the decode kernel is swappable, the
distribution pattern is not.

No testdata table carries binary, so :func:`attach_fake_media` forges a
payload from ``documents.text`` (utf-8 bytes) — schema-identical to a
real media table ``(id, media: binary, media_type: string)``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_TYPES = ("image", "audio", "video")

MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, media binary, media_type) with the payload
    forged from the text bytes and a deterministic type assignment."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").cast(BinaryType()).alias("media"),
        F.element_at(
            F.array(*[F.lit(t) for t in MEDIA_TYPES]),
            (F.col("doc_id") % len(MEDIA_TYPES) + 1).cast("int"),
        ).alias("media_type"),
    )


def decode_real(payload: bytes, media_type: str):
    """The real decode kernel would go here (PIL/torchaudio/ffmpeg).
    Deliberately unimplemented in this environment."""
    raise NotImplementedError(
        "media decode requires image/audio libs not present in this container"
    )


def extract_media_meta(media: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over binary payloads.

    The iterator-of-batches shape is the 100 TB pattern: each pandas
    batch is one Arrow chunk, the decode loop is vectorized per batch,
    and nothing ever collects to the driver.
    """

    # NOTE: the closure must be self-contained. Calling a module-level
    # helper here would make cloudpickle serialize it BY REFERENCE to
    # this package, and executors that can't import the package would
    # fail with ModuleNotFoundError. Everything is inlined by value.
    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["media"].map(len).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n,
                    "width": (64 + (n % 577)).astype("int64"),
                    "height": (64 + (n * 31) % 391).astype("int64"),
                }
            )

    return media.mapInPandas(_extract, MEDIA_META_SCHEMA)


THUMB_W = 16
THUMB_H = 16

THUMB_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("t_width", LongType()),
        StructField("t_height", LongType()),
        StructField("thumb", BinaryType()),
    ]
)


def resize_thumb_stub(
    media: DataFrame, tw: int = THUMB_W, th: int = THUMB_H
) -> DataFrame:
    """Batched "resize" plumbing: every payload maps to a fixed-budget
    thumbnail of at most ``tw*th`` bytes (an evenly-strided byte
    subsample stands in for the pixel kernel). The contract a real
    resizer shares — bounded output size, binary-in/binary-out through
    Arrow, per-batch vectorized work, no driver round-trip — is what
    the test pins; the kernel body is the swappable part.
    """
    target = int(tw) * int(th)
    _tw, _th = int(tw), int(th)

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            thumbs = []
            for b in pdf["media"]:
                arr = np.frombuffer(b, dtype=np.uint8)
                if arr.size <= target:
                    thumbs.append(arr.tobytes())
                else:
                    idx = np.linspace(0, arr.size - 1, target).astype(np.int64)
                    thumbs.append(arr[idx].tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "t_width": pd.Series([_tw] * len(pdf), dtype="int64"),
                    "t_height": pd.Series([_th] * len(pdf), dtype="int64"),
                    "thumb": thumbs,
                }
            )

    return media.mapInPandas(_resize, THUMB_SCHEMA)


HIST_BUCKETS = 16

HIST_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("n_bytes", LongType())]
    + [StructField(f"c{j}", LongType()) for j in range(HIST_BUCKETS)]
)


def media_byte_histogram(media: DataFrame) -> DataFrame:
    """Feature extraction over binary payloads: a {HIST_BUCKETS}-bucket
    histogram of the high nibble of every byte — the deterministic
    stand-in for an embedding/featurizer kernel. All outputs are
    integers, so the Arrow binary->feature path is value-checkable
    against a DuckDB oracle (queries/multimodal_q.py), not just
    shape-checked.
    """

    def _hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["media"].map(len).astype("int64"),
            }
            counts = np.zeros((len(pdf), 16), dtype=np.int64)
            for i, b in enumerate(pdf["media"]):
                arr = np.frombuffer(b, dtype=np.uint8) >> 4
                counts[i] = np.bincount(arr, minlength=16)
            for j in range(16):
                rows[f"c{j}"] = counts[:, j]
            yield pd.DataFrame(rows)

    return media.mapInPandas(_hist, HIST_SCHEMA)


def frame_sample_stub(media: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled offset
    (posexplode over a computed offset array). The decode of each frame
    is the stubbed kernel; the row-explosion pattern — a few rows per
    asset, partition-parallel — is the real thing."""
    offsets = F.sequence(
        F.lit(0),
        F.greatest(F.length("media").cast("long") - 1, F.lit(0)),
        F.lit(every_n_bytes),
    )
    return media.select(
        "doc_id",
        "media_type",
        F.posexplode(offsets).alias("frame_idx", "byte_offset"),
    )
