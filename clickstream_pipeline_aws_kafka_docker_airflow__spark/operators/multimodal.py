"""Multimodal column handling: opaque ``binary`` payloads + typed
metadata, processed with Arrow-batched ``mapInPandas``.

Two payload paths:

* :func:`attach_forged_media` + :func:`extract_decoded_meta` — REAL
  containers and a REAL decoder. BMP and WAV are header+payload formats
  parseable with the stdlib, so no image/audio library is needed:
  :func:`decode_real` actually reads width/height/sample-rate/frame
  counts out of the bytes. The geometry is a deterministic function of
  (doc_id, text length), which gives the DuckDB oracle a closed form
  for every decoded field while Spark round-trips the actual bytes
  (queries/multimodal_q.py multimodal_meta).

* :func:`attach_fake_media` — the opaque-payload path (raw text bytes)
  kept for the byte-plumbing kernels (histogram, frame sampling,
  thumbnail subsample), whose oracles recompute over the text.

Heavier codecs (JPEG/MP4) still need external libs; they'd slot into
the same mapInPandas kernels — the Spark-side contract (binary column
schema, Arrow batch transfer, per-batch vectorized work, loud per-row
failure) is what matters at 100 TB and is what the tests pin.
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


# --- real, pure-stdlib container formats -----------------------------------
#
# The container has no PIL/torchaudio/ffmpeg, but BMP and WAV are
# header+payload formats parseable with int.from_bytes — so the decode
# step no longer needs a stub. attach_forged_media() writes VALID
# containers (a BMP viewer opens them) whose geometry derives
# deterministically from (doc_id, text): that gives the DuckDB oracle a
# closed form for every decoded field, while the Spark path round-trips
# through the actual bytes (forge -> parse). If either the forger or the
# parser mislays a single header byte, the oracle mismatches.
#
# Deterministic geometry (d = doc_id, L = byte length of text):
#   image (d%3==0): BMP 24bpp, w = 4 + d%29, h = 3 + d%17,
#                   rowsize = ((3w+3)//4)*4, n_bytes = 54 + h*rowsize
#   audio (d%3==1): WAV PCM16 mono, rate = 8000 + (d%8)*1000,
#                   data = text bytes padded to even, n_bytes = 44 + len
#   video (d%3==2): 'VID0' + n_frames u32le + reserved u32le, then
#                   f = 1 + d%4 identical BMP frames,
#                   n_bytes = 12 + f * bmp_size

def _bmp_bytes(w: int, h: int, fill) -> bytes:
    """A valid bottom-up 24bpp BMP; pixel block (padding included)
    tiled from ``fill`` bytes."""
    import struct

    import numpy as np

    rowsize = ((3 * w + 3) // 4) * 4
    arr = np.frombuffer(fill, dtype=np.uint8)
    if arr.size == 0:
        arr = np.zeros(1, dtype=np.uint8)
    pix = np.resize(arr, h * rowsize)
    return (
        struct.pack("<2sIHHI", b"BM", 54 + h * rowsize, 0, 0, 54)
        + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, h * rowsize, 2835, 2835, 0, 0
        )
        + pix.tobytes()
    )


def _wav_bytes(rate: int, data: bytes) -> bytes:
    """A valid PCM16 mono WAV around ``data`` (padded to even)."""
    import struct

    if len(data) % 2:
        data += b"\x00"
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_real(payload: bytes, media_type: str) -> dict:
    """Parse the real container headers (no image/audio libs needed).

    Returns the decoded fields per type: image -> width/height/n_frames,
    audio -> sample_rate/n_samples, video -> n_frames + first-frame
    width/height. Raises ValueError on a bad magic/structure — garbage
    in a 100 TB media crawl must fail loudly per-row, not silently."""
    u = lambda b: int.from_bytes(b, "little")  # noqa: E731

    def bmp_dims(b: bytes) -> tuple[int, int]:
        if b[:2] != b"BM" or u(b[14:18]) != 40:
            raise ValueError("not a BITMAPINFOHEADER BMP")
        return (
            int.from_bytes(b[18:22], "little", signed=True),
            int.from_bytes(b[22:26], "little", signed=True),
        )

    if media_type == "image":
        w, h = bmp_dims(payload)
        return {"width": w, "height": h, "n_frames": 1}
    if media_type == "audio":
        if payload[:4] != b"RIFF" or payload[8:16] != b"WAVEfmt ":
            raise ValueError("not a RIFF/WAVE file")
        channels, rate = u(payload[22:24]), u(payload[24:28])
        bits = u(payload[34:36])
        if payload[36:40] != b"data":
            raise ValueError("expected data chunk")
        n = u(payload[40:44]) // (channels * bits // 8)
        return {"sample_rate": rate, "n_samples": n}
    if media_type == "video":
        if payload[:4] != b"VID0":
            raise ValueError("not a VID0 container")
        w, h = bmp_dims(payload[12:])
        return {"n_frames": u(payload[4:8]), "width": w, "height": h}
    raise ValueError(f"unknown media_type {media_type!r}")


def attach_forged_media(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, media binary, media_type) where the payload
    is a VALID container (BMP / WAV / VID0+BMP frames) forged from the
    deterministic geometry above — numpy tiling inside mapInPandas, one
    Arrow batch at a time, no driver round-trip."""
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("media", BinaryType()),
            StructField("media_type", StringType()),
        ]
    )

    # self-contained closure (see NOTE above THUMB_W)
    def _forge(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        def bmp(w, h, fill):
            rowsize = ((3 * w + 3) // 4) * 4
            arr = np.frombuffer(fill, dtype=np.uint8)
            if arr.size == 0:
                arr = np.zeros(1, dtype=np.uint8)
            pix = np.resize(arr, h * rowsize)
            return (
                struct.pack("<2sIHHI", b"BM", 54 + h * rowsize, 0, 0, 54)
                + struct.pack(
                    "<IiiHHIIiiII",
                    40, w, h, 1, 24, 0, h * rowsize, 2835, 2835, 0, 0,
                )
                + pix.tobytes()
            )

        for pdf in batches:
            media, types = [], []
            for d, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                data = (text or "").encode("utf-8")
                w, h = 4 + d % 29, 3 + d % 17
                if d % 3 == 0:
                    media.append(bmp(w, h, data))
                    types.append("image")
                elif d % 3 == 1:
                    if len(data) % 2:
                        data += b"\x00"
                    rate = 8000 + (d % 8) * 1000
                    media.append(
                        b"RIFF"
                        + struct.pack("<I", 36 + len(data))
                        + b"WAVEfmt "
                        + struct.pack(
                            "<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16
                        )
                        + b"data"
                        + struct.pack("<I", len(data))
                        + data
                    )
                    types.append("audio")
                else:
                    f = 1 + d % 4
                    frame = bmp(w, h, data)
                    media.append(
                        b"VID0" + struct.pack("<II", f, 0) + frame * f
                    )
                    types.append("video")
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media": media, "media_type": types}
            )

    return docs.select("doc_id", "text").mapInPandas(_forge, out_schema)


DECODED_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_samples", LongType()),
        StructField("n_frames", LongType()),
    ]
)


def extract_decoded_meta(media: DataFrame) -> DataFrame:
    """REAL decode over the binary column: parse each payload's
    container header (BMP/WAV/VID0) inside mapInPandas and emit typed
    metadata; fields that don't apply to a type are NULL. The Arrow
    iterator-of-batches shape is the 100 TB pattern: each pandas batch
    is one Arrow chunk, nothing collects to the driver — and the
    kernel is a real parser, not a stand-in."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def u(b):
            return int.from_bytes(b, "little")

        for pdf in batches:
            rows = []
            for d, b, t in zip(pdf["doc_id"], pdf["media"], pdf["media_type"]):
                b = bytes(b)
                width = height = rate = n_samples = n_frames = None
                if t == "audio":
                    if b[:4] != b"RIFF" or b[8:16] != b"WAVEfmt ":
                        raise ValueError("not a RIFF/WAVE file")
                    ch, rate = u(b[22:24]), u(b[24:28])
                    bits = u(b[34:36])
                    n_samples = u(b[40:44]) // (ch * bits // 8)
                else:
                    off = 0
                    if t == "video":
                        if b[:4] != b"VID0":
                            raise ValueError("not a VID0 container")
                        n_frames = u(b[4:8])
                        off = 12
                    else:
                        n_frames = 1
                    hdr = b[off:]
                    if hdr[:2] != b"BM" or u(hdr[14:18]) != 40:
                        raise ValueError("not a BITMAPINFOHEADER BMP")
                    width = int.from_bytes(hdr[18:22], "little", signed=True)
                    height = int.from_bytes(hdr[22:26], "little", signed=True)
                rows.append(
                    (int(d), t, len(b), width, height, rate, n_samples, n_frames)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "media_type", "n_bytes", "width", "height",
                    "sample_rate", "n_samples", "n_frames",
                ],
            )

    return media.mapInPandas(_extract, DECODED_META_SCHEMA)


# NOTE on closures in this module: each mapInPandas closure must be
# self-contained. Calling a module-level helper from one would make
# cloudpickle serialize it BY REFERENCE to this package, and executors
# that can't import the package would fail with ModuleNotFoundError —
# so the forge/parse kernels inline their logic by value, and
# tests/test_multimodal.py pins the inlined copies byte-for-byte
# against the module-level _bmp_bytes/_wav_bytes helpers.

THUMB_W = 16
THUMB_H = 16

THUMB_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("t_width", LongType()),
        StructField("t_height", LongType()),
        StructField("pixfmt", StringType()),
        StructField("thumb", BinaryType()),
    ]
)


def resize_thumb(
    media: DataFrame, tw: int = THUMB_W, th: int = THUMB_H
) -> DataFrame:
    """Batched thumbnailing through Arrow, no driver round-trip.

    BMP payloads (magic ``BM``) get a REAL nearest-neighbor resize:
    parse the 24bpp pixel grid out of the container (bottom-up rows,
    4-byte padding), numpy fancy-index the sample grid, emit exactly
    ``3*tw*th`` bytes of top-down RGB. Non-BMP payloads (audio/opaque)
    fall back to the evenly-strided byte subsample — bounded output
    either way. ``pixfmt`` names the per-row contract a buffer-sizing
    consumer needs: ``rgb24`` thumbs are exactly ``3*tw*th`` bytes,
    ``bytes`` thumbs at most ``tw*th``. The contract the test pins —
    bounded size, binary-in/binary-out, per-batch vectorized work —
    plus pixel fidelity for the decodable type.
    """
    target = int(tw) * int(th)
    _tw, _th = int(tw), int(th)

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def u(b):
            return int.from_bytes(b, "little")

        def is_bmp(b: bytes) -> bool:
            """Structural check, not just magic: text bytes can start
            with 'BM' by accident — require a coherent 24bpp
            BITMAPINFOHEADER whose pixel block fits the payload."""
            if len(b) < 54 or b[:2] != b"BM" or u(b[14:18]) != 40:
                return False
            w = int.from_bytes(b[18:22], "little", signed=True)
            h = int.from_bytes(b[22:26], "little", signed=True)
            off = u(b[10:14])
            if w <= 0 or h <= 0 or u(b[28:30]) != 24 or off < 54:
                return False
            return off + h * (((3 * w + 3) // 4) * 4) <= len(b)

        def bmp_thumb(b: bytes) -> bytes:
            w = int.from_bytes(b[18:22], "little", signed=True)
            h = int.from_bytes(b[22:26], "little", signed=True)
            off, rowsize = u(b[10:14]), ((3 * w + 3) // 4) * 4
            pix = np.frombuffer(b, np.uint8, count=h * rowsize, offset=off)
            # bottom-up padded rows -> top-down (h, w, 3)
            img = pix.reshape(h, rowsize)[::-1, : 3 * w].reshape(h, w, 3)
            ys = (np.arange(_th) * h) // _th
            xs = (np.arange(_tw) * w) // _tw
            return img[np.ix_(ys, xs)].tobytes()

        for pdf in batches:
            thumbs, fmts = [], []
            for b in pdf["media"]:
                b = bytes(b)
                if is_bmp(b):
                    thumbs.append(bmp_thumb(b))
                    fmts.append("rgb24")
                elif b[:4] == b"VID0" and is_bmp(b[12:]):
                    thumbs.append(bmp_thumb(b[12:]))  # first frame
                    fmts.append("rgb24")
                else:
                    arr = np.frombuffer(b, dtype=np.uint8)
                    if arr.size <= target:
                        thumbs.append(arr.tobytes())
                    else:
                        idx = np.linspace(0, arr.size - 1, target).astype(
                            np.int64
                        )
                        thumbs.append(arr[idx].tobytes())
                    fmts.append("bytes")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "t_width": pd.Series([_tw] * len(pdf), dtype="int64"),
                    "t_height": pd.Series([_th] * len(pdf), dtype="int64"),
                    "pixfmt": fmts,
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
            # NULL payloads are filtered before this kernel (see the
            # .where below); a histogram of a missing asset is no rows,
            # not a zero row. Checked BEFORE the len() map (which would
            # raise a confusing TypeError on a NULL first) and with an
            # explicit raise, not assert, so `python -O` can't strip it.
            if pdf["media"].isna().any():
                raise ValueError(
                    "media_byte_histogram kernel received a NULL payload; "
                    "the JVM-side isNotNull filter must run first"
                )
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

    # NULL media (e.g. a document with NULL text upstream) contributes
    # no histogram row — filtered JVM-side so the pruned rows never
    # cross the Arrow boundary
    return media.where(F.col("media").isNotNull()).mapInPandas(
        _hist, HIST_SCHEMA
    )


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
