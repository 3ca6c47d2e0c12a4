"""Multimodal (image/audio/video) columns: opaque binary + typed metadata.

The lake treats media as ``binary`` content plus a typed metadata struct
(`MEDIA_META`), exactly like a 100 TB training-data pipeline would:
blobs never enter JVM expression evaluation; every decode / resize /
frame-sample / feature step is an Arrow-batched ``mapInPandas`` pass so
bytes move Python-side once per stage and memory is bounded by the Arrow
batch size (see ``media_batch_conf``), not the partition size.

Decoders: the real image/audio libraries are NOT installed in this
environment, so the pixel/sample decode is stubbed two ways:
  * ``codec="raw"`` — a deterministic fake container (12-byte header:
    magic ``MMRW``, uint16 width/height/channels/frames, then packed
    frame bytes). Tests synthesize it; every downstream shape/byte is
    exactly checkable.
  * ``codec="real"`` — raises ``NotImplementedError`` unless PIL is
    importable (clearly-marked stub; the mapInPandas plumbing around it
    is identical, so swapping in a real decoder changes one function).

Row-count contracts (what the tests pin):
  decode_media:   1 row in → 1 row out  (adds meta, drops nothing)
  resize_images:  1 row in → 1 row out  (content rewritten, w×h×c bytes)
  sample_frames:  1 row in → ceil(frames/every_n) rows out (explode)
  media_features: 1 row in → 1 row out  (adds array<float> embedding)
"""

from __future__ import annotations

import hashlib
import math
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"MMRW"
HEADER_FMT = "<4sHHHH"  # magic, width, height, channels, frames
HEADER_SIZE = struct.calcsize(HEADER_FMT)

MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)


def media_batch_conf(spark, max_records_per_batch: int = 64) -> None:
    """Bound Arrow batch row-count so big blobs can't blow executor RAM.

    64 rows × ~16 MB blob ≈ 1 GB peak per batch — tune per corpus. This
    is THE scale knob for binary columns: partition size stays large
    (good for scan throughput), batch size stays small (good for Python
    heap).
    """
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(max_records_per_batch)
    )


# ------------------------------------------------------------------ encode


def encode_raw(width: int, height: int, channels: int = 3, frames: int = 1, seed: int = 0) -> bytes:
    """Build a deterministic fake 'raw' container (test/codec fixture).

    Frame bytes are a repeating digest stream seeded by (seed, frame) —
    stable across processes, no RNG state.
    """
    body = bytearray()
    frame_len = width * height * channels
    for f in range(frames):
        chunk = b""
        i = 0
        while len(chunk) < frame_len:
            chunk += hashlib.blake2b(
                f"{seed}:{f}:{i}".encode(), digest_size=32
            ).digest()
            i += 1
        body += chunk[:frame_len]
    return struct.pack(HEADER_FMT, MAGIC, width, height, channels, frames) + bytes(body)


def _decode_header(blob: bytes) -> tuple[int, int, int, int]:
    magic, w, h, c, fr = struct.unpack_from(HEADER_FMT, blob, 0)
    if magic != MAGIC:
        raise ValueError("not an MMRW container")
    return w, h, c, fr


def _decode_real(blob: bytes):
    """Real-codec decode — stub: the image/audio libs aren't installed."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env has no PIL
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg, absent in this "
            "environment; use codec='raw' (deterministic fake container)"
        ) from exc
    raise NotImplementedError("real codec path not wired yet")


# ------------------------------------------------------------------ decode


def decode_media(df: DataFrame, codec: str = "raw") -> DataFrame:
    """Attach the typed ``meta`` struct by decoding each blob's header.

    1 row → 1 row; only the header is parsed (cheap), bytes stay opaque.
    """
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != "meta"]
        + [T.StructField("meta", MEDIA_META)]
    )
    cols = [f.name for f in out_schema.fields if f.name != "meta"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for blob in pdf["content"]:
                if codec != "raw":
                    _decode_real(bytes(blob))
                w, h, c, fr = _decode_header(bytes(blob))
                metas.append(
                    {
                        "mime": "application/x-mmrw",
                        "width": w,
                        "height": h,
                        "channels": c,
                        "n_frames": fr,
                        "n_bytes": len(blob),
                    }
                )
            out = pdf[cols].copy()
            out["meta"] = metas
            yield out

    return df.mapInPandas(run, out_schema)


def resize_images(df: DataFrame, out_w: int, out_h: int, codec: str = "raw") -> DataFrame:
    """Nearest-neighbor resize of every frame; content is rewritten.

    1 row → 1 row; output blob is a valid container with the new dims
    (w×h×c bytes per frame — byte-exact, tested). Pure-Python nearest
    neighbor on the fake codec; a real pipeline drops PIL/cv2 into the
    same loop body.
    """
    schema = df.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_blobs = []
            for blob in pdf["content"]:
                blob = bytes(blob)
                if codec != "raw":
                    _decode_real(blob)
                w, h, c, fr = _decode_header(blob)
                frame_len = w * h * c
                body = memoryview(blob)[HEADER_SIZE :]
                new = bytearray()
                for f in range(fr):
                    frame = body[f * frame_len : (f + 1) * frame_len]
                    for y in range(out_h):
                        sy = min(int(y * h / out_h), h - 1)
                        for x in range(out_w):
                            sx = min(int(x * w / out_w), w - 1)
                            off = (sy * w + sx) * c
                            new += frame[off : off + c]
                out_blobs.append(
                    struct.pack(HEADER_FMT, MAGIC, out_w, out_h, c, fr) + bytes(new)
                )
            out = pdf.copy()
            out["content"] = out_blobs
            if "meta" in out.columns:
                out["meta"] = [
                    {**(m or {}), "width": out_w, "height": out_h,
                     "n_bytes": len(b)}
                    for m, b in zip(out["meta"], out_blobs)
                ]
            yield out

    return df.mapInPandas(run, schema)


def sample_frames(df: DataFrame, every_n: int, codec: str = "raw") -> DataFrame:
    """Explode video containers into single-frame rows (every Nth frame).

    1 row → ceil(n_frames / every_n) rows: (media_id, frame_index,
    frame) — the shape a frame-level feature extractor consumes. Output
    frames are single-frame containers (headers preserved).
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_index", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(blob)
                if codec != "raw":
                    _decode_real(blob)
                w, h, c, fr = _decode_header(blob)
                frame_len = w * h * c
                body = memoryview(blob)[HEADER_SIZE :]
                for f in range(0, fr, every_n):
                    ids.append(mid)
                    idxs.append(f)
                    frames.append(
                        struct.pack(HEADER_FMT, MAGIC, w, h, c, 1)
                        + bytes(body[f * frame_len : (f + 1) * frame_len])
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": idxs, "frame": frames}
            )

    return df.mapInPandas(run, out_schema)


def media_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic fake feature vector per blob (stands in for a model).

    1 row → 1 row, adds ``embedding array<float>``: unit-normalized
    floats derived from a blake2b digest of the content — stable, no
    model weights needed, and downstream ANN operators consume it
    unchanged (same array<float> contract as the embeddings table).
    """
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("embedding", T.ArrayType(T.FloatType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = []
            for blob in pdf["content"]:
                dg = hashlib.blake2b(bytes(blob), digest_size=2 * dim).digest()
                vals = [
                    int.from_bytes(dg[2 * i : 2 * i + 2], "little") / 65535.0 - 0.5
                    for i in range(dim)
                ]
                nrm = math.sqrt(sum(v * v for v in vals)) or 1.0
                embs.append([v / nrm for v in vals])
            out = pdf.copy()
            out["embedding"] = embs
            yield out

    return df.mapInPandas(run, out_schema)


def synth_media_table(spark, n: int = 8, frames: int = 4) -> DataFrame:
    """Deterministic in-test media table (the container libs are absent,
    so tests synthesize blobs instead of reading real media files)."""
    rows = [
        (i, encode_raw(width=8 + i % 3, height=6 + i % 2, channels=3,
                       frames=1 + (i % frames), seed=i), None)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(4, "media_id")
