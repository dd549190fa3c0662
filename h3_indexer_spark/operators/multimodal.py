"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery — schemas, batch iteration, partition-size
control, UDF signatures — is real and tested; the actual media codecs
are NOT available in this environment, so the decode kernels are
deterministic fakes behind ``_HAVE_CODECS`` (clearly marked; swap in
PIL/torchaudio/decord in a real deployment without touching the plan
shapes).

Design for 100 TB of media:
- binary payloads ride in their own column so column pruning keeps
  metadata-only queries from ever reading the bytes;
- ``mapInPandas`` with small Arrow batches (payloads are fat — cap
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` well below the
  default for media tables);
- feature extraction emits fixed-size float arrays, so downstream
  similarity search (operators/similarity.py) composes directly.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HAVE_CODECS = False  # no PIL/libav in this environment
try:  # pragma: no cover - environment probe
    from PIL import Image  # type: ignore  # noqa: F401

    _HAVE_CODECS = True
except ImportError:
    pass


IMAGE_META_SCHEMA = (
    "media_id long, width int, height int, channels int, format string"
)
EMBED_SCHEMA = "media_id long, feature array<float>"
FRAME_SCHEMA = "media_id long, frame_no int, frame_bytes binary"


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for an image decode: derives a stable
    8x8x3 uint8 array from the payload digest. NOT a real codec —
    replace with PIL when available."""
    digest = hashlib.sha256(payload).digest()
    arr = np.frombuffer((digest * 6)[:192], dtype=np.uint8)
    return arr.reshape(8, 8, 3)


def decode_metadata(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Extract typed metadata per media row. Real codec path raises
    NotImplementedError until codecs are installed; the fake path keeps
    the plumbing testable end-to-end."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, cs, fmts = [], [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                if _HAVE_CODECS:  # pragma: no cover
                    raise NotImplementedError(
                        "real codec path: decode via PIL here"
                    )
                img = _fake_decode(bytes(payload))
                ids.append(mid)
                hs.append(img.shape[0])
                ws.append(img.shape[1])
                cs.append(img.shape[2])
                fmts.append("fake/raw")
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "channels": pd.Series(cs, dtype="int32"),
                    "format": pd.Series(fmts, dtype="object"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        fn, schema=IMAGE_META_SCHEMA
    )


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    dim: int = 64,
) -> DataFrame:
    """Fixed-size float feature vector per media row (composes with
    similarity search). Fake path: normalized byte histogram."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                img = _fake_decode(bytes(payload))
                hist, _ = np.histogram(img, bins=dim, range=(0, 255))
                v = hist.astype(np.float32)
                norm = float(np.linalg.norm(v)) or 1.0
                ids.append(mid)
                feats.append((v / norm).tolist())
            yield pd.DataFrame({id_col: ids, "feature": feats})

    return df.select(id_col, payload_col).mapInPandas(fn, schema=EMBED_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, width int, height int, channels int, pixels binary"
)


def resize_images(
    df: DataFrame,
    target_w: int = 4,
    target_h: int = 4,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Resize every image to (target_w, target_h) and emit the raw
    pixel buffer. The resize itself is real (vectorized nearest-neighbor
    index sampling — the same math at any source resolution); only the
    decode behind it is the deterministic fake."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                img = _fake_decode(bytes(payload))
                src_h, src_w = img.shape[0], img.shape[1]
                ys = (np.arange(target_h) * src_h) // target_h
                xs = (np.arange(target_w) * src_w) // target_w
                resized = img[np.ix_(ys, xs)]
                ids.append(mid)
                blobs.append(resized.tobytes())
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "width": pd.Series(
                        [target_w] * len(ids), dtype="int32"
                    ),
                    "height": pd.Series(
                        [target_h] * len(ids), dtype="int32"
                    ),
                    "channels": pd.Series([3] * len(ids), dtype="int32"),
                    "pixels": pd.Series(blobs, dtype="object"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        fn, schema=RESIZED_SCHEMA
    )


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    every_n: int = 10,
    max_frames: int = 4,
) -> DataFrame:
    """Frame sampling for video payloads: emits (media_id, frame_no,
    frame_bytes) rows. Fake path treats the payload as a concatenation
    of fixed 1 KiB 'frames'."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        frame_size = 1024
        for pdf in batches:
            ids, nos, blobs = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                raw = bytes(payload)
                n_frames = max(1, len(raw) // frame_size)
                taken = 0
                for fno in range(0, n_frames, every_n):
                    if taken >= max_frames:
                        break
                    ids.append(mid)
                    nos.append(fno)
                    blobs.append(raw[fno * frame_size : (fno + 1) * frame_size])
                    taken += 1
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_no": pd.Series(nos, dtype="int32"),
                    "frame_bytes": pd.Series(blobs, dtype="object"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(fn, schema=FRAME_SCHEMA)


def synthesize_media_table(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table for tests: binary payloads with
    metadata columns, the schema a real ingest would produce."""
    rows = []
    for i in range(n):
        payload = struct.pack("<q", i) * (64 + (i % 17) * 32)
        rows.append((i, bytearray(payload), "image/fake", len(payload)))
    return spark.createDataFrame(
        rows, "media_id long, payload binary, mime string, n_bytes long"
    )
