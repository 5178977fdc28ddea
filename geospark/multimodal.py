"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched UDF stages.

The sandbox has no image/audio libraries, so the DECODE step is
stubbed (clearly marked below) behind ``_decode_image_real`` raising
NotImplementedError, with a deterministic fake
(``_decode_image_fake``: byte-histogram features) standing in. The
Spark-side plumbing — schema, batch shape, partitioning, UDF
signatures — is real and tested; swapping the stub for PIL/ffmpeg is a
one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "duration_ms int"
)
FEATURE_SCHEMA = "media_id long, kind string, n_bytes int, features array<float>"


def _decode_image_real(payload: bytes) -> np.ndarray:
    """STUB: real image decode needs PIL/opencv (absent in this
    container). Raise rather than silently fake in a 'real' path."""
    raise NotImplementedError(
        "image decode requires an imaging library; use decode_fake=True "
        "or plug a decoder in here"
    )


def _decode_image_fake(payload: bytes) -> np.ndarray:
    """Deterministic stand-in: 16-bin byte histogram, L1-normalized.
    Keeps the pipeline shape (binary -> float features) real."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(16, dtype=np.float32)
    hist, _ = np.histogram(arr, bins=16, range=(0, 256))
    return (hist / arr.size).astype(np.float32)


def extract_features(media: DataFrame, decode_fake: bool = True) -> DataFrame:
    """binary payload -> feature vector, batched via mapInArrow (one
    Arrow batch per ~10k rows crosses the JVM/Python boundary; the
    payload column is pruned from all downstream stages)."""
    decode = _decode_image_fake if decode_fake else _decode_image_real

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            tbl = pa.Table.from_batches([b])
            mids = tbl.column("media_id").to_pylist()
            kinds = tbl.column("kind").to_pylist()
            payloads = tbl.column("payload").to_pylist()
            feats = [decode(p if p is not None else b"") for p in payloads]
            yield pa.record_batch(
                [
                    pa.array(mids, pa.int64()),
                    pa.array(kinds, pa.string()),
                    pa.array([len(p) if p else 0 for p in payloads], pa.int32()),
                    pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
                ],
                names=["media_id", "kind", "n_bytes", "features"],
            )

    return media.select("media_id", "kind", "payload").mapInArrow(
        run, FEATURE_SCHEMA
    )


def resize_media(media: DataFrame, out_w: int = 4, out_h: int = 4) -> DataFrame:
    """'Resize' plumbing: block-mean pool the payload byte signal down
    to ``out_w * out_h`` values (stub for a real image resize — same
    signature, same batch shape; with a decoder plugged in the pooling
    runs on decoded pixel planes instead of raw bytes). Block b covers
    byte range [floor(b*n/k), floor((b+1)*n/k)) and its value is the
    INTEGER mean (sum DIV count) — deterministic, engine-replayable.
    Output: (media_id, kind, width, height, payload binary of k pooled
    bytes, blocks array<int> — the decoded view of the new payload —
    and n_bytes_in)."""
    k = int(out_w) * int(out_h)
    if k <= 0:
        raise ValueError("out_w * out_h must be positive")

    def pool(p: bytes) -> list[int]:
        n = len(p)
        if n == 0:
            return [0] * k
        arr = np.frombuffer(p, dtype=np.uint8).astype(np.int64)
        bounds = [(b * n) // k for b in range(k + 1)]
        return [
            int(arr[lo:hi].sum() // (hi - lo)) if hi > lo else 0
            for lo, hi in zip(bounds, bounds[1:])
        ]

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            tbl = pa.Table.from_batches([b])
            mids = tbl.column("media_id").to_pylist()
            kinds = tbl.column("kind").to_pylist()
            payloads = tbl.column("payload").to_pylist()
            blocks = [pool(p if p is not None else b"") for p in payloads]
            yield pa.record_batch(
                [
                    pa.array(mids, pa.int64()),
                    pa.array(kinds, pa.string()),
                    pa.array([out_w] * len(mids), pa.int32()),
                    pa.array([out_h] * len(mids), pa.int32()),
                    pa.array([bytes(bl) for bl in blocks], pa.binary()),
                    pa.array(blocks, pa.list_(pa.int32())),
                    pa.array([len(p) if p else 0 for p in payloads],
                             pa.int32()),
                ],
                names=["media_id", "kind", "width", "height", "payload",
                       "blocks", "n_bytes_in"],
            )

    return media.select("media_id", "kind", "payload").mapInArrow(
        run,
        "media_id long, kind string, width int, height int, "
        "payload binary, blocks array<int>, n_bytes_in int",
    )


def frame_sample(media: DataFrame, every_n_bytes: int = 1024,
                 max_frames: int = 8) -> DataFrame:
    """'Video' frame sampling plumbing: slice the payload into frame
    chunks (stub for keyframe extraction), one output row per frame.
    Output: (media_id, frame_idx, frame_bytes)."""

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            tbl = pa.Table.from_batches([b])
            mids = tbl.column("media_id").to_pylist()
            payloads = tbl.column("payload").to_pylist()
            out_mid, out_idx, out_frame = [], [], []
            for mid, p in zip(mids, payloads):
                if p is None:
                    continue
                for i in range(min(max_frames, (len(p) + every_n_bytes - 1) // every_n_bytes)):
                    out_mid.append(mid)
                    out_idx.append(i)
                    out_frame.append(p[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pa.record_batch(
                [
                    pa.array(out_mid, pa.int64()),
                    pa.array(out_idx, pa.int32()),
                    pa.array(out_frame, pa.binary()),
                ],
                names=["media_id", "frame_idx", "frame_bytes"],
            )

    return media.select("media_id", "payload").mapInArrow(
        run, "media_id long, frame_idx int, frame_bytes binary"
    )


def synth_media(spark, n: int, partitions: int | None = None) -> DataFrame:
    """Deterministic fake media table (payload = hashed bytes) for
    tests/bench — same splitmix64 discipline as pages synthesis."""
    from geospark.pages import _splitmix64

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        kinds = ["image", "audio", "video"]
        for b in batches:
            ids = b.column(0).to_numpy().astype(np.uint64)
            payloads = []
            for i in ids:
                h = _splitmix64(np.arange(i, i + 64, dtype=np.uint64))
                payloads.append(h.tobytes())
            yield pa.record_batch(
                [
                    pa.array(ids.astype(np.int64), pa.int64()),
                    pa.array([kinds[int(i) % 3] for i in ids], pa.string()),
                    pa.array(payloads, pa.binary()),
                    pa.array([64 + int(i) % 128 for i in ids], pa.int32()),
                    pa.array([64 + int(i) % 64 for i in ids], pa.int32()),
                    pa.array([1000 * (1 + int(i) % 30) for i in ids], pa.int32()),
                ],
                names=["media_id", "kind", "payload", "width", "height", "duration_ms"],
            )

    rng = spark.range(0, n, numPartitions=partitions) if partitions else spark.range(n)
    return rng.mapInArrow(gen, MEDIA_SCHEMA)
