"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched UDF stages.

The DECODE step is feature-gated: ``decode_image`` uses PIL when
installed, and otherwise falls back to built-in pure-numpy decoders
for the self-describing uncompressed formats (24-bit BI_RGB BMP,
binary P6 / ascii P3 PPM) — so real image bytes ARE decoded even in a
container with no imaging libraries. Compressed formats (JPEG/PNG/...)
without PIL raise NotImplementedError rather than silently faking.
``_decode_image_fake`` (byte-histogram features) remains as the
deterministic stand-in used by the driver oracle, where results must
replay in DuckDB.
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


def _decode_bmp24(payload: bytes) -> np.ndarray:
    """Pure-numpy 24-bit uncompressed (BI_RGB) BMP decode: little-
    endian header, 4-byte-aligned row stride, bottom-up rows unless
    height is negative, BGR pixel order."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only 24-bit uncompressed BMP supported (bpp={bpp}, "
            f"compression={comp})")
    top_down = h < 0
    h = abs(h)
    stride = ((w * 3 + 3) // 4) * 4
    if off + stride * h > len(payload):
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def _decode_ppm(payload: bytes) -> np.ndarray:
    """Pure-numpy netpbm decode: binary P6 and ascii P3, '#' comments,
    maxval <= 255."""
    if payload[:2] not in (b"P6", b"P3"):
        raise ValueError("not a PPM payload")
    binary = payload[:2] == b"P6"
    # tokenize the header: magic, width, height, maxval ('#' to EOL is
    # a comment); in P6 pixel data starts after ONE whitespace byte
    # following maxval
    toks, i, n = [], 2, len(payload)
    while len(toks) < 3 and i < n:
        c = payload[i:i + 1]
        if c == b"#":
            while i < n and payload[i:i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not payload[j:j + 1].isspace():
                j += 1
            toks.append(int(payload[i:j]))
            i = j
    if len(toks) < 3:
        raise ValueError("truncated PPM header")
    w, h, maxval = toks
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    if binary:
        i += 1  # the single whitespace byte after maxval
        px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
    else:
        vals = payload[i:].split()
        if len(vals) < w * h * 3:
            raise ValueError("truncated P3 pixel data")
        px = np.array([int(v) for v in vals[: w * h * 3]], dtype=np.uint8)
    return px.reshape(h, w, 3).copy()


def decode_image(payload: bytes) -> np.ndarray:
    """Real image decode -> HxWx3 uint8 RGB. Uses PIL when installed
    (any format); otherwise built-in decoders handle uncompressed
    BMP/PPM. Compressed formats without an imaging library raise
    NotImplementedError."""
    try:
        import io

        from PIL import Image  # type: ignore[import-not-found]

        return np.asarray(
            Image.open(io.BytesIO(payload)).convert("RGB"), dtype=np.uint8)
    except ImportError:
        pass
    if payload[:2] == b"BM":
        return _decode_bmp24(payload)
    if payload[:2] in (b"P6", b"P3"):
        return _decode_ppm(payload)
    raise NotImplementedError(
        "compressed image decode requires an imaging library (PIL); "
        "built-in decoders cover uncompressed BMP/PPM only"
    )


def _decode_image_real(payload: bytes) -> np.ndarray:
    """Real-decode feature path: decode pixels (decode_image), then
    the same 16-bin L1-normalized histogram as the fake path — over
    DECODED PIXEL bytes, not raw payload bytes."""
    px = decode_image(payload).reshape(-1)
    if px.size == 0:
        return np.zeros(16, dtype=np.float32)
    hist, _ = np.histogram(px, bins=16, range=(0, 256))
    return (hist / px.size).astype(np.float32)


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
