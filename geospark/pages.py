"""Deterministic synthesis of the Common-Crawl-style ``pages`` table.

The engine's input (BASELINE.json input_hint) is an Iceberg/parquet
table ``pages(url string, warc_ts timestamp, html binary, text string,
lang string)``. No external data exists in the sandbox, so this module
synthesizes it **deterministically and distributedly**: generation runs
as ``mapInArrow`` over ``spark.range(n)`` so a 10^12-row synthesis is
just a bigger range — no driver-side materialization, no seed-order
dependence (every value is a pure function of the page id via a
splitmix64-style integer hash, stable under any partitioning).

City skew: page coordinates are drawn from a Zipf-ish distribution
over ~512 synthetic "cities" (a handful of hot cells) to exercise the
salting / AQE-skew machinery the north rule demands.

The ``text`` column embeds geo-entity mentions in a fixed format
(``coord: %.6f, %.6f``); `geospark.extract` parses them back out.
The pair (this generator, that extractor) plays the role of the
reference extractor for the byte-identical-text-per-url invariant.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

_LANGS = np.array(["en", "de", "fr", "es", "it", "pt", "nl", "pl"])
_N_CITIES = 512
_WARC_EPOCH_S = 1735689600  # 2025-01-01T00:00:00Z


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Stateless 64-bit mix (public splitmix64 constants)."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _u01(h: np.ndarray) -> np.ndarray:
    """uint64 hash -> uniform double in [0, 1)."""
    return (h >> np.uint64(11)).astype(np.float64) * (1.0 / (1 << 53))


def _city_centers() -> tuple[np.ndarray, np.ndarray]:
    """Deterministic city centers: lat in [-60, 70], lng in [-180, 180)."""
    ids = np.arange(_N_CITIES, dtype=np.uint64)
    lat = _u01(_splitmix64(ids * np.uint64(3) + np.uint64(1))) * 130.0 - 60.0
    lng = _u01(_splitmix64(ids * np.uint64(3) + np.uint64(2))) * 360.0 - 180.0
    return lat, lng


_CITY_LAT, _CITY_LNG = _city_centers()


def _zipf_city(h: np.ndarray) -> np.ndarray:
    """Map a hash to a city index with a Zipf-ish (s≈1) skew.

    City rank r is chosen so that P(r) ∝ 1/(r+1): invert the CDF of the
    harmonic distribution via u -> exp(u * ln(N)) - 1.
    """
    u = _u01(h)
    r = np.exp(u * np.log(float(_N_CITIES))) - 1.0
    return np.clip(r.astype(np.int64), 0, _N_CITIES - 1)


def synth_pages_batch(ids: np.ndarray) -> pa.RecordBatch:
    """Pure function page-id array -> Arrow batch of pages rows."""
    ids = ids.astype(np.uint64)
    n = ids.size
    h_base = _splitmix64(ids)
    n_points = (_splitmix64(ids + np.uint64(11)) % np.uint64(4)).astype(np.int64)

    # per-page point coordinates (up to 3), city-skewed with jitter
    texts: list[str] = []
    max_pts = 3
    pt_lat = np.zeros((n, max_pts))
    pt_lng = np.zeros((n, max_pts))
    for j in range(max_pts):
        hj = _splitmix64(ids * np.uint64(7) + np.uint64(100 + j))
        city = _zipf_city(hj)
        jit_lat = (_u01(_splitmix64(hj + np.uint64(1))) - 0.5) * 0.2
        jit_lng = (_u01(_splitmix64(hj + np.uint64(2))) - 0.5) * 0.2
        pt_lat[:, j] = np.clip(_CITY_LAT[city] + jit_lat, -85.0, 85.0)
        pt_lng[:, j] = _CITY_LNG[city] + jit_lng
        pt_lng[:, j] = np.where(pt_lng[:, j] >= 180.0, pt_lng[:, j] - 360.0, pt_lng[:, j])
        pt_lng[:, j] = np.where(pt_lng[:, j] < -180.0, pt_lng[:, j] + 360.0, pt_lng[:, j])

    langs = _LANGS[(h_base % np.uint64(len(_LANGS))).astype(np.int64)]
    ts = (_WARC_EPOCH_S + (h_base % np.uint64(86400 * 30)).astype(np.int64)).astype(
        "datetime64[s]"
    )

    urls = [f"https://site{int(i) % 1000}.example.com/page/{int(i)}" for i in ids]
    for r in range(n):
        k = int(n_points[r])
        parts = [f"Synthetic page {int(ids[r])} lang={langs[r]}."]
        for j in range(k):
            parts.append(f"coord: {pt_lat[r, j]:.6f}, {pt_lng[r, j]:.6f}")
        parts.append("End of document.")
        texts.append(" ".join(parts))

    htmls = [
        b"<html><head><title>p</title></head><body><p>" + t.encode("utf-8")
        + b"</p></body></html>"
        for t in texts
    ]
    return pa.record_batch(
        [
            pa.array(urls, pa.string()),
            pa.array(ts, pa.timestamp("us")),
            pa.array(htmls, pa.binary()),
            pa.array(texts, pa.string()),
            pa.array(langs, pa.string()),
        ],
        names=["url", "warc_ts", "html", "text", "lang"],
    )


def synth_pages(spark: SparkSession, n_pages: int, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic pages table.

    Scales to any ``n_pages``: generation is embarrassingly parallel
    over ``spark.range`` partitions; no shuffle, no driver data.
    """

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ids = b.column(0).to_numpy()
            yield synth_pages_batch(ids)

    rng = spark.range(0, n_pages, numPartitions=partitions) if partitions else spark.range(n_pages)
    return rng.mapInArrow(gen, PAGES_SCHEMA)


def synth_documents_batch(ids: np.ndarray, n_docs: int, n_tokens: int = 40,
                          vocab: int = 50_000,
                          dup_frac: float = 0.15) -> pa.RecordBatch:
    """Pure function doc-id array -> (doc_id, text) batch with
    CONTROLLED duplicate structure for dedup benchmarks:

    - the first ``n_docs//20`` ids are canonical source docs;
    - each other id is, with probability ``dup_frac``, a mutation of a
      random source (0..3 token substitutions: 0 = exact duplicate,
      1-3 = near-duplicate at known token distance);
    - everything else is an independent random token sequence.

    Token sequences are splitmix64-driven — stable under any
    partitioning, so candidate/recall numbers are reproducible."""
    ids = ids.astype(np.uint64)
    n = ids.size
    n_src = max(n_docs // 20, 1)
    u_dup = _u01(_splitmix64(ids * np.uint64(13) + np.uint64(5)))
    src = _splitmix64(ids * np.uint64(13) + np.uint64(6)) % np.uint64(n_src)
    is_dup = (u_dup < dup_frac) & (ids >= np.uint64(n_src))
    base = np.where(is_dup, src, ids).astype(np.uint64)
    n_mut = np.where(
        is_dup,
        (_splitmix64(ids * np.uint64(13) + np.uint64(7)) % np.uint64(4)).astype(np.int64),
        0,
    )

    toks = np.empty((n, n_tokens), dtype=np.uint64)
    for j in range(n_tokens):
        toks[:, j] = _splitmix64(
            base * np.uint64(1009) + np.uint64(j)
        ) % np.uint64(vocab)
    max_mut = 3
    for k in range(max_mut):
        pos = (_splitmix64(ids * np.uint64(31) + np.uint64(200 + k))
               % np.uint64(n_tokens)).astype(np.int64)
        sub = _splitmix64(ids * np.uint64(31) + np.uint64(300 + k)) % np.uint64(vocab)
        m = n_mut > k
        toks[m, pos[m]] = sub[m]

    texts = [" ".join(f"t{int(t):05d}" for t in row) for row in toks]
    return pa.record_batch(
        [pa.array(ids.astype(np.int64), pa.int64()), pa.array(texts, pa.string())],
        names=["doc_id", "text"],
    )


def synth_documents(spark: SparkSession, n_docs: int, n_tokens: int = 40,
                    vocab: int = 50_000, dup_frac: float = 0.15,
                    partitions: int | None = None) -> DataFrame:
    """Distributed deterministic documents table for dedup stress —
    same embarrassingly-parallel shape as :func:`synth_pages`."""

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            yield synth_documents_batch(
                b.column(0).to_numpy(), n_docs, n_tokens, vocab, dup_frac
            )

    rng = (spark.range(0, n_docs, numPartitions=partitions)
           if partitions else spark.range(n_docs))
    return rng.mapInArrow(gen, "doc_id long, text string")


def _gauss_mat(seed_ids: np.ndarray, dim: int, stream: int) -> np.ndarray:
    """Deterministic (n, dim) standard-normal matrix: Box-Muller over
    two splitmix64 streams keyed on (seed id, dimension, stream)."""
    j = np.arange(dim, dtype=np.uint64)
    base = seed_ids[:, None] * np.uint64(1013) + j[None, :] * np.uint64(7919)
    h1 = _splitmix64(base + np.uint64(1_000_003 * (stream + 1)))
    h2 = _splitmix64(base + np.uint64(2_000_033 * (stream + 1)))
    u1 = np.maximum(_u01(h1), 1e-12)
    u2 = _u01(h2)
    return np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)


def synth_embeddings_batch(ids: np.ndarray, n_vecs: int, dim: int = 64,
                           dup_frac: float = 0.15,
                           min_cos: float = 0.90) -> pa.RecordBatch:
    """Pure function vec-id array -> (vec_id, embedding, src_id,
    is_dup) batch with PLANTED near-duplicate structure for ANN/dedup
    benchmarks (the embedding twin of :func:`synth_documents_batch`):

    - the first ``n_vecs//20`` ids are canonical source vectors
      (iid unit gaussians, normalized);
    - each other id is, with probability ``dup_frac``, a spherical
      perturbation of a random source at angle theta with cos(theta)
      uniform in [min_cos, 1] — the PLANTED pair (src_id, vec_id) has
      a known cosine, so measured recall is interpretable;
    - everything else is an independent random unit vector.

    All values derive from splitmix64 hashes of the id — stable under
    any partitioning, reproducible across runs."""
    ids = ids.astype(np.uint64)
    n = ids.size
    n_src = max(n_vecs // 20, 1)
    u_dup = _u01(_splitmix64(ids * np.uint64(7) + np.uint64(11)))
    src = _splitmix64(ids * np.uint64(7) + np.uint64(12)) % np.uint64(n_src)
    is_dup = (u_dup < dup_frac) & (ids >= np.uint64(n_src))
    base = np.where(is_dup, src, ids).astype(np.uint64)

    v = _gauss_mat(base, dim, stream=0)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    # perturbation direction: own-id gaussian orthogonalized against v
    g = _gauss_mat(ids + np.uint64(0xABCD_1234), dim, stream=1)
    g -= (g * v).sum(axis=1, keepdims=True) * v
    g /= np.maximum(np.linalg.norm(g, axis=1, keepdims=True), 1e-30)
    cos_t = (min_cos
             + (1.0 - min_cos) * _u01(_splitmix64(ids * np.uint64(7)
                                                  + np.uint64(13))))
    sin_t = np.sqrt(np.maximum(1.0 - cos_t * cos_t, 0.0))
    out = np.where(is_dup[:, None], v * cos_t[:, None] + g * sin_t[:, None], v)
    out = out.astype(np.float32)

    flat = pa.array(out.reshape(-1), pa.float32())
    emb = pa.FixedSizeListArray.from_arrays(flat, dim).cast(
        pa.list_(pa.float32())
    )
    return pa.record_batch(
        [
            pa.array(ids.astype(np.int64), pa.int64()),
            emb,
            pa.array(np.where(is_dup, src, ids).astype(np.int64), pa.int64()),
            pa.array(is_dup),
        ],
        names=["vec_id", "embedding", "src_id", "is_dup"],
    )


def synth_embeddings(spark: SparkSession, n_vecs: int, dim: int = 64,
                     dup_frac: float = 0.15, min_cos: float = 0.90,
                     partitions: int | None = None) -> DataFrame:
    """Distributed deterministic embeddings table with planted
    near-dups — same embarrassingly-parallel mapInArrow shape as
    :func:`synth_pages`."""

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            yield synth_embeddings_batch(
                b.column(0).to_numpy(), n_vecs, dim, dup_frac, min_cos
            )

    rng = (spark.range(0, n_vecs, numPartitions=partitions)
           if partitions else spark.range(n_vecs))
    return rng.mapInArrow(
        gen, "vec_id long, embedding array<float>, src_id long, is_dup boolean"
    )


def extract_text_from_html(html: bytes) -> bytes:
    """The 'reference extractor': deterministic text from html bytes.

    Byte-identical per url by construction (pure function of the
    page's html). Mirrors what a production pipeline would do with a
    real HTML parser; here the synthetic html wraps text in one <p>.
    """
    start = html.find(b"<p>")
    end = html.rfind(b"</p>")
    if start == -1 or end == -1:
        return b""
    return html[start + 3 : end]
