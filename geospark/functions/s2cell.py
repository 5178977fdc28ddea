"""S2-style hierarchical cell index — vectorized numpy kernels.

The north-star pipeline encodes page geo-entities "to H3/S2 cells and
webmercator tile keys in batched pandas UDFs". The engine's primary
index is the webmercator quadkey cell (cells.py); this module adds the
S2 side: the public S2 cell-id scheme (cube-face decomposition +
quadratic face projection + Hilbert space-filling curve, 64-bit ids,
levels 0-30) implemented from scratch as numpy kernels wrapped in
Arrow-batched pandas UDFs.

Everything here follows the *published* S2 spec (the s2geometry.io
cell-hierarchy devguide and the open-source s2geometry `s2coords.h` /
`s2cell_id.cc` documentation): face layout, the u->s quadratic
transform, the four Hilbert orientation tables, and the id bit layout

    id = face(3 bits) . hilbert_position(2*level bits) . 1 . 0...0

are spec constants, not copied code. A second, independently written
scalar implementation lives in goldens.s2_cell_id_scalar and generates
the driver-oracle VALUES; tests cross-check the two on random points.

Why S2 (and not an H3 port as well): both are hierarchical cell
indexes; S2's defining property — every cell's descendants form ONE
contiguous id range [range_min, range_max] — is the one that matters
for Spark plans, because containment becomes a broadcastable range
join (no cover explosion, no hash shuffle) and sort-by-id gives
spatially clustered parquet files at any level simultaneously. H3's
hex cells do not nest exactly (aperture-7 children overlap parent
boundaries), so "H3-style" containment would still need the
cover-and-refine machinery the quadkey index already provides.

Signed-ness note: Spark has no uint64, so ids are reinterpreted as
int64 (two's complement bit pattern preserved). Faces 4-5 (ids with
bit 63 set) become negative; *within one face* signed order equals
unsigned order, and every [range_min, range_max] containment interval
lies within one face, so BETWEEN range joins are exact. Only global
cross-face ORDER BY differs from unsigned order (documented; sort by
``(id >> 61) & 7`` then id if face-major order is needed).
"""
from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_LIMIT = 1 << MAX_LEVEL

# Hilbert orientation tables (spec constants; orientation bits:
# swap=1, invert=2). IJ_TO_POS[orient][i*2+j] = child position on the
# curve; POS_TO_ORIENTATION[pos] = orientation delta for that child.
_IJ_TO_POS = np.array(
    [[0, 1, 3, 2],   # canonical
     [0, 3, 1, 2],   # swap
     [2, 3, 1, 0],   # invert
     [2, 1, 3, 0]],  # swap|invert
    dtype=np.uint64,
)
_POS_TO_ORIENT = np.array([1, 0, 0, 3], dtype=np.uint64)


def _xyz(lat: np.ndarray, lng: np.ndarray):
    phi = np.radians(lat)
    lam = np.radians(lng)
    cp = np.cos(phi)
    return cp * np.cos(lam), cp * np.sin(lam), np.sin(phi)


def _face_uv(x: np.ndarray, y: np.ndarray, z: np.ndarray):
    """Cube face (0..5) + (u, v) face coordinates per the spec layout:
    faces 0/1/2 = +x/+y/+z, 3/4/5 = -x/-y/-z."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    axis = np.where(ax >= ay, np.where(ax >= az, 0, 2),
                    np.where(ay >= az, 1, 2))
    major = np.where(axis == 0, x, np.where(axis == 1, y, z))
    face = np.where(major < 0, axis + 3, axis).astype(np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [y / x, -x / y, -x / z, z / x, z / y],
            default=-y / z,
        )
        v = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [z / x, z / y, -y / z, y / x, -x / y],
            default=-x / z,
        )
    return face, u, v


def _uv_to_st(uv: np.ndarray) -> np.ndarray:
    """Quadratic projection (the spec's default): equalizes cell areas
    to within ~2.1x across a face."""
    # np.where evaluates both branches; clamp keeps the unselected
    # branch's sqrt argument valid (uv is in [-1, 1])
    return np.where(uv >= 0.0,
                    0.5 * np.sqrt(np.maximum(1.0 + 3.0 * uv, 0.0)),
                    1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * uv, 0.0)))


def _st_to_ij(st: np.ndarray) -> np.ndarray:
    return np.clip(np.floor(st * _LIMIT), 0, _LIMIT - 1).astype(np.uint64)


def s2_leaf_np(lat: np.ndarray, lng: np.ndarray) -> np.ndarray:
    """Level-30 (leaf) cell ids for degree arrays -> uint64 array.

    The Hilbert walk is 30 vectorized table-lookup steps over the
    whole batch — no per-row Python.
    """
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    x, y, z = _xyz(lat, lng)
    face, u, v = _face_uv(x, y, z)
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))

    faceu = face.astype(np.uint64)
    pos = np.zeros(lat.shape, dtype=np.uint64)
    orient = faceu & np.uint64(1)  # face's starting orientation: face & swap
    one = np.uint64(1)
    for k in range(MAX_LEVEL - 1, -1, -1):
        ku = np.uint64(k)
        ij = (((i >> ku) & one) << one) | ((j >> ku) & one)
        p = _IJ_TO_POS[orient, ij]
        pos = (pos << np.uint64(2)) | p
        orient = orient ^ _POS_TO_ORIENT[p]
    return (faceu << np.uint64(61)) | (pos << one) | one


def s2_cell_np(lat: np.ndarray, lng: np.ndarray, level: int) -> np.ndarray:
    """Cell ids at ``level`` (0..30) -> uint64 array."""
    return s2_parent_np(s2_leaf_np(lat, lng), level)


def _lsb_for_level(level: int) -> np.uint64:
    return np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))


def s2_parent_np(ids: np.ndarray, level: int) -> np.ndarray:
    """Ancestor at ``level`` (must be <= the ids' level)."""
    ids = np.asarray(ids, dtype=np.uint64)
    lsb = _lsb_for_level(level)
    return (ids & ~(lsb - np.uint64(1))) | lsb


def s2_range_np(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """[range_min, range_max] of each cell's descendant leaf interval
    (inclusive, per the spec: min/max LEAF id under the cell)."""
    ids = np.asarray(ids, dtype=np.uint64)
    lsb = ids & (~ids + np.uint64(1))
    return ids - (lsb - np.uint64(1)), ids + (lsb - np.uint64(1))


def s2_level_np(ids: np.ndarray) -> np.ndarray:
    """Level of each cell id (30 - trailing_zeros/2)."""
    ids = np.asarray(ids, dtype=np.uint64)
    lsb = ids & (~ids + np.uint64(1))
    # lsb is a power of two <= 2^60; uint64 -> float64 is exact for
    # powers of two, so log2 is exact.
    tz = np.rint(np.log2(lsb.astype(np.float64)))
    return (MAX_LEVEL - tz / 2).astype(np.int64)


def s2_token(cell_id: int) -> str:
    """Hex token (trailing zeros stripped) — the spec's compact text
    form; small-scale/display only."""
    h = format(int(cell_id) & 0xFFFFFFFFFFFFFFFF, "016x").rstrip("0")
    return h or "X"


# --- Spark integration ------------------------------------------------------
def as_int64(ids: np.ndarray) -> np.ndarray:
    """Reinterpret uint64 ids as int64 (bit pattern preserved)."""
    return np.ascontiguousarray(ids, dtype=np.uint64).view(np.int64)


def s2_cell_udf(level: int = MAX_LEVEL):
    """pandas_udf (lat: double, lng: double) -> long S2 cell id at
    ``level``. Arrow-batched (ArrowEvalPython, not row-at-a-time)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # explicit non-string annotations: this module uses
    # `from __future__ import annotations`, which would turn hint-based
    # pandas_udf inference into unresolvable local strings
    def _enc(lat, lng):
        ids = s2_cell_np(lat.to_numpy(np.float64), lng.to_numpy(np.float64),
                         level)
        return pd.Series(as_int64(ids))

    _enc.__annotations__ = {"lat": pd.Series, "lng": pd.Series,
                            "return": pd.Series}
    return pandas_udf(_enc, "long")


def s2_parent_col(cell, level: int):
    """Pure-Column parent-at-level over an int64 S2 id column — the
    JVM fast path (no Python) for re-leveling an already-encoded id.

    Bit identity: &~(lsb-1) then |lsb is sign-safe on int64 because
    lsb <= 2^60 (level >= 0), so the mask arithmetic never touches
    bit 63.
    """
    from pyspark.sql import functions as F

    lsb = 1 << (2 * (MAX_LEVEL - level))
    c = cell if not isinstance(cell, str) else F.col(cell)
    return c.bitwiseAND(F.lit(~(lsb - 1))).bitwiseOR(F.lit(lsb))


def s2_range_cols(cell):
    """(range_min, range_max) Columns of an int64 S2 cell id — the
    containment interval for BETWEEN range joins. lsb extraction
    id & -id is exact on int64 for ids with bit 63 clear OR set
    (two's complement), since the trailing-bit structure lives in the
    low 61 bits."""
    from pyspark.sql import functions as F

    c = cell if not isinstance(cell, str) else F.col(cell)
    lsb = c.bitwiseAND(-c)
    return c - (lsb - F.lit(1)), c + (lsb - F.lit(1))
