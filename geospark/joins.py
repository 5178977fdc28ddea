"""Spatial joins: point-in-polygon, radius, box, kNN (SURVEY §2.6).

The reference answers these with in-memory R-trees
(``src/point_rtree.cc``, ``area_db.h``). Here the *data layout is the
index*: points carry a quadkey Morton cell (S10), polygon layers are
pre-processed into broadcastable cell-cover tables, and every query is
a two-phase **filter-refine** plan —

  1. cheap cell equi-join / bbox Column predicate (prunes 99%+, stays
     in whole-stage codegen, broadcast when the build side is small);
  2. exact refine: haversine Column expr (radius/kNN) or a vectorized
     numpy ray-cast inside an Arrow-batched pandas UDF (PIP).

At 100 TB the phase-1 join is a broadcast hash join on ``cell`` (no
shuffle of the big side); phase 2 is a narrow map. Skewed hot cells
are handled by AQE skew-join + optional salting (geospark.plans.skew).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from geospark.functions import kernels as K
from geospark.functions import numpy_kernels as NK


# ---------------------------------------------------------------------------
# Morton helpers (numpy side, matching kernels.tile_hash_32 exactly)
# ---------------------------------------------------------------------------
def _spread16(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64) & np.uint64(0xFFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x33333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x55555555)
    return v


def morton(tx: np.ndarray, ty: np.ndarray) -> np.ndarray:
    """Interleave tile coords -> Morton cell (same bit layout as S10:
    x in even bits, y in odd bits, finest zoom in the low bits)."""
    return (_spread16(np.asarray(tx)) | (_spread16(np.asarray(ty)) << np.uint64(1))).astype(np.int64)


def cell_of_latlng(lat, lng, zoom: int) -> np.ndarray:
    """numpy twin of kernels.cell_at_zoom (S10 prefix)."""
    full = NK.tile_hash_32(lat, lng)
    return np.asarray(full, np.int64) >> np.int64(2 * (16 - zoom))


def lin_id(tx: int, ty: int, zoom: int) -> int:
    """Linear cell id ``ty*2^z + tx`` in z16-prefix cell space — the
    physical join key (see cells.with_linear_cell_at_zoom for why the
    Morton id is not used as a join key)."""
    return (int(ty) << zoom) + int(tx)


def cell_tile_of_latlng(lat, lng, zoom: int) -> tuple[np.ndarray, np.ndarray]:
    """Tile coords in *cell space* at ``zoom``: the z=16 webmercator<1>
    pixel (x truncates, y rounds — S10's convention) shifted right by
    the zoom delta. This is exactly the (x, y) whose Morton code equals
    ``kernels.cell_at_zoom`` — covers MUST use this mapping, not the
    tile_size=4096 tile math, or boundary points miss their cover cell.
    zoom > 16 projects directly (the finer-grid twin of
    cells.with_linear_cell_at_zoom).
    """
    if zoom <= 16:
        px16, py16 = NK.latlng_to_pixel(lat, lng, 16, tile_size=1)
        d = 16 - zoom
        return np.asarray(px16, np.int64) >> d, np.asarray(py16, np.int64) >> d
    px, py = NK.latlng_to_pixel(lat, lng, zoom, tile_size=1)
    return np.asarray(px, np.int64), np.asarray(py, np.int64)


# ---------------------------------------------------------------------------
# Polygon layer (area_db analogue, SURVEY Q12-Q15)
# ---------------------------------------------------------------------------
@dataclass
class Area:
    """One multipolygon area: outer rings + per-outer inner rings.

    Ring arrays are (n, 2) float64 [lat, lng] — mirrors the reference's
    nested fixed_latlng vectors (area_db.h:42-43) in columnar numpy.
    """

    area_id: int
    outers: list[np.ndarray]
    inners: list[list[np.ndarray]] = field(default_factory=list)

    def __post_init__(self):
        self.outers = [np.asarray(r, np.float64) for r in self.outers]
        if not self.inners:
            self.inners = [[] for _ in self.outers]
        self.inners = [[np.asarray(r, np.float64) for r in hs] for hs in self.inners]

    def densified_great_circle(self, max_seg_deg: float = 0.25) -> "Area":
        """SPHERICAL edge semantics via densification: the reference's
        within() (src/polygon.cc:38-41, boost::geometry spherical)
        treats ring edges as great circles, while this engine's refine
        is planar in lat/lng — the two disagree for long edges at high
        latitude (a 90°-of-longitude edge at lat 60 bulges poleward to
        ~67.8° at its midpoint). Slerping extra vertices along each
        edge until every segment subtends <= ``max_seg_deg`` makes the
        planar ray-cast converge to the spherical verdict (error
        O(max_seg_deg²·tan(lat)) degrees of latitude) while keeping the
        refine pure-planar/codegen. Driver-side, layer-build-time cost
        only."""
        def dens(ring: np.ndarray) -> np.ndarray:
            la = np.radians(ring[:, 0])
            ln = np.radians(ring[:, 1])
            v = np.stack([
                np.cos(la) * np.cos(ln), np.cos(la) * np.sin(ln), np.sin(la)
            ], axis=1)
            out = []
            n = len(ring)
            for i in range(n):
                a, b = v[i], v[(i + 1) % n]
                dot = float(np.clip(np.dot(a, b), -1.0, 1.0))
                ang = np.degrees(np.arccos(dot))
                steps = max(1, int(np.ceil(ang / max_seg_deg)))
                ts = np.arange(steps) / steps
                if ang < 1e-12:
                    seg = np.repeat(a[None, :], steps, axis=0)
                else:
                    w = np.radians(ang)
                    seg = (
                        np.sin((1 - ts)[:, None] * w) * a[None, :]
                        + np.sin(ts[:, None] * w) * b[None, :]
                    ) / np.sin(w)
                out.append(seg)
            p = np.vstack(out)
            lat = np.degrees(np.arcsin(np.clip(p[:, 2], -1.0, 1.0)))
            lng = np.degrees(np.arctan2(p[:, 1], p[:, 0]))
            return np.stack([lat, lng], axis=1)

        return Area(
            self.area_id,
            [dens(r) for r in self.outers],
            [[dens(h) for h in hs] for hs in self.inners],
        )

    def max_edge_deg(self) -> float:
        """Largest central angle (degrees) subtended by any ring edge —
        the densification trigger: planar-vs-spherical divergence grows
        O(edge²·tan(lat)), so short-edge layers never need densifying."""
        best = 0.0
        for ring in [*self.outers, *(h for hs in self.inners for h in hs)]:
            la = np.radians(ring[:, 0])
            ln = np.radians(ring[:, 1])
            v = np.stack([
                np.cos(la) * np.cos(ln), np.cos(la) * np.sin(ln), np.sin(la)
            ], axis=1)
            dots = np.clip(np.einsum("ij,ij->i", v, np.roll(v, -1, axis=0)),
                           -1.0, 1.0)
            best = max(best, float(np.degrees(np.arccos(dots)).max()))
        return best

    def bbox(self) -> tuple[float, float, float, float]:
        allpts = np.vstack(self.outers)
        return (
            float(allpts[:, 0].min()),
            float(allpts[:, 1].min()),
            float(allpts[:, 0].max()),
            float(allpts[:, 1].max()),
        )


def _ring_contains(ring: np.ndarray, lat: np.ndarray, lng: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray crossing: points (lat, lng) vs one ring.

    Planar in lat/lng space — the exact-refine analogue of tg's PIP
    (area_db.h:209-214); see SURVEY §7 'reference quirks' for the
    spherical-vs-planar note (identical on all test fixtures).
    Boundary behavior: half-open edges (standard crossing parity).
    """
    ys, xs = ring[:, 0], ring[:, 1]
    y2, x2 = np.roll(ys, -1), np.roll(xs, -1)
    inside = np.zeros(lat.shape, dtype=bool)
    n_pts = lat.size
    if n_pts == 0 or len(ring) == 0:
        return inside
    # Vectorize over the LARGER axis and loop the smaller one: the
    # per-(edge, point) formula is identical either way (bit-identical
    # boundaries), but a densified ~1000-edge fence probed by a
    # handful of points (the applyInPandasWithState geofence shape)
    # pays ~1000 python iterations in edge-major order vs ~5 in
    # point-major order — and vice versa for big point batches, where
    # edge-major keeps the working vector cache-resident.
    if n_pts < len(ring):
        keep = ys != y2  # horizontal edges never cross the lat ray
        y1k, x1k, y2k, x2k = ys[keep], xs[keep], y2[keep], x2[keep]
        if y1k.size == 0:
            return inside
        for j in range(n_pts):
            la, lo = lat[j], lng[j]
            crosses = (y1k > la) != (y2k > la)
            if not crosses.any():
                continue
            xint = (x2k - x1k) * (la - y1k) / (y2k - y1k) + x1k
            inside[j] = bool((crosses & (lo < xint)).sum() & 1)
        return inside
    for i in range(len(ring)):
        y1i, x1i, y2i, x2i = ys[i], xs[i], y2[i], x2[i]
        if y1i == y2i:
            continue
        crosses = (y1i > lat) != (y2i > lat)
        if not crosses.any():
            continue
        xint = (x2i - x1i) * (lat - y1i) / (y2i - y1i) + x1i
        inside ^= crosses & (lng < xint)
    return inside


def area_contains(area: Area, lat: np.ndarray, lng: np.ndarray) -> np.ndarray:
    """Exact point-in-multipolygon, holes honored (Q15 semantics)."""
    lat = np.asarray(lat, np.float64)
    lng = np.asarray(lng, np.float64)
    result = np.zeros(lat.shape, dtype=bool)
    for outer, holes in zip(area.outers, area.inners):
        in_outer = _ring_contains(outer, lat, lng)
        if not in_outer.any():
            continue
        for h in holes:
            in_outer &= ~_ring_contains(h, lat, lng)
        result |= in_outer
    return result


# Default spherical-parity densification: any ring edge subtending
# more than this many degrees is split into great-circle segments of
# at most this length at layer build time (reference `within` is
# boost::geometry SPHERICAL, src/polygon.cc:38-41 — planar lat/lng
# ray-casting diverges on long high-latitude edges). 0.5° keeps the
# worst-case planar-vs-spherical gap ~edge²/8·sin(2·lat)/2 ≈ 60 m.
PIP_DENSIFY_DEG = 0.5


def densify_areas(areas: list[Area],
                  max_seg_deg: float | None = PIP_DENSIFY_DEG) -> list[Area]:
    """Spherical-parity pass applied by PolygonLayer by DEFAULT:
    areas whose longest edge subtends more than ``max_seg_deg`` are
    rebuilt with great-circle densified rings (short-edge areas are
    returned untouched — densification is a semantic no-op for them).
    ``max_seg_deg=None`` opts out (pure planar edges)."""
    if max_seg_deg is None:
        return list(areas)
    return [
        a.densified_great_circle(max_seg_deg)
        if a.max_edge_deg() > max_seg_deg else a
        for a in areas
    ]


class PolygonLayer:
    """A small-to-medium polygon layer, prepared for broadcast PIP
    joins: per-area bbox (Q9 agg) + cell cover at a chosen zoom (Q13
    analogue of the area_db build). The layer itself ships to
    executors via closure capture (Spark broadcasts task binaries);
    for layers too big to broadcast, normalize to a DataFrame and use
    a shuffle join on cell — same plan shape, bigger build side.

    Edge semantics match the reference's SPHERICAL within() by
    default: long-edge areas are great-circle densified at build time
    (see densify_areas). Pass ``densify_deg=None`` for raw planar
    edges (the pre-round-4 behavior).
    """

    def __init__(self, areas: list[Area], cover_zoom: int = 8,
                 densify_deg: float | None = PIP_DENSIFY_DEG):
        self.areas = densify_areas(areas, densify_deg)
        self.cover_zoom = int(cover_zoom)
        self.by_id = {a.area_id: a for a in self.areas}

    def cover(self) -> list[tuple[int, int]]:
        """(cell, area_id) pairs covering each area's bbox at
        cover_zoom — the broadcast build side of the PIP join."""
        z = self.cover_zoom
        out: list[tuple[int, int]] = []
        for a in self.areas:
            lat_min, lng_min, lat_max, lng_max = a.bbox()
            tx1, ty1 = cell_tile_of_latlng(lat_max, lng_min, z)  # NW -> min px, min py
            tx2, ty2 = cell_tile_of_latlng(lat_min, lng_max, z)  # SE
            for ty in range(int(ty1), int(ty2) + 1):
                for tx in range(int(tx1), int(tx2) + 1):
                    out.append((lin_id(tx, ty, z), a.area_id))
        return out

    def cover_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(self.cover(), "cell_cov long, area_id long")


def _balanced_reduce(terms: list[Column], op) -> Column:
    """Pairwise (balanced) reduction: a left-deep chain of N boolean
    ops builds an O(N)-deep Column tree that overflows Catalyst's
    recursive converters around ~500 terms (measured StackOverflowError
    on a densified ring); balancing makes the depth O(log N) with the
    identical value (XOR/AND/OR are associative)."""
    while len(terms) > 1:
        terms = [
            op(terms[i], terms[i + 1]) if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    return terms[0]


def _ring_contains_expr(ring: np.ndarray, lat: Column, lng: Column) -> Column:
    """Even-odd ray-cast parity for a FIXED ring as a pure Column
    expression (identical arithmetic to _ring_contains): the polygon
    compiles into the plan and runs inside whole-stage codegen — zero
    Python. Horizontal edges skipped exactly as the numpy twin does."""
    ys, xs = ring[:, 0], ring[:, 1]
    n = len(ring)
    terms: list[Column] = []
    for i in range(n):
        y1, x1 = float(ys[i]), float(xs[i])
        y2, x2 = float(ys[(i + 1) % n]), float(xs[(i + 1) % n])
        if y1 == y2:
            continue
        crosses = (F.lit(y1) > lat) != (F.lit(y2) > lat)
        xint = (F.lit(x2 - x1)) * (lat - F.lit(y1)) / F.lit(y2 - y1) + F.lit(x1)
        terms.append(crosses & (lng < xint))
    if not terms:
        return F.lit(False)
    return _balanced_reduce(terms, lambda a, b: a != b)


def area_contains_expr(area: Area, lat: Column, lng: Column) -> Column:
    """Q15 as a Column expression: OR over (outer AND NOT holes)."""
    parts: list[Column] = []
    for outer, holes in zip(area.outers, area.inners):
        e = _ring_contains_expr(outer, lat, lng)
        for h in holes:
            e = e & ~_ring_contains_expr(h, lat, lng)
        parts.append(e)
    if not parts:
        return F.lit(False)
    return _balanced_reduce(parts, lambda a, b: a | b)


def pip_join(points: DataFrame, layer: PolygonLayer,
             lat: str = "lat", lng: str = "lng",
             max_expr_edges: int = 512) -> DataFrame:
    """Flagship PIP join (Q10/Q14/Q15): points ⨝ broadcast(cell cover)
    on the cover-zoom cell, then exact ray-cast refine. Returns the
    input columns + ``area_id``.

    Refine strategy:
    - small layers (≤ max_expr_edges total ring edges): the ray-cast
      compiles to a per-area Column expression — the WHOLE join stays
      inside whole-stage codegen, no JVM→Python hop at all;
    - bigger layers: vectorized numpy ray-cast in an Arrow-batched
      pandas UDF (rings ship once via closure, grouped by area inside
      the batch).

    Plan shape at scale: broadcast hash join (no shuffle of points) →
    narrow refine → output. Hot city cells are split by AQE skew-join;
    explicit salting unnecessary because the build side is broadcast
    (no shuffle to skew).
    """
    from geospark.cells import with_linear_cell_at_zoom

    spark = points.sparkSession
    z = layer.cover_zoom
    cand = with_linear_cell_at_zoom(points, z, lat, lng, "_cell_cov").join(
        F.broadcast(layer.cover_df(spark)),
        F.col("_cell_cov") == F.col("cell_cov"),
        "inner",
    ).drop("_cell_cov", "cell_cov")

    areas = {a.area_id: Area(a.area_id, a.outers, a.inners) for a in layer.areas}
    total_edges = sum(
        len(r) for a in areas.values() for r in a.outers
    ) + sum(len(r) for a in areas.values() for hs in a.inners for r in hs)

    if total_edges <= max_expr_edges:
        preds = [
            (F.col("area_id") == aid) & area_contains_expr(
                area, F.col(lat), F.col(lng)
            )
            for aid, area in areas.items()
        ]
        if not preds:  # empty layer: no area can contain anything
            return cand.filter(F.lit(False))
        return cand.filter(_balanced_reduce(preds, lambda a, b: a | b))

    @pandas_udf("boolean")
    def _is_within(lat_s: pd.Series, lng_s: pd.Series, aid_s: pd.Series) -> pd.Series:
        out = np.zeros(len(lat_s), dtype=bool)
        lat_v = lat_s.to_numpy(np.float64)
        lng_v = lng_s.to_numpy(np.float64)
        aid_v = aid_s.to_numpy(np.int64)
        for aid in np.unique(aid_v):
            m = aid_v == aid
            out[m] = area_contains(areas[int(aid)], lat_v[m], lng_v[m])
        return pd.Series(out)

    return cand.filter(_is_within(F.col(lat), F.col(lng), F.col("area_id")))


# ---------------------------------------------------------------------------
# Radius join (Q2/Q3)
# ---------------------------------------------------------------------------
def _buffered_bbox(lat: float, lng: float, dist_m: float) -> tuple[float, float, float, float]:
    """box{center}.extend(dist_m) (box.h:27-29 + :50-70), python twin:
    constants 111000 / 111200 exactly as the reference."""
    d_lat = dist_m / 111000.0
    lat_min, lat_max = lat - d_lat, lat + d_lat
    min_mpd = 111200.0 * math.cos(lat_min * math.pi / 180.0)
    max_mpd = 111200.0 * math.cos(lat_max * math.pi / 180.0)
    lng_min = lng - abs(dist_m / min_mpd)
    lng_max = lng + abs(dist_m / max_mpd)
    return lat_min, lng_min, lat_max, lng_max


def _cover_ranges(lat_min, lng_min, lat_max, lng_max, z: int, pad: int = 1):
    """Vectorized bbox -> cover rectangle at zoom ``z``: returns
    ``(tx1, ty1, nx, ny)`` int64 arrays where x runs ``tx1 .. tx1+nx-1``
    **modulo 2^z** (antimeridian wrap) and y is clamped to [0, 2^z).

    ``pad`` adds a ring of cells around the bbox rectangle: the
    reference's box::extend lng buffer (box.h:50-70, replicated in
    :func:`_buffered_bbox`) under-covers the true haversine disk at
    high latitude / large radius (true max dLng = asin(sin(r/R)/
    cos(lat))), so covers built from it keep a one-cell safety ring —
    the exact refine still decides membership, the ring only restores
    recall.
    """
    lat_min = np.maximum(np.asarray(lat_min, np.float64), -NK.MERC_MAX_LATITUDE)
    lat_max = np.minimum(np.asarray(lat_max, np.float64), NK.MERC_MAX_LATITUDE)
    lng_min = np.asarray(lng_min, np.float64)
    lng_max = np.asarray(lng_max, np.float64)
    n = np.int64(1 << z)
    span = lng_max - lng_min
    # wrap lngs into [-180, 180) so antimeridian-crossing boxes enumerate
    # the wrapped x-range instead of collapsing to an empty cover
    lng_min_w = np.mod(lng_min + 180.0, 360.0) - 180.0
    lng_max_w = np.mod(lng_max + 180.0, 360.0) - 180.0
    tx1, ty1 = cell_tile_of_latlng(lat_max, lng_min_w, z)
    tx2, ty2 = cell_tile_of_latlng(lat_min, lng_max_w, z)
    tx1 = np.clip(np.atleast_1d(tx1), 0, n - 1)
    tx2 = np.clip(np.atleast_1d(tx2), 0, n - 1)
    ty1 = np.clip(np.atleast_1d(ty1), 0, n - 1)
    ty2 = np.clip(np.atleast_1d(ty2), 0, n - 1)
    nx = np.mod(tx2 - tx1, n) + 1  # wrapped width
    nx = np.where(np.atleast_1d(span) >= 360.0, n, nx)
    p = np.int64(pad)
    tx1 = np.mod(tx1 - p, n)
    nx = np.minimum(nx + 2 * p, n)
    ty1c = np.maximum(ty1 - p, 0)
    ny = np.minimum(ty2 + p, n - 1) - ty1c + 1
    return tx1, ty1c, nx, np.maximum(ny, 0)


def _enumerate_covers(tx1, ty1, nx, ny, z: int):
    """Ragged enumeration of cover rectangles (x wraps mod 2^z):
    returns ``(cells, counts)`` — flat int64 linear cell ids in row-major
    (y, x) order plus the per-row cell count. Pure numpy, no per-row
    Python."""
    n = np.int64(1 << z)
    counts = (nx * ny).astype(np.int64)
    total = int(counts.sum())
    starts = np.zeros(len(counts), np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    row = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    within = np.arange(total, dtype=np.int64) - starts[row]
    nx_r = nx[row]
    dy = within // nx_r
    dx = within - dy * nx_r
    tx = np.mod(tx1[row] + dx, n)
    ty = ty1[row] + dy
    return (ty << np.int64(z)) + tx, counts


def _cover_cells_of_bbox(lat_min, lng_min, lat_max, lng_max, z: int,
                         pad: int = 1) -> list[int]:
    tx1, ty1, nx, ny = _cover_ranges(lat_min, lng_min, lat_max, lng_max, z, pad)
    cells, _ = _enumerate_covers(tx1, ty1, nx, ny, z)
    return [int(c) for c in cells]


def _count_cover_cells(lat_min, lng_min, lat_max, lng_max, z: int,
                       pad: int = 1) -> int:
    """Cell count of the bbox cover at z WITHOUT enumerating."""
    _, _, nx, ny = _cover_ranges(lat_min, lng_min, lat_max, lng_max, z, pad)
    return int(nx[0] * ny[0])


def _pick_cover_zoom(centers: list[tuple[int, float, float]], radius_m: float,
                     max_cells_per_center: int = 64) -> int:
    """Finest zoom whose per-center bbox cover stays under the cell
    budget — keeps the broadcast build side tiny while maximizing
    pruning selectivity."""
    for z in range(20, -1, -1):
        worst = 0
        for _, lat, lng in centers:
            bb = _buffered_bbox(lat, lng, radius_m)
            worst = max(worst, _count_cover_cells(*bb, z))
        if worst <= max_cells_per_center:
            return z
    return 0


def cover_cells_series(lat_min, lng_min, lat_max, lng_max, z: int,
                       pad: int = 1) -> pd.Series:
    """Vectorized batch form for pandas UDFs: per-row cover cell LISTS
    as a pandas Series backed by a pyarrow ListArray — zero per-row
    Python (the round trip is two numpy passes + one Arrow build)."""
    import pyarrow as pa

    tx1, ty1, nx, ny = _cover_ranges(lat_min, lng_min, lat_max, lng_max, z, pad)
    cells, counts = _enumerate_covers(tx1, ty1, nx, ny, z)
    offsets = np.zeros(len(counts) + 1, np.int32)
    np.cumsum(counts, out=offsets[1:])
    return pa.ListArray.from_arrays(
        pa.array(offsets), pa.array(cells, pa.int64())
    ).to_pandas()


def neighbor_cells_series(lat, lng, zoom: int) -> pd.Series:
    """3x3 neighbor-cell lists for a batch of points, fully vectorized
    (numpy broadcast over the 9 offsets; x wraps mod 2^z, y clamps;
    in-row dedup via sort — wrap collisions occur only at zoom <= 1).
    Returns a pandas Series of int64 arrays (pyarrow ListArray)."""
    import pyarrow as pa

    tx, ty = cell_tile_of_latlng(
        np.asarray(lat, np.float64), np.asarray(lng, np.float64), zoom
    )
    n = np.int64(1 << zoom)
    dx = np.tile(np.array([-1, 0, 1], np.int64), 3)
    dy = np.repeat(np.array([-1, 0, 1], np.int64), 3)
    xs = np.mod(np.atleast_1d(tx)[:, None] + dx, n)
    ys = np.atleast_1d(ty)[:, None] + dy
    valid = (ys >= 0) & (ys < n)
    ids = (np.maximum(ys, 0) << np.int64(zoom)) + xs
    sent = np.int64(1) << np.int64(62)
    ids = np.where(valid, ids, sent)
    ids.sort(axis=1)
    keep = ids != sent
    keep[:, 1:] &= ids[:, 1:] != ids[:, :-1]
    counts = keep.sum(axis=1)
    offsets = np.zeros(len(counts) + 1, np.int32)
    np.cumsum(counts, out=offsets[1:])
    return pa.ListArray.from_arrays(
        pa.array(offsets), pa.array(ids[keep], pa.int64())
    ).to_pandas()


def radius_join(points: DataFrame, centers: list[tuple[int, float, float]],
                max_m: float, min_m: float = 0.0,
                lat: str = "lat", lng: str = "lng",
                with_distance: bool = True) -> DataFrame:
    """in_radius(_with_distance) as a join (src/point_rtree.cc:21-68):
    per-center buffered-bbox cell cover (broadcast) ⨝ points on cell,
    exact haversine refine with half-open ``[min_m, max_m)`` semantics,
    ordered by distance. ``centers`` = [(query_id, lat, lng), ...].
    """
    spark = points.sparkSession
    z = _pick_cover_zoom(centers, max_m)
    rows = []
    for qid, clat, clng in centers:
        bb = _buffered_bbox(clat, clng, max_m)
        for c in _cover_cells_of_bbox(*bb, z):
            rows.append((int(qid), float(clat), float(clng), int(c)))
    cover = spark.createDataFrame(
        rows, "query_id long, q_lat double, q_lng double, q_cell long"
    )
    from geospark.cells import with_linear_cell_at_zoom

    dist = K.distance(F.col("q_lat"), F.col("q_lng"), F.col(lat), F.col(lng))
    out = (
        with_linear_cell_at_zoom(points, z, lat, lng, "_cell_q")
        .join(F.broadcast(cover), F.col("_cell_q") == F.col("q_cell"), "inner")
        .drop("_cell_q", "q_cell")
        .withColumn("dist_m", dist)
        .filter((F.col("dist_m") < max_m) & (F.col("dist_m") >= min_m))
        .orderBy("query_id", "dist_m")
    )
    if not with_distance:
        out = out.drop("dist_m")
    return out.drop("q_lat", "q_lng")


def pip_join_table(points: DataFrame, polygons: DataFrame,
                   cover_zoom: int = 8, lat: str = "lat",
                   lng: str = "lng") -> DataFrame:
    """PIP join against a polygon TABLE (sources.POLYGON_TABLE_SCHEMA:
    area_id, outer_idx, ring_kind, ring_idx, seq, lat, lng) — the
    non-broadcast path for layers too big to ship by closure.

    Plan: per-area bbox agg -> cover-cell explode (Arrow UDF, narrow)
          points ⨝ cover on cell (shuffle hash join; AQE skew split)
          candidates cogrouped with ring rows by area_id ->
          applyInPandas ray-cast refine (rings move once per area per
          partition, not once per candidate row).
    """
    from geospark.cells import with_linear_cell_at_zoom

    zoom = cover_zoom
    bboxes = polygons.filter(F.col("ring_kind") == "outer").groupBy("area_id").agg(
        F.min(lat).alias("_lat_min"), F.min(lng).alias("_lng_min"),
        F.max(lat).alias("_lat_max"), F.max(lng).alias("_lng_max"),
    )

    @pandas_udf("array<long>")
    def _cover(lat_min: pd.Series, lng_min: pd.Series, lat_max: pd.Series,
               lng_max: pd.Series) -> pd.Series:
        # exact polygon bboxes (not buffered disks) need no safety ring
        return cover_cells_series(
            lat_min.to_numpy(np.float64), lng_min.to_numpy(np.float64),
            lat_max.to_numpy(np.float64), lng_max.to_numpy(np.float64),
            zoom, pad=0,
        )

    # the cover key gets its OWN column name: cand's lineage shares
    # attributes with `polygons`, and the cogroup below would otherwise
    # be an ambiguous self-join (renaming sidesteps attr-id collisions)
    cover = bboxes.select(
        F.col("area_id").alias("cov_area_id"),
        F.explode(_cover(
            F.col("_lat_min"), F.col("_lng_min"),
            F.col("_lat_max"), F.col("_lng_max"),
        )).alias("cell_cov"),
    )
    cand = (
        with_linear_cell_at_zoom(points, zoom, lat, lng, "_cell_cov")
        .join(cover, F.col("_cell_cov") == F.col("cell_cov"), "inner")
        .drop("_cell_cov", "cell_cov")
    )

    point_cols = list(points.columns)
    out_cols = point_cols + ["area_id"]
    p_lat, p_lng = lat, lng

    def refine(key, cand_pdf: pd.DataFrame, rings_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = cand_pdf.iloc[0:0][point_cols].copy()
        empty["area_id"] = pd.Series(dtype="int64")
        if cand_pdf.empty or rings_pdf.empty:
            return empty
        rings_pdf = rings_pdf.sort_values(["outer_idx", "ring_kind", "ring_idx", "seq"])
        outers, inners = [], []
        for _, og in rings_pdf.groupby("outer_idx"):
            o = og[og["ring_kind"] == "outer"]
            outers.append(o[["lat", "lng"]].to_numpy(np.float64))
            holes = [
                ig[["lat", "lng"]].to_numpy(np.float64)
                for _, ig in og[og["ring_kind"] == "inner"].groupby("ring_idx")
            ]
            inners.append(holes)
        area = Area(int(key[0]), outers, inners)
        inside = area_contains(
            area, cand_pdf[p_lat].to_numpy(np.float64),
            cand_pdf[p_lng].to_numpy(np.float64),
        )
        result = cand_pdf.loc[inside, point_cols].copy()
        result["area_id"] = int(key[0])
        return result

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in points.schema.fields
    ) + ", area_id long"
    return (
        cand.groupBy("cov_area_id")
        .cogroup(polygons.groupBy("area_id"))
        .applyInPandas(refine, schema)
    )


def radius_join_df(points: DataFrame, centers: DataFrame, max_m: float,
                   min_m: float = 0.0, lat: str = "lat", lng: str = "lng",
                   q_id: str = "query_id", q_lat: str = "q_lat",
                   q_lng: str = "q_lng", cover_zoom: int | None = None,
                   radius_col: str | None = None,
                   broadcast_centers: bool = False) -> DataFrame:
    """Radius join with a DATAFRAME of query centers — the
    scale-symmetric form of :func:`radius_join` (the list API collects
    covers on the driver; this one computes each center's buffered-bbox
    cell cover in an Arrow-batched UDF, so millions of centers work).

    ``radius_col``: optional per-center radius column (capped by
    ``max_m``) — each center's cover AND its refine threshold use its
    own radius (the kNN phase-2 path).

    Plan: centers -> explode(cover cells)  (narrow, ~k cells/center)
          points  -> linear cell           (narrow)
          hash join on cell (shuffle both sides, or broadcast the
          exploded centers with ``broadcast_centers=True``)
          -> exact haversine refine, [min_m, max) semantics.
    """
    from geospark.cells import with_linear_cell_at_zoom

    if cover_zoom is None:
        # finest zoom whose 1-cell edge still exceeds the radius —
        # bbox covers then stay at a handful of cells per center
        earth = 40075016.686
        z = 0
        while z < 20 and earth / (1 << (z + 1)) >= max_m:
            z += 1
        cover_zoom = z
    zoom = cover_zoom

    @pandas_udf("array<long>")
    def _cover(clat: pd.Series, clng: pd.Series, cr: pd.Series) -> pd.Series:
        la = clat.to_numpy(np.float64)
        ln = clng.to_numpy(np.float64)
        r = cr.to_numpy(np.float64)
        # vectorized box::extend twin (box.h:27-29 + :50-70)
        d_lat = r / 111000.0
        lat_lo, lat_hi = la - d_lat, la + d_lat
        lng_lo = ln - np.abs(r / (111200.0 * np.cos(np.radians(lat_lo))))
        lng_hi = ln + np.abs(r / (111200.0 * np.cos(np.radians(lat_hi))))
        return cover_cells_series(lat_lo, lng_lo, lat_hi, lng_hi, zoom, pad=1)

    r_col = F.least(F.col(radius_col), F.lit(max_m)) if radius_col else F.lit(max_m)
    c = centers.select(
        F.col(q_id).alias("query_id"),
        F.col(q_lat).alias("_q_lat"),
        F.col(q_lng).alias("_q_lng"),
        r_col.alias("_q_r"),
        F.explode(
            _cover(F.col(q_lat), F.col(q_lng), r_col)
        ).alias("_q_cell"),
    )
    if broadcast_centers:
        c = F.broadcast(c)
    pts = with_linear_cell_at_zoom(points, zoom, lat, lng, "_cell_q")
    dist = K.distance(F.col("_q_lat"), F.col("_q_lng"), F.col(lat), F.col(lng))
    return (
        pts.join(c, F.col("_cell_q") == F.col("_q_cell"), "inner")
        .withColumn("dist_m", dist)
        .filter((F.col("dist_m") < F.col("_q_r")) & (F.col("dist_m") >= min_m))
        .drop("_cell_q", "_q_cell", "_q_lat", "_q_lng", "_q_r")
    )


def knn_join_df(points: DataFrame, centers: DataFrame, k: int,
                lat: str = "lat", lng: str = "lng", id_col: str = "point_id",
                q_id: str = "query_id", q_lat: str = "q_lat",
                q_lng: str = "q_lng", start_zoom: int = 16) -> DataFrame:
    """kNN with a DATAFRAME of query centers — the scale-symmetric
    twin of :func:`knn_join`. The driver loop touches only per-center
    AGGREGATES (counts), never data rows:

    phase 1: per zoom (start_zoom, -2, ... 0): join each remaining
    center's 3x3 cell neighborhood, window-top-k, keep centers with
    ≥ k candidates and their kth distance d_k (an upper bound);
    remaining centers coarsen. All DataFrame ops; the loop condition
    is one count() per level. START FINE (z16): on skewed data a
    coarse start hands every dense-city center a 10^5-row
    neighborhood to sort for k=10 (measured 165s for 2k centers over
    12M points at z12 vs seconds at z16); centers in sparse areas
    escalate, and each escalation reprocesses only the missers.

    phase 2: radius_join_df with PER-CENTER radius d_k, then window
    top-k by exact haversine (ties -> id_col).
    """
    from geospark.cells import with_linear_cell_at_zoom

    spark = points.sparkSession
    eps = 1e-6
    remaining = centers.select(
        F.col(q_id).alias("query_id"),
        F.col(q_lat).alias("c_lat"),
        F.col(q_lng).alias("c_lng"),
    )
    from geospark.spool import spool

    remaining = spool(remaining, "knn_centers")
    dk_parts: list[DataFrame] = []
    z = start_zoom
    def _neigh_udf(_z: int):
        @pandas_udf("array<long>")
        def _neigh(clat: pd.Series, clng: pd.Series) -> pd.Series:
            return neighbor_cells_series(
                clat.to_numpy(np.float64), clng.to_numpy(np.float64), _z
            )

        return _neigh

    while z >= 0:
        _neigh = _neigh_udf(z)
        cov = remaining.select(
            "query_id", "c_lat", "c_lng",
            F.explode(_neigh(F.col("c_lat"), F.col("c_lng"))).alias("_q_cell"),
        )
        cand = (
            with_linear_cell_at_zoom(points, z, lat, lng, "_c")
            .join(cov, F.col("_c") == F.col("_q_cell"))
            .withColumn("dist_m", K.distance(F.col("c_lat"), F.col("c_lng"),
                                             F.col(lat), F.col(lng)))
        )
        w = Window.partitionBy("query_id").orderBy("dist_m", id_col)
        summary = (
            cand.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .groupBy("query_id")
            .agg(F.count("*").alias("_n"), F.max("dist_m").alias("_dk"))
        )
        summary = spool(summary, "knn_summary")
        sat = summary.filter(F.col("_n") >= k).select(
            "query_id", (F.col("_dk") * (1.0 + 1e-9) + eps).alias("knn_radius")
        )
        dk_parts.append(spool(sat, "knn_sat"))
        remaining = spool(
            remaining.join(sat, "query_id", "left_anti"), "knn_remaining"
        )
        if remaining.limit(1).count() == 0:
            break
        z -= 4  # coarsen 16x per miss: phase 2 prunes with per-center
        #         radii, so a loose d_k costs less than extra rounds
    dk_all = None
    for p in dk_parts:
        dk_all = p if dk_all is None else dk_all.unionByName(p)

    base = centers.select(
        F.col(q_id).alias("query_id"),
        F.col(q_lat).alias("q_lat"),
        F.col(q_lng).alias("q_lng"),
    )
    w = Window.partitionBy("query_id").orderBy("dist_m", id_col)
    results = []

    if dk_all is not None:
        # cover zoom from the actual max d_k (one scalar aggregate) —
        # covers stay proportional to each center's own radius
        max_dk = dk_all.agg(F.max("knn_radius")).collect()[0][0]
        if max_dk is not None:
            centers_dk = base.join(dk_all, "query_id")
            results.append(radius_join_df(
                points, centers_dk, max_m=float(max_dk),
                radius_col="knn_radius", lat=lat, lng=lng,
            ))

    if remaining.limit(1).count() > 0:
        # centers with < k points even at z=0: brute-force the few
        # stragglers (cross join against a tiny center set)
        lcent = remaining.select(
            "query_id", F.col("c_lat").alias("q_lat"),
            F.col("c_lng").alias("q_lng"),
        )
        brute = points.crossJoin(F.broadcast(lcent)).withColumn(
            "dist_m",
            K.distance(F.col("q_lat"), F.col("q_lng"), F.col(lat), F.col(lng)),
        ).drop("q_lat", "q_lng")
        results.append(brute)

    if not results:  # empty centers -> empty result, stable schema
        return (
            points.withColumn("query_id", F.lit(None).cast("long"))
            .withColumn("dist_m", F.lit(None).cast("double"))
            .limit(0)
        )
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def nearest_join_df(points: DataFrame, centers: DataFrame,
                    lat: str = "lat", lng: str = "lng",
                    id_col: str = "point_id",
                    q_id: str = "query_id", q_lat: str = "q_lat",
                    q_lng: str = "q_lng",
                    start_zoom: int = 8) -> DataFrame:
    """Nearest-neighbor join (kNN k=1) with ZERO windows — every pass
    is a partial-aggregatable min, so no exchange ever carries the raw
    candidate relation (each map task ships one minimum per center it
    saw). :func:`knn_join_df` with k=1 is semantically identical but
    pays two row_number windows over the candidate relation (the
    general-k top-k needs them); at 12M points x 450k places the
    window sorts dominated its wall (137.8s vs this path — BENCH.md).

    phase 1 (d_1 upper bound): per zoom (start_zoom, -4, ... 0), join
    each remaining center's 3x3 cell neighborhood and take
    min(dist) per center — centers with >=1 candidate are satisfied,
    the rest coarsen. phase 2: radius_join_df with per-center radius
    d_1(1+1e-9)+eps, then the final exact argmin as min(struct(dist,
    id)) — ties resolve to the lowest ``id_col``, matching
    knn_join_df's (dist, id) window order exactly.

    Returns (query_id, id_col, dist_m)."""
    from geospark.cells import with_linear_cell_at_zoom
    from geospark.spool import spool

    eps = 1e-6
    remaining = spool(
        centers.select(
            F.col(q_id).alias("query_id"),
            F.col(q_lat).alias("c_lat"),
            F.col(q_lng).alias("c_lng"),
        ),
        "nn_centers",
    )

    def _neigh_udf(_z: int):
        @pandas_udf("array<long>")
        def _neigh(clat: pd.Series, clng: pd.Series) -> pd.Series:
            return neighbor_cells_series(
                clat.to_numpy(np.float64), clng.to_numpy(np.float64), _z
            )

        return _neigh

    d1_parts: list[DataFrame] = []
    z = start_zoom
    while z >= 0:
        _neigh = _neigh_udf(z)
        cov = remaining.select(
            "query_id", "c_lat", "c_lng",
            F.explode(_neigh(F.col("c_lat"), F.col("c_lng"))).alias("_q_cell"),
        )
        cand = (
            with_linear_cell_at_zoom(points, z, lat, lng, "_c")
            .join(cov, F.col("_c") == F.col("_q_cell"))
        )
        sat = (
            cand.groupBy("query_id")
            .agg(F.min(K.distance(F.col("c_lat"), F.col("c_lng"),
                                  F.col(lat), F.col(lng))).alias("_d1"))
            .select(
                "query_id",
                (F.col("_d1") * (1.0 + 1e-9) + eps).alias("nn_radius"),
            )
        )
        sat = spool(sat, "nn_sat")
        d1_parts.append(sat)
        remaining = spool(
            remaining.join(sat, "query_id", "left_anti"), "nn_remaining"
        )
        if remaining.limit(1).count() == 0:
            break
        z -= 4

    d1_all = None
    for p in d1_parts:
        d1_all = p if d1_all is None else d1_all.unionByName(p)

    base = centers.select(
        F.col(q_id).alias("query_id"),
        F.col(q_lat).alias("q_lat"),
        F.col(q_lng).alias("q_lng"),
    )
    parts: list[DataFrame] = []
    if d1_all is not None:
        max_d1 = d1_all.agg(F.max("nn_radius")).collect()[0][0]
        if max_d1 is not None:
            centers_d1 = base.join(d1_all, "query_id")
            parts.append(
                radius_join_df(
                    points, centers_d1, max_m=float(max_d1),
                    radius_col="nn_radius", lat=lat, lng=lng,
                ).select("query_id", F.col(id_col).alias("_id"), "dist_m")
            )
    if remaining.limit(1).count() > 0:
        # centers that saw zero points even at z=0 (empty/near-empty
        # point set): brute-force the stragglers
        lcent = remaining.select(
            "query_id", F.col("c_lat").alias("q_lat"),
            F.col("c_lng").alias("q_lng"),
        )
        parts.append(
            points.crossJoin(F.broadcast(lcent)).select(
                "query_id", F.col(id_col).alias("_id"),
                K.distance(F.col("q_lat"), F.col("q_lng"),
                           F.col(lat), F.col(lng)).alias("dist_m"),
            )
        )
    if not parts:
        return (
            points.select(
                F.lit(None).cast("long").alias("query_id"),
                F.col(id_col).alias("_id"),
                F.lit(None).cast("double").alias("dist_m"),
            ).limit(0)
            .withColumnRenamed("_id", id_col)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    best = out.groupBy("query_id").agg(
        F.min(F.struct(F.col("dist_m"), F.col("_id"))).alias("_b")
    )
    return best.select(
        "query_id",
        F.col("_b._id").alias(id_col),
        F.col("_b.dist_m").alias("dist_m"),
    )


# ---------------------------------------------------------------------------
# Box query (Q5/Q7)
# ---------------------------------------------------------------------------
def box_query(points: DataFrame, lat_min: float, lng_min: float,
              lat_max: float, lng_max: float,
              lat: str = "lat", lng: str = "lng",
              strict: bool = True) -> DataFrame:
    """point_rtree::within(box) (src/point_rtree.cc:70-78): pure Column
    predicate; STRICT inequalities per box::contains(latlng)
    (box.h:72-75). On a cell-sorted table the lat/lng min-max column
    stats give parquet row-group pruning for free.
    """
    pred = K.box_contains_point(
        F.lit(lat_min), F.lit(lng_min), F.lit(lat_max), F.lit(lng_max),
        F.col(lat), F.col(lng),
    )
    if not strict:
        pred = (
            (F.col(lat) >= lat_min) & (F.col(lat) <= lat_max)
            & (F.col(lng) >= lng_min) & (F.col(lng) <= lng_max)
        )
    return points.filter(pred)


# ---------------------------------------------------------------------------
# kNN join (Q4) — guaranteed-exact two-phase plan
# ---------------------------------------------------------------------------
def knn_join(points: DataFrame, centers: list[tuple[int, float, float]], k: int,
             lat: str = "lat", lng: str = "lng", id_col: str = "point_id",
             start_zoom: int = 16) -> DataFrame:
    """point_rtree::nearest(c, k) (src/point_rtree.cc:38-48) as a
    distributed two-phase plan:

    phase 1 (candidate radius discovery): join each center's 3×3 cell
    neighborhood at a zoom that yields ≥ k candidates (coarsening on
    miss — a short driver loop over *counts only*, no data collect);
    the kth candidate distance is an upper bound d_k on the true kth
    neighbor distance.

    phase 2 (guaranteed exact): radius join with max = d_k (+ε), then
    window top-k by exact haversine. Correct because the true k
    nearest all lie within d_k of the center.
    """
    spark = points.sparkSession
    # deterministic tie-break: exact-equal distances resolve by id
    w = Window.partitionBy("query_id").orderBy("dist_m", id_col)
    pts = points

    # --- phase 1: find a per-center upper bound on the kth distance
    remaining = list(centers)
    dk_by_qid: dict[int, float] = {}
    z = start_zoom
    while remaining and z >= 0:
        seen: set[tuple[int, int]] = set()
        rows = []
        for qid, clat, clng in remaining:
            ctx, cty = cell_tile_of_latlng(clat, clng, z)
            n = 1 << z
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    tx, ty = (int(ctx) + dx) % n, int(cty) + dy
                    if not (0 <= ty < n):
                        continue
                    c = lin_id(tx, ty, z)
                    if (int(qid), c) in seen:  # 3x3 wraps onto itself at coarse z
                        continue
                    seen.add((int(qid), c))
                    rows.append((int(qid), float(clat), float(clng), c))
        cover = spark.createDataFrame(
            rows, "query_id long, q_lat double, q_lng double, q_cell long"
        )
        from geospark.cells import with_linear_cell_at_zoom

        cand = (
            with_linear_cell_at_zoom(pts, z, lat, lng, "_c")
            .join(F.broadcast(cover), F.col("_c") == F.col("q_cell"))
            .withColumn("dist_m", K.distance(F.col("q_lat"), F.col("q_lng"),
                                             F.col(lat), F.col(lng)))
        )
        kth = (
            cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .groupBy("query_id")
            .agg(F.count("*").alias("n"), F.max("dist_m").alias("dk"))
            .collect()
        )
        got = {r["query_id"]: (r["n"], r["dk"]) for r in kth}
        still = []
        for qid, clat, clng in remaining:
            n_found, dk = got.get(qid, (0, None))
            if n_found >= k:
                dk_by_qid[qid] = float(dk)
            else:
                still.append((qid, clat, clng))
        remaining = still
        z -= 4  # coarsen 16x per miss (phase 2 re-prunes per center)

    # --- phase 2: exact radius join with PER-CENTER radius d_k (one
    # sparse-area center must not inflate every center's cover), top-k
    # re-rank. Stragglers with < k points anywhere brute-force against
    # the (tiny) remaining center set instead of forcing a z=0 cover.
    parts: list[DataFrame] = []
    if dk_by_qid:
        by_qid = {int(q): (la, ln) for q, la, ln in centers}
        rows = [
            (int(qid), by_qid[int(qid)][0], by_qid[int(qid)][1],
             dk * (1.0 + 1e-9) + 1e-6)
            for qid, dk in dk_by_qid.items()
        ]
        centers_dk = spark.createDataFrame(
            rows, "query_id long, q_lat double, q_lng double, knn_radius double"
        )
        max_r = max(r[3] for r in rows)
        parts.append(radius_join_df(
            pts, centers_dk, max_m=max_r, radius_col="knn_radius",
            lat=lat, lng=lng, broadcast_centers=True,
        ))
    if remaining:  # fewer than k points near these centers anywhere
        lcent = spark.createDataFrame(
            [(int(q), float(la), float(ln)) for q, la, ln in remaining],
            "query_id long, q_lat double, q_lng double",
        )
        parts.append(
            pts.crossJoin(F.broadcast(lcent))
            .withColumn("dist_m", K.distance(
                F.col("q_lat"), F.col("q_lng"), F.col(lat), F.col(lng)))
            .drop("q_lat", "q_lng")
        )
    if not parts:  # empty centers -> empty result, stable schema
        return (
            pts.withColumn("query_id", F.lit(None).cast("long"))
            .withColumn("dist_m", F.lit(None).cast("double"))
            .limit(0)
        )
    cand = parts[0]
    for p in parts[1:]:
        cand = cand.unionByName(p)
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
        .orderBy("query_id", "dist_m")
    )


# ---------------------------------------------------------------------------
# Map matching: nearest segment within a radius (GPS probe -> network)
# ---------------------------------------------------------------------------
def knn_classify(points: DataFrame, centers: list[tuple[int, float, float]],
                 k: int, label_col: str = "label",
                 lat: str = "lat", lng: str = "lng",
                 id_col: str = "point_id",
                 start_zoom: int = 16) -> DataFrame:
    """k-NN majority-vote classification — the spatial ML primitive:
    each query location takes the modal label of its ``k`` nearest
    labeled points (exact haversine neighbors via the two-phase
    :func:`knn_join` escalation; vote ties break on the
    lexicographically smaller label — deterministic in any engine).

    Plan: the kNN join's aggregate-only escalation finds the |Q|*k
    neighbor ids; that MODEL-SIZED relation broadcasts back into one
    hash join against the labeled points (the corpus never shuffles),
    votes partial-aggregate per (query, label), and the winner is a
    min-struct argmax on (-votes, label). Returns
    (query_id, label, n_votes).

    Reference analogue: Q4 nearest (src/point_rtree.cc:38-48)
    feeding a vote aggregate instead of a ranked list."""
    nn = knn_join(points.select(id_col, lat, lng), centers, k,
                  lat=lat, lng=lng, id_col=id_col,
                  start_zoom=start_zoom).select("query_id", id_col)
    votes = (
        points.select(id_col, F.col(label_col).alias("_lbl"))
        .join(F.broadcast(nn), id_col)
        .groupBy("query_id", "_lbl")
        .agg(F.count("*").alias("n_votes"))
    )
    best = F.min(F.struct(
        (-F.col("n_votes")).alias("_neg"),
        F.col("_lbl").alias("label"),
    )).alias("_b")
    return (
        votes.groupBy("query_id").agg(best)
        .select("query_id", F.col("_b.label").alias("label"),
                (-F.col("_b._neg")).alias("n_votes"))
    )


def match_points_to_segments(points: DataFrame, segments: DataFrame,
                             max_m: float,
                             point_id: str = "point_id",
                             lat: str = "lat", lng: str = "lng",
                             line_id: str = "line_id",
                             seg_idx: str = "seg_idx",
                             f_lat: str = "f_lat", f_lng: str = "f_lng",
                             t_lat: str = "t_lat", t_lng: str = "t_lng",
                             broadcast_segments: bool = False,
                             per_line: bool = False) -> DataFrame:
    """Map matching as a distributed filter-refine join: snap every
    probe point to its NEAREST polyline segment within ``max_m``
    meters (the GPS-trace -> road-network primitive; composes S8
    closest_on_segment + S1 haversine, reference latlng.h:78-97 via
    geo/polyline.h, into the spatial-join plan shape of Q2/Q3).

    Plan (both sides are TABLES — the only driver data is the ≤17-int
    list of DISTINCT cover zooms, an aggregate):

      segments -> explode(multi-zoom buffered-bbox cover)   (Arrow UDF)
      points   -> one (zoom, ancestor-cell) key per distinct
                  cover zoom                                 (narrow)
      hash join on (zoom, cell); exact closest-on-segment +
      haversine refine (strict ``< max_m``); per-point min-struct
      argmin with the L6 tie-break order (dist, line_id, seg_idx).

    ``per_line=True`` turns the snap into a CORRIDOR join: the argmin
    groups by (point, line) instead of point, so the result keeps one
    row per polyline within ``max_m`` of the probe (nearest segment of
    that line) rather than only the globally nearest line — the
    "points near any route" primitive. Identical output schema, plan
    unchanged except the aggregate key (still a map-side partial
    min-struct; the exchange carries one candidate-minimum per
    (probe, line, map partition)).

    MULTI-ZOOM cover: each segment picks its own zoom — the finest
    level at which its buffered endpoint-bbox spans <= 2 cells (so a
    pad=0 cover is <= ~9 cells) — capped at the radius zoom (cell
    edge >= max_m). Short network links land on the fine grid; a
    degenerate 1000 km link covers a few coarse cells instead of 10^7
    fine ones (a single fixed fine zoom allocates terabytes of cover
    on long segments — measured before this design). Cover cells and
    point ancestors both live in the shifted-z16 pixel space
    (cell_tile_of_latlng), so the equi-join is exact; cells of one
    segment are distinct, so no (point, segment) pair duplicates.

    Cover recall: a mercator segment's lat/lng bbox is its endpoint
    bbox (merc x/y are monotone in lng/lat), buffered by ``max_m``
    with both degree constants UNDERSTATING the true m/deg (so the
    box strictly dominates the haversine disk), and enumerated with
    pad=0: the corner rectangle under the monotone, probe-identical
    cell_tile_of_latlng mapping is an exact cover of a dominating
    box. The exact refine decides membership.
    """
    earth = 40075016.686
    z_fine = 0
    while z_fine < 16 and earth / (1 << (z_fine + 1)) >= max_m:
        z_fine += 1

    def _buffered_boxes(fla, fln, tla, tln):
        """Shared numpy core: buffered per-segment bbox + cover zoom
        (ONE implementation feeds both the zoom-census pass and the
        cover enumeration, so the point side's ancestor-key zoom set
        can never drift from the keys the cover actually emits)."""
        a_la = fla.to_numpy(np.float64)
        a_ln = fln.to_numpy(np.float64)
        b_la = tla.to_numpy(np.float64)
        b_ln = tln.to_numpy(np.float64)
        d_lat = max_m / 111000.0
        lat_lo = np.minimum(a_la, b_la) - d_lat
        lat_hi = np.maximum(a_la, b_la) + d_lat
        # lng buffer sized at the worst-|lat| corner of the buffered
        # box (smallest cos -> widest degree buffer). 111000 m/deg
        # UNDERSTATES the true 111195 (haversine sphere) on both axes,
        # so both buffers strictly DOMINATE the max_m disk — which is
        # what lets the cover run pad=0 below: cell_tile_of_latlng is
        # monotone and bit-identical to the probe side's z16-shift
        # keys, so the inclusive corner rectangle of a dominating box
        # is an exact cover.
        cos_lo = np.cos(np.radians(np.clip(lat_lo, -89.9, 89.9)))
        cos_hi = np.cos(np.radians(np.clip(lat_hi, -89.9, 89.9)))
        cos_w = np.maximum(np.minimum(cos_lo, cos_hi), 1e-6)
        d_lng = max_m / (111000.0 * cos_w)
        lng_lo = np.minimum(a_ln, b_ln) - d_lng
        lng_hi = np.maximum(a_ln, b_ln) + d_lng
        # per-segment zoom: coarsen until the bbox spans <= 2 cells
        _, _, nx, ny = _cover_ranges(lat_lo, lng_lo, lat_hi, lng_hi,
                                     z_fine, pad=0)
        span = np.maximum(nx, ny)
        dz = np.ceil(np.log2(np.maximum(span / 2.0, 1.0))).astype(np.int64)
        zs = np.maximum(z_fine - dz, 0)
        return lat_lo, lat_hi, lng_lo, lng_hi, zs

    @pandas_udf("int")
    def _seg_zoom(fla: pd.Series, fln: pd.Series,
                  tla: pd.Series, tln: pd.Series) -> pd.Series:
        return pd.Series(_buffered_boxes(fla, fln, tla, tln)[4])

    # combined (cell, zoom) key: (c << 5) | z. One int64 per cover
    # cell keeps the Arrow transfer on the numeric ListArray fast path
    # (an array<struct> return materializes one Python dict PER CELL —
    # measured 10s vs <1s for the same 1.6M-cell cover at sf0.1) and
    # gives the bucket join a single primitive equi-key.
    @pandas_udf("array<long>")
    def _seg_cover(fla: pd.Series, fln: pd.Series,
                   tla: pd.Series, tln: pd.Series) -> pd.Series:
        import pyarrow as pa

        lat_lo, lat_hi, lng_lo, lng_hi, zs = _buffered_boxes(
            fla, fln, tla, tln)
        n_rows = len(zs)
        all_z = np.empty(0, np.int64)
        all_c = np.empty(0, np.int64)
        counts = np.zeros(n_rows, np.int64)
        order = np.empty(0, np.int64)
        for z in np.unique(zs):
            m = zs == z
            idx = np.flatnonzero(m)
            tx1, ty1, nxz, nyz = _cover_ranges(
                lat_lo[m], lng_lo[m], lat_hi[m], lng_hi[m], int(z), pad=0)
            cells, cnts = _enumerate_covers(tx1, ty1, nxz, nyz, int(z))
            all_c = np.concatenate([all_c, cells])
            all_z = np.concatenate([all_z, np.full(len(cells), z, np.int64)])
            counts[idx] = cnts
            order = np.concatenate([order, np.repeat(idx, cnts)])
        # scatter the per-zoom chunks back into input-row order
        perm = np.argsort(order, kind="stable")
        keys = (all_c[perm] << 5) | all_z[perm]
        offsets = np.zeros(n_rows + 1, np.int64)
        np.cumsum(counts, out=offsets[1:])
        return pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(keys, pa.int64())
        ).to_pandas()

    # fan the network out to every core BEFORE the Arrow cover UDF —
    # a network read from one small parquet file otherwise arrives in
    # 1-2 input splits, serializing the UDF (and everything downstream
    # of the spool) onto 2 of N cores
    par = segments.sparkSession.sparkContext.defaultParallelism
    seg = segments.repartition(par).select(
        F.col(line_id).alias("_m_line"),
        F.col(seg_idx).alias("_m_seg"),
        F.col(f_lat).alias("_m_fla"), F.col(f_lng).alias("_m_fln"),
        F.col(t_lat).alias("_m_tla"), F.col(t_lng).alias("_m_tln"),
        F.explode(
            _seg_cover(F.col(f_lat), F.col(f_lng),
                       F.col(t_lat), F.col(t_lng))
        ).alias("_m_key"),
    )
    # zoom census: a zoom-only Arrow pass over the network (no explode,
    # no materialized cover). The only driver data is the <=17-int
    # DISTINCT zoom list; the cover UDF itself then runs exactly once,
    # inside the single join pass (no spool/checkpoint needed).
    zooms = sorted(
        r["_z"] for r in segments.select(
            _seg_zoom(F.col(f_lat), F.col(f_lng),
                      F.col(t_lat), F.col(t_lng)).alias("_z")
        ).distinct().collect()
    )
    if not zooms:  # empty network -> empty result, stable schema
        return (
            points.select(
                F.col(point_id).alias("point_id"),
                F.lit(None).cast("long").alias("line_id"),
                F.lit(None).cast("int").alias("seg_idx"),
                F.lit(None).cast("double").alias("dist_m"),
                F.lit(None).cast("double").alias("c_lat"),
                F.lit(None).cast("double").alias("c_lng"),
            ).limit(0)
        )
    if broadcast_segments:
        seg = F.broadcast(seg)
    # one combined (ancestor-cell << 5 | zoom) key per DISTINCT cover
    # zoom, all shift-derived from one staged z16 projection
    # (cell_tile_of_latlng parity with the cover enumeration)
    px = K.merc_to_pixel_x(K.latlng_to_merc_x(F.col(lng)), 16, tile_size=1)
    py = K.merc_to_pixel_y(K.latlng_to_merc_y(F.col(lat)), 16, tile_size=1)
    pts = points.withColumn("__px16", px).withColumn("__py16", py)
    keys = [
        F.shiftleft(
            F.shiftleft(F.shiftright(F.col("__py16"), 16 - int(z)), int(z))
            + F.shiftright(F.col("__px16"), 16 - int(z)),
            5,
        ) + F.lit(int(z))
        for z in zooms
    ]
    anc = (
        pts.withColumn("_p_key", F.explode(F.array(*keys)))
        .drop("__px16", "__py16")
    )
    # REFINE PLACEMENT. The closest-on-segment + haversine tree must
    # never end up in the JOIN CONDITION: a deterministic pre-agg
    # filter on the exact distance gets folded into bhj_doConsume_0(),
    # whose generated method then "grows beyond 64 KB" and drops the
    # whole streamed stage (Arrow cover UDF + Generate + join) to
    # interpreted mode (measured 26s vs 6s at sf0.1). The exact radius
    # filter therefore runs on the AGGREGATE OUTPUT (a pushdown
    # barrier), while the refine itself — staged through real _cos_*
    # columns, one small generated method per Project — feeds the
    # map-side PARTIAL min-struct aggregate, so the exchange carries
    # one candidate-minimum per (probe, map partition) instead of the
    # raw candidate relation.
    # Conservative candidate prefilter, cheap enough to live in the
    # join condition: the snapped point's latitude lies inside the
    # segment's endpoint-lat interval (mercator y is monotone in lat
    # and closest_on_segment clamps to the endpoints), and great-circle
    # distance >= R·|Δφ| = 111,194.9 m/deg — understated to 111,000 so
    # the bound strictly dominates. Drops only pairs whose exact dist
    # must exceed max_m, so the post-agg radius filter sees the same
    # argmin. Unlike the full refine tree, this is a few hundred bytes
    # of generated code — fine inside bhj_doConsume.
    lat_gap_m = 111000.0 * F.greatest(
        F.lit(0.0),
        F.least(F.col("_m_fla"), F.col("_m_tla")) - F.col(lat),
        F.col(lat) - F.greatest(F.col("_m_fla"), F.col("_m_tla")),
    )
    # NO repartition here: groupBy(point_id) below plans a map-side
    # partial min-struct aggregate, so only one candidate-minimum per
    # (probe, map partition) reaches the exchange. An explicit
    # repartition(point_id) shuffles the RAW candidate relation —
    # measured ENOSPC (>37 GB spill) at 12M segments x 1.2M probes.
    pairs = (
        anc.join(seg, F.col("_p_key") == F.col("_m_key"), "inner")
        .filter(lat_gap_m < F.lit(float(max_m)))
        .select(F.col(point_id).alias("point_id"),
                F.col(lat).alias("_p_lat"), F.col(lng).alias("_p_lng"),
                "_m_line", "_m_seg",
                "_m_fla", "_m_fln", "_m_tla", "_m_tln")
    )
    scored = K.with_closest_on_segment(
        pairs, "_p_lat", "_p_lng", "_m_fla", "_m_fln", "_m_tla", "_m_tln",
        "_m_cla", "_m_cln",
    ).withColumn("_m_dist", K.distance(
        F.col("_p_lat"), F.col("_p_lng"), F.col("_m_cla"), F.col("_m_cln")))
    if per_line:
        best_line = F.min(F.struct(
            F.col("_m_dist").alias("dist_m"),
            F.col("_m_seg").alias("seg_idx"),
            F.col("_m_cla").alias("c_lat"),
            F.col("_m_cln").alias("c_lng"),
        )).alias("_b")
        return (
            scored.groupBy("point_id", "_m_line")
            .agg(best_line)
            .filter(F.col("_b").getField("dist_m") < F.lit(float(max_m)))
            .select(
                "point_id",
                F.col("_m_line").alias("line_id"),
                F.col("_b.seg_idx").alias("seg_idx"),
                F.col("_b.dist_m").alias("dist_m"),
                F.col("_b.c_lat").alias("c_lat"),
                F.col("_b.c_lng").alias("c_lng"),
            )
        )
    best = F.min(F.struct(
        F.col("_m_dist").alias("dist_m"),
        F.col("_m_line").alias("line_id"),
        F.col("_m_seg").alias("seg_idx"),
        F.col("_m_cla").alias("c_lat"),
        F.col("_m_cln").alias("c_lng"),
    )).alias("_b")
    # the radius filter runs AFTER the argmin, on the aggregate output
    # (equivalent: the min struct is ordered by dist_m first, so
    # best.dist_m < max_m  <=>  some candidate < max_m). A pre-agg
    # filter on _m_dist is deterministic, so Catalyst pushes it down
    # THROUGH the repartition into the broadcast join's non-equi
    # condition — inlining the whole closest-on-segment + haversine
    # tree into bhj_doConsume_0(), which blows the 64 KB method limit
    # and drops the streamed cover stage (Arrow UDF + Generate + join)
    # to interpreted mode. Filters on aggregate outputs are a pushdown
    # barrier, so this keeps the big streamed stage expression-free.
    return (
        scored.groupBy("point_id")
        .agg(best)
        .filter(F.col("_b").getField("dist_m") < F.lit(float(max_m)))
        .select(
            "point_id",
            F.col("_b.line_id").alias("line_id"),
            F.col("_b.seg_idx").alias("seg_idx"),
            F.col("_b.dist_m").alias("dist_m"),
            F.col("_b.c_lat").alias("c_lat"),
            F.col("_b.c_lng").alias("c_lng"),
        )
    )


def corridor_join(points: DataFrame, segments: DataFrame, max_m: float,
                  **kw) -> DataFrame:
    """Corridor join: every (probe point, polyline) pair whose
    closest-on-segment distance is under ``max_m`` meters — "which
    routes pass within d of this point" / "which points lie inside
    this route's corridor". The multi-zoom filter-refine plan of
    :func:`match_points_to_segments` with the argmin grouped per
    (point, line); see there for the scale analysis. Returns
    (point_id, line_id, seg_idx, dist_m, c_lat, c_lng) — one row per
    line within the corridor, nearest segment of that line.

    Reference analogue: L6 distance_to_polyline (polyline.h:79-96)
    lifted from a per-call scalar to a distributed all-pairs join."""
    return match_points_to_segments(points, segments, max_m,
                                    per_line=True, **kw)


# ---------------------------------------------------------------------------
# Box-overlap join — rectangle x rectangle spatial join (Q8 as a JOIN)
# ---------------------------------------------------------------------------
def _box_cover_cols(zoom: int, min_lat: str, min_lng: str,
                    max_lat: str, max_lng: str):
    """(tx1, tx2, ty1, ty2) integer tile ranges of a lat/lng box on the
    continuous mercator grid at ``zoom`` (closed ranges; lng=180 maps
    to tx=2^z unclamped, same convention as the reference tiles)."""
    from geospark.cells import ctile_x, ctile_y

    tx1 = F.floor(ctile_x(F.col(min_lng), zoom))
    tx2 = F.floor(ctile_x(F.col(max_lng), zoom))
    ty1 = F.floor(ctile_y(F.col(max_lat), zoom))   # y grows southward
    ty2 = F.floor(ctile_y(F.col(min_lat), zoom))
    return tx1, tx2, ty1, ty2


def box_overlap_join(a: DataFrame, b: DataFrame, zoom: int,
                     cover_limit: int = 64) -> DataFrame:
    """Join two rectangle relations on interior-overlap — the rectangle
    counterpart of pip_join, turning the reference's box::overlaps /
    box::contains predicates (box.h) into a distributed JOIN.

    Inputs both carry (box_id, min_lat, min_lng, max_lat, max_lng).
    Output: (id_a, id_b, a_contains_b, b_contains_a), one row per
    overlapping pair.

    Two-tier filter-refine (the classic large-object split of spatial
    join literature):

    - SMALL boxes (cover at ``zoom`` <= cover_limit cells) explode to
      their cover tiles with a pure-JVM sequence() — no UDF — and
      equi-join on (tile_x, tile_y); candidate pairs are deduped
      before the exact Column-predicate refine, so refine cost is one
      codegen pass over unique candidates.
    - BIG boxes (the long tail: continent-scale query windows) would
      explode the cover, so they broadcast-nested-loop against the
      other side instead. The three branches (bigA x allB,
      bigB x smallA, smallA x smallB) partition the pair space — no
      double counting, no pair missed.

    At 10^12 rows the small-small branch is one shuffle on tile keys
    (AQE skew-join handles hot cities); the big branches are bounded
    by the number of oversized boxes, which callers keep broadcast-
    small (query windows, admin regions)."""
    def prep(df: DataFrame, side: str):
        tx1, tx2, ty1, ty2 = _box_cover_cols(
            zoom, "min_lat", "min_lng", "max_lat", "max_lng")
        sel = df.select(
            F.col("box_id").alias(f"id_{side}"),
            F.col("min_lat").alias(f"{side}_min_lat"),
            F.col("min_lng").alias(f"{side}_min_lng"),
            F.col("max_lat").alias(f"{side}_max_lat"),
            F.col("max_lng").alias(f"{side}_max_lng"),
            tx1.alias("_tx1"), tx2.alias("_tx2"),
            ty1.alias("_ty1"), ty2.alias("_ty2"),
        ).withColumn(
            "_ncells",
            (F.col("_tx2") - F.col("_tx1") + 1)
            * (F.col("_ty2") - F.col("_ty1") + 1),
        )
        return sel

    def cover(df: DataFrame) -> DataFrame:
        return df.select(
            "*",
            F.explode(F.expr("sequence(_tx1, _tx2)")).alias("_tx"),
        ).select(
            "*",
            F.explode(F.expr("sequence(_ty1, _ty2)")).alias("_ty"),
        )

    pa, pb = prep(a, "a"), prep(b, "b")
    big_a = pa.filter(F.col("_ncells") > cover_limit)
    small_a = pa.filter(F.col("_ncells") <= cover_limit)
    big_b = pb.filter(F.col("_ncells") > cover_limit)
    small_b = pb.filter(F.col("_ncells") <= cover_limit)

    ac = [F.col(c) for c in ("a_min_lat", "a_min_lng",
                             "a_max_lat", "a_max_lng")]
    bc = [F.col(c) for c in ("b_min_lat", "b_min_lng",
                             "b_max_lat", "b_max_lng")]
    overlap = K.box_overlaps_box(*ac, *bc)

    drop = ["_tx1", "_tx2", "_ty1", "_ty2", "_ncells"]
    small_small = (
        cover(small_a).drop(*drop)
        .join(cover(small_b).drop(*drop), ["_tx", "_ty"])
        .dropDuplicates(["id_a", "id_b"])
        .filter(overlap)
        .drop("_tx", "_ty")
    )
    big_a_all = (
        F.broadcast(big_a.drop(*drop))
        .crossJoin(pb.drop(*drop))
        .filter(overlap)
    )
    small_a_big_b = (
        small_a.drop(*drop)
        .crossJoin(F.broadcast(big_b.drop(*drop)))
        .filter(overlap)
    )
    out = small_small.unionByName(big_a_all).unionByName(small_a_big_b)
    return out.select(
        "id_a", "id_b",
        K.box_contains_box(*ac, *bc).alias("a_contains_b"),
        K.box_contains_box(*bc, *ac).alias("b_contains_a"),
    )


# ---------------------------------------------------------------------------
# Segment-intersection join — exact line x line crossing detection
# ---------------------------------------------------------------------------
def _orient_sign(px, py, qx, qy, rx, ry):
    """sign of the 2D cross product (q-p) x (r-p): +1 / -1 / 0."""
    d = (qx - px) * (ry - py) - (qy - py) * (rx - px)
    return F.when(d > 0, F.lit(1)).when(d < 0, F.lit(-1)).otherwise(F.lit(0))


def segments_intersect_expr(prefix_a: str = "a_", prefix_b: str = "b_"):
    """Column predicate: do segments a and b intersect (touching
    counts)? Standard orientation test with collinear on-segment
    handling, in planar lat/lng space (same planar convention as the
    engine's default PIP winding). Pure codegen arithmetic — the
    DuckDB oracle evaluates the identical formula term for term."""
    ax0, ay0 = F.col(f"{prefix_a}f_lng"), F.col(f"{prefix_a}f_lat")
    ax1, ay1 = F.col(f"{prefix_a}t_lng"), F.col(f"{prefix_a}t_lat")
    bx0, by0 = F.col(f"{prefix_b}f_lng"), F.col(f"{prefix_b}f_lat")
    bx1, by1 = F.col(f"{prefix_b}t_lng"), F.col(f"{prefix_b}t_lat")
    o1 = _orient_sign(ax0, ay0, ax1, ay1, bx0, by0)
    o2 = _orient_sign(ax0, ay0, ax1, ay1, bx1, by1)
    o3 = _orient_sign(bx0, by0, bx1, by1, ax0, ay0)
    o4 = _orient_sign(bx0, by0, bx1, by1, ax1, ay1)

    def on_seg(px, py, qx, qy, rx, ry):
        # r collinear with pq already known; is r within pq's bbox?
        return (
            (rx >= F.least(px, qx)) & (rx <= F.greatest(px, qx))
            & (ry >= F.least(py, qy)) & (ry <= F.greatest(py, qy))
        )

    proper = (o1 != o2) & (o3 != o4)
    touch = (
        ((o1 == 0) & on_seg(ax0, ay0, ax1, ay1, bx0, by0))
        | ((o2 == 0) & on_seg(ax0, ay0, ax1, ay1, bx1, by1))
        | ((o3 == 0) & on_seg(bx0, by0, bx1, by1, ax0, ay0))
        | ((o4 == 0) & on_seg(bx0, by0, bx1, by1, ax1, ay1))
    )
    return proper | touch


def segment_intersection_join(a: DataFrame, b: DataFrame,
                              zoom: int = 14) -> DataFrame:
    """All intersecting segment pairs between two segment relations —
    the line-crossing join a road/trajectory engine needs (conflation,
    turn detection, trajectory x boundary crossings). Inputs carry
    (seg_id, f_lat, f_lng, t_lat, t_lng).

    Filter-refine: each side is scanline-supercover-rasterized to
    tiles at ``zoom`` (cells.segment_tile_cover — O(answer) JVM
    explode, no bbox blowup on long diagonals), candidates equi-join
    on the tile, dedup, then the exact orientation predicate refines.
    Two segments that intersect share the tile containing the
    intersection point, so the cover join is recall-complete."""
    from geospark.cells import segment_tile_cover

    def cov(df: DataFrame, side: str) -> DataFrame:
        pref = f"{side}_"
        sel = df.select(
            F.col("seg_id").alias(f"id_{side}"),
            F.col("f_lat").alias(f"{pref}f_lat"),
            F.col("f_lng").alias(f"{pref}f_lng"),
            F.col("t_lat").alias(f"{pref}t_lat"),
            F.col("t_lng").alias(f"{pref}t_lng"),
        )
        return segment_tile_cover(
            sel, zoom, lat0=f"{pref}f_lat", lng0=f"{pref}f_lng",
            lat1=f"{pref}t_lat", lng1=f"{pref}t_lng",
        )

    cand = (
        cov(a, "a")
        .join(cov(b, "b"), ["tile_x", "tile_y"])
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.filter(segments_intersect_expr())
        .select("id_a", "id_b")
    )

# ---------------------------------------------------------------------------
# Polygon x polygon overlap join — the missing pair in the join family
# (pip_join is point x polygon, box_overlap_join is rect x rect,
# segment_intersection_join is line x line)
# ---------------------------------------------------------------------------
def _ring_reps(rings: DataFrame, side: str,
               area: str, ring_col: str) -> DataFrame:
    """One representative vertex per RING (its first vertex). If no
    boundary crossing exists between two polygons, each ring lies
    wholly inside or outside the other polygon, so any single vertex
    decides containment for the whole ring; a representative lying ON
    the other boundary is already reported by the edge predicate
    (touch counts), so the strict even-odd test never has to resolve
    it."""
    return rings.select(
        F.col(area).alias(f"id_{side}"),
        F.monotonically_increasing_id().alias("_ring_uid"),
        F.element_at(F.col(ring_col), 1)["lat"].alias("_rep_lat"),
        F.element_at(F.col(ring_col), 1)["lng"].alias("_rep_lng"),
    )


def _even_odd_flag(pairs: DataFrame, reps: DataFrame, edges: DataFrame,
                   rep_side: str, edge_side: str, flag: str) -> DataFrame:
    """(id_a, id_b, flag): 1 iff ANY ring-representative of
    ``rep_side`` falls strictly inside the ``edge_side`` polygon by
    even-odd parity over ALL its rings (outer + holes together — the
    same half-open west-ray arithmetic as joins._ring_contains /
    geodata.ring_pip_sql, so oracles reproduce it term for term).
    Restricted to candidate ``pairs`` so cost is candidates x edges of
    the partner polygon, never all-pairs."""
    j = pairs.join(reps, f"id_{rep_side}").join(edges, f"id_{edge_side}")
    plat, plng = F.col("_rep_lat"), F.col("_rep_lng")
    y0, y1 = F.col("lat0"), F.col("lat1")
    x0, x1 = F.col("lng0"), F.col("lng1")
    crosses = (y0 > plat) != (y1 > plat)
    xint = (x1 - x0) * (plat - y0) / (y1 - y0) + x0
    hit = (crosses & (plng < xint)).cast("int")
    par = j.groupBy("id_a", "id_b", "_ring_uid").agg(
        (F.sum(hit) % 2).alias("_par")
    )
    return par.groupBy("id_a", "id_b").agg(F.max("_par").alias(flag))


def polygon_overlap_join(a: DataFrame, b: DataFrame, zoom: int = 6,
                         area_a: str = "area_id", ring_a: str = "ring",
                         area_b: str = "area_id",
                         ring_b: str = "ring") -> DataFrame:
    """All overlapping polygon pairs between two polygon layers —
    the overlay join (admin region x admin region, footprint x zone).
    Inputs carry one row per RING: (area_id, ring:
    array<struct<lat,lng>>) — outer rings and holes alike, hole
    membership by even-odd parity (Q15-equivalent for properly nested
    layers). Planar lat/lng space, closed semantics: touching counts.

    Exact decomposition: A and B overlap iff
      (1) an edge of A intersects an edge of B         [edge_cross], or
      (2) some ring of A lies strictly inside B        [a_in_b], or
      (3) some ring of B lies strictly inside A        [b_in_a].
    With no boundary crossing, every ring is wholly in or out of the
    other polygon, so (2)/(3) reduce to one even-odd test per ring
    representative; a hole ring inside the other polygon still
    witnesses overlap because the hole boundary belongs to the closed
    point set.

    Scale shape, three filter-refine relations (never all-pairs):
      - candidates: polygon_tile_cover at ``zoom`` (perimeter+area
        cost, exact "tile touches area") equi-joined on the tile —
        recall-complete because any shared point's tile is in both
        covers;
      - edge_cross: ring edges scanline-supercovered to tiles,
        equi-join, exact orientation refine (the
        segment_intersection_join plan inlined, keyed by polygon id);
      - containment: candidate pairs x partner edges, grouped parity.

    Output: (id_a, id_b, edge_cross, a_in_b, b_in_a) ints, one row
    per overlapping pair."""
    from geospark.cells import segment_tile_cover
    from geospark.raster import polygon_tile_cover, ring_edges

    a_rings = a.select(F.col(area_a).alias("area_id"),
                       F.col(ring_a).alias("ring"))
    b_rings = b.select(F.col(area_b).alias("area_id"),
                       F.col(ring_b).alias("ring"))

    cov_a = polygon_tile_cover(a_rings, zoom).select(
        F.col("area_id").alias("id_a"), "tile_x", "tile_y")
    cov_b = polygon_tile_cover(b_rings, zoom).select(
        F.col("area_id").alias("id_b"), "tile_x", "tile_y")
    cand = (
        cov_a.join(cov_b, ["tile_x", "tile_y"])
        .select("id_a", "id_b").distinct()
    )

    ea = ring_edges(a_rings).select(
        F.col("area_id").alias("id_a"),
        F.col("lat0").alias("a_f_lat"), F.col("lng0").alias("a_f_lng"),
        F.col("lat1").alias("a_t_lat"), F.col("lng1").alias("a_t_lng"),
    )
    eb = ring_edges(b_rings).select(
        F.col("area_id").alias("id_b"),
        F.col("lat0").alias("b_f_lat"), F.col("lng0").alias("b_f_lng"),
        F.col("lat1").alias("b_t_lat"), F.col("lng1").alias("b_t_lng"),
    )
    cov_ea = segment_tile_cover(ea, zoom, lat0="a_f_lat", lng0="a_f_lng",
                                lat1="a_t_lat", lng1="a_t_lng")
    cov_eb = segment_tile_cover(eb, zoom, lat0="b_f_lat", lng0="b_f_lng",
                                lat1="b_t_lat", lng1="b_t_lng")
    cross = (
        cov_ea.join(cov_eb, ["tile_x", "tile_y"])
        .filter(segments_intersect_expr())
        .select("id_a", "id_b").distinct()
        .withColumn("edge_cross", F.lit(1))
    )

    reps_a = _ring_reps(a_rings, "a", "area_id", "ring")
    reps_b = _ring_reps(b_rings, "b", "area_id", "ring")
    edges_a = ring_edges(a_rings).select(
        F.col("area_id").alias("id_a"), "lat0", "lng0", "lat1", "lng1")
    edges_b = ring_edges(b_rings).select(
        F.col("area_id").alias("id_b"), "lat0", "lng0", "lat1", "lng1")
    a_in_b = _even_odd_flag(cand, reps_a, edges_b, "a", "b", "a_in_b")
    b_in_a = _even_odd_flag(cand, reps_b, edges_a, "b", "a", "b_in_a")

    flags = (
        cand.join(cross, ["id_a", "id_b"], "left")
        .join(a_in_b, ["id_a", "id_b"], "left")
        .join(b_in_a, ["id_a", "id_b"], "left")
        .select(
            "id_a", "id_b",
            F.coalesce("edge_cross", F.lit(0)).alias("edge_cross"),
            F.coalesce("a_in_b", F.lit(0)).cast("int").alias("a_in_b"),
            F.coalesce("b_in_a", F.lit(0)).cast("int").alias("b_in_a"),
        )
    )
    return flags.filter(
        (F.col("edge_cross") + F.col("a_in_b") + F.col("b_in_a")) > 0
    )


def polygon_dissolve(rings: DataFrame, zoom: int = 6,
                     area: str = "area_id",
                     ring_col: str = "ring") -> DataFrame:
    """GIS dissolve: label every polygon with its overlap COMPONENT —
    transitively overlapping polygons (closed semantics, touching
    counts) share a component id (the min area_id, the engine's
    canonical labeling). Output: (area_id, component, is_merged).

    Composition of two existing scale shapes: the polygon x polygon
    overlap self-join supplies the edge relation (tile-cover
    candidates, exact refine), graph.connected_components contracts
    it in O(log n) large/small-star rounds — no driver geometry, no
    all-pairs stage anywhere. Isolated polygons keep their own id
    (coalesce on the left join, the CC contract)."""
    from geospark.graph import connected_components

    pairs = (
        polygon_overlap_join(rings, rings, zoom,
                             area_a=area, ring_a=ring_col,
                             area_b=area, ring_b=ring_col)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    cc = connected_components(pairs, "id_a", "id_b")
    ids = rings.select(F.col(area).alias("area_id")).distinct()
    return ids.join(
        cc.withColumnRenamed("node", "area_id"), "area_id", "left"
    ).select(
        "area_id",
        F.coalesce("component", "area_id").alias("component"),
        (F.col("component").isNotNull()).cast("int").alias("is_merged"),
    )
