"""Deterministic geo view over the driver's testdata + SQL generators.

The driver's correctness gate compares ``queries()`` (Spark) against
``oracle_sql()`` (DuckDB) on the same parquet tables. The testdata has
no coordinates, so both sides derive them with the SAME pure-integer
arithmetic (bit-identical IEEE doubles in any engine):

    lat = ((event_id * 7919)   % 16000) / 100.0 - 80.0    in [-80, 80)
    lng = ((event_id * 104729) % 36000) / 100.0 - 180.0   in [-180, 180)

This module also generates ANSI-SQL equivalents of the engine's
Column kernels (web-mercator tile assignment with the x-truncate /
y-round asymmetry, Morton cell spread, haversine, ray-cast PIP) so
the DuckDB oracle evaluates the *same formulas*, term by term.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geospark.functions import kernels as K

# --- shared constants, inlined as exact repr() literals in SQL -------------
MERC_R = repr(K.MERC_EARTH_RADIUS)          # 6378137.0
SHIFT = repr(K.MERC_ORIGIN_SHIFT)           # 20037508.342789244
MAXLAT = repr(K.MERC_MAX_LATITUDE)
EARTH_R = repr(K.EARTH_RADIUS_M)


def events_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select(
        "event_id",
        (((F.col("event_id") * 7919) % 16000) / 100.0 - 80.0).alias("lat"),
        (((F.col("event_id") * 104729) % 36000) / 100.0 - 180.0).alias("lng"),
        "event_type",
        "user_id",
        "ts",
        "value",
    )


EVENTS_POINTS_SQL = """
SELECT event_id,
       ((event_id * 7919) % 16000) / 100.0 - 80.0 AS lat,
       ((event_id * 104729) % 36000) / 100.0 - 180.0 AS lng,
       event_type, user_id, ts, value
FROM events
"""


def events_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic ROAD NETWORK over the events table: one short segment
    per event, from the event point to a deterministic offset of at
    most ~0.004 deg (~450 m) — realistic network-link lengths, unlike
    consecutive random event points (whose lag-pairs are
    transcontinental and collapse every cover to a handful of coarse
    cells, degenerating the map-match join toward a cross product at
    scale). Same pure-integer arithmetic contract as events_points so
    the DuckDB/Python oracle reproduces bit-identical doubles.

        dlat = ((event_id * 131) % 800) / 100000.0 - 0.004
        dlng = ((event_id * 137) % 800) / 100000.0 - 0.004
        t_lng clamped at -180.0 (lng min is exactly -180.0)

    Columns: (line_id=user_id, seg_idx=event_id, f_lat, f_lng,
    t_lat, t_lng)."""
    pts = events_points(spark, sf_dir)
    dlat = ((F.col("event_id") * 131) % 800) / 100000.0 - 0.004
    dlng = ((F.col("event_id") * 137) % 800) / 100000.0 - 0.004
    return pts.select(
        F.col("user_id").alias("line_id"),
        F.col("event_id").cast("int").alias("seg_idx"),
        F.col("lat").alias("f_lat"),
        F.col("lng").alias("f_lng"),
        (F.col("lat") + dlat).alias("t_lat"),
        F.greatest(F.col("lng") + dlng, F.lit(-180.0)).alias("t_lng"),
    )


def events_segments_py(event_id: int, user_id: int, lat: float,
                       lng: float) -> tuple[int, int, float, float,
                                            float, float]:
    """Pure-Python twin of one events_segments row (IEEE-double
    identical: integer products are exact, /1e5 and +/- round the
    same in every engine)."""
    dlat = ((event_id * 131) % 800) / 100000.0 - 0.004
    dlng = ((event_id * 137) % 800) / 100000.0 - 0.004
    return (user_id, int(event_id), lat, lng, lat + dlat,
            max(lng + dlng, -180.0))


# ---------------------------------------------------------------------------
# SQL twins of the Column kernels (formula-identical, constants inlined)
# ---------------------------------------------------------------------------
def merc_x_sql(lng: str) -> str:
    return f"({MERC_R} * radians({lng}))"


def merc_y_sql(lat: str) -> str:
    clamped = f"greatest(-{MAXLAT}, least({MAXLAT}, {lat}))"
    s = f"sin(radians({clamped}))"
    return f"({MERC_R} * ln((1.0 + {s}) / (1.0 - {s})) / 2.0)"


def pixel_x_sql(lng: str, z: int, tile_size: int = 4096) -> str:
    res = repr(K.resolution(z, tile_size))
    return f"floor(({merc_x_sql(lng)} + {SHIFT}) / {res})"


def pixel_y_sql(lat: str, z: int, tile_size: int = 4096) -> str:
    res = repr(K.resolution(z, tile_size))
    ms = repr(float(K.map_size(z, tile_size)))
    return f"floor(({ms} - (({merc_y_sql(lat)} + {SHIFT}) / {res})) + 0.5)"


def tile_x_sql(lng: str, z: int, tile_size: int = 4096) -> str:
    return f"CAST(floor({pixel_x_sql(lng, z, tile_size)} / {tile_size}) AS BIGINT)"


def tile_y_sql(lat: str, z: int, tile_size: int = 4096) -> str:
    return f"CAST(floor({pixel_y_sql(lat, z, tile_size)} / {tile_size}) AS BIGINT)"


def _spread16_sql(v: str) -> str:
    """Morton bit-spread (matches kernels._morton_spread_16)."""
    e = f"(({v}) & 65535)"
    e = f"((({e} | ({e} << 8)) & 16711935))"
    e = f"((({e} | ({e} << 4)) & 252645135))"
    e = f"((({e} | ({e} << 2)) & 858993459))"
    e = f"((({e} | ({e} << 1)) & 1431655765))"
    return e


def cell_sql(lat: str, lng: str, zoom: int) -> str:
    """tile_hash_32 prefix cell at `zoom` (S10, src/latlng.cc:75-96)."""
    px = f"CAST({pixel_x_sql(lng, 16, 1)} AS BIGINT)"
    py = f"CAST({pixel_y_sql(lat, 16, 1)} AS BIGINT)"
    full = f"({_spread16_sql(px)} | ({_spread16_sql(py)} << 1))"
    if zoom == 16:
        return full
    return f"({full} >> {2 * (16 - zoom)})"


def haversine_sql(lat1: str, lng1: str, lat2: str, lng2: str) -> str:
    """S1 (src/latlng.cc:29-31), formula-identical to kernels.distance."""
    dlat = f"(radians(({lat2}) - ({lat1})) / 2.0)"
    dlng = f"(radians(({lng2}) - ({lng1})) / 2.0)"
    a = (
        f"(sin({dlat}) * sin({dlat}) + cos(radians({lat1})) * "
        f"cos(radians({lat2})) * sin({dlng}) * sin({dlng}))"
    )
    return f"(2.0 * {EARTH_R} * asin(least(1.0, sqrt({a}))))"


def bearing_sql(lat1: str, lng1: str, lat2: str, lng2: str) -> str:
    """S5 (src/latlng.cc:44-54), formula-identical to kernels.bearing."""
    dlng = f"(radians({lng2}) - radians({lng1}))"
    cos2 = f"cos(radians({lat2}))"
    b = (
        f"atan2(sin({dlng}) * {cos2}, "
        f"cos(radians({lat1})) * sin(radians({lat2})) - "
        f"sin(radians({lat1})) * {cos2} * cos({dlng}))"
    )
    two_pi = repr(2.0 * K.PI)
    return f"degrees(fmod(({b}) + {two_pi}, {two_pi}))"


def destination_sql(lat: str, lng: str, dist_m: str, bearing_deg: str) -> tuple[str, str]:
    """S7 destination_point (src/latlng.cc:197-221), formula-identical
    to kernels.destination_point. Returns (lat_expr, lng_expr)."""
    lat_r = f"radians({lat})"
    b_r = f"radians({bearing_deg})"
    ang = f"(({dist_m}) / {EARTH_R})"
    lat_dest = (
        f"asin(sin({lat_r}) * cos({ang}) + "
        f"cos({lat_r}) * sin({ang}) * cos({b_r}))"
    )
    lng_dest = (
        f"(radians({lng}) + atan2(sin({b_r}) * sin({ang}) * cos({lat_r}), "
        f"cos({ang}) - sin({lat_r}) * sin({lat_dest})))"
    )
    return f"degrees({lat_dest})", f"degrees({lng_dest})"


def midpoint_sql(lat1: str, lng1: str, lat2: str, lng2: str) -> tuple[str, str]:
    """S6 midpoint (src/latlng.cc:57-73) in DEGREES (the reference
    quirkily returns radians; kernels.midpoint converts — so does this).
    Returns (lat_expr, lng_expr)."""
    d_lng = f"radians(({lng2}) - ({lng1}))"
    a_lat, b_lat = f"radians({lat1})", f"radians({lat2})"
    b_x = f"(cos({b_lat}) * cos({d_lng}))"
    b_y = f"(cos({b_lat}) * sin({d_lng}))"
    mid_lat = (
        f"atan2(sin({a_lat}) + sin({b_lat}), "
        f"sqrt((cos({a_lat}) + {b_x}) * (cos({a_lat}) + {b_x}) + {b_y} * {b_y}))"
    )
    mid_lng = f"(radians({lng1}) + atan2({b_y}, cos({a_lat}) + {b_x}))"
    return f"degrees({mid_lat})", f"degrees({mid_lng})"


APPROX_LAT_SCALE = repr(K.APPROX_DISTANCE_LAT_DEGREES)
EPS = repr(K.EPSILON)


def approx_lng_scale_sql(lat: str, lng: str) -> str:
    """S4 approx_distance_lng_degrees (src/latlng.cc:19-23): haversine
    to the point one degree of lng toward 0."""
    lng2 = f"(CASE WHEN ({lng}) < 0.0 THEN ({lng}) + 1.0 ELSE ({lng}) - 1.0 END)"
    return haversine_sql(lat, lng, lat, lng2)


def approx_sq_closest_sql(x_lat: str, x_lng: str, f_lat: str, f_lng: str,
                          t_lat: str, t_lng: str, scale: str) -> str:
    """S9 approx squared distance to a segment (src/latlng.cc:148-193),
    formula-identical to kernels.approx_closest_on_segment's sq output.
    Pure rational arithmetic — bit-identical across engines."""
    def to_x(lng):
        xd = f"(({lng}) - ({x_lng}))"
        return (
            f"((CASE WHEN {xd} > 180.0 THEN 360.0 - abs({xd}) "
            f"ELSE {xd} END) * ({scale}))"
        )

    def to_y(lat):
        return f"((({lat}) - ({x_lat})) * {APPROX_LAT_SCALE})"

    fx, fy = to_x(f_lng), to_y(f_lat)
    tx, ty = to_x(t_lng), to_y(t_lat)
    eq_from = f"(abs({fx}) < {EPS} AND abs({fy}) < {EPS})"
    eq_to = f"(abs({tx}) < {EPS} AND abs({ty}) < {EPS})"
    seg_x, seg_y = f"(({tx}) - ({fx}))", f"(({ty}) - ({fy}))"
    sq_len = f"({seg_x} * {seg_x} + {seg_y} * {seg_y})"
    dot_from = f"((0.0 - ({fx})) * {seg_x} + (0.0 - ({fy})) * {seg_y})"
    dot_to = (
        f"((0.0 - ({tx})) * (({fx}) - ({tx})) + "
        f"(0.0 - ({ty})) * (({fy}) - ({ty})))"
    )
    pos_x = f"((({fx}) * {dot_to} + ({tx}) * {dot_from}) / {sq_len})"
    pos_y = f"((({fy}) * {dot_to} + ({ty}) * {dot_from}) / {sq_len})"
    sq_f = f"(({fx}) * ({fx}) + ({fy}) * ({fy}))"
    sq_t = f"(({tx}) * ({tx}) + ({ty}) * ({ty}))"
    return (
        f"(CASE WHEN {eq_from} THEN {sq_f} "
        f"WHEN {eq_to} THEN {sq_t} "
        f"WHEN {sq_len} < {EPS} THEN {sq_f} "
        f"WHEN {dot_from} < 0.0 THEN {sq_f} "
        f"WHEN {dot_to} < 0.0 THEN {sq_t} "
        f"ELSE ({pos_x} * {pos_x} + {pos_y} * {pos_y}) END)"
    )


def xyz_chord_sql(lat1: str, lng1: str, lat2: str, lng2: str) -> str:
    """S12 xyz chord distance (xyz.h:17-36): 2R·asin(‖a−b‖),
    formula-identical to kernels.xyz + haversine_distance_xyz."""
    def xyz(lat, lng):
        return (
            f"(0.5 * cos(radians({lat})) * sin(radians({lng})))",
            f"(0.5 * cos(radians({lat})) * cos(radians({lng})))",
            f"(0.5 * sin(radians({lat})))",
        )

    x1, y1, z1 = xyz(lat1, lng1)
    x2, y2, z2 = xyz(lat2, lng2)
    r = (
        f"sqrt(({x1} - {x2}) * ({x1} - {x2}) + ({y1} - {y2}) * ({y1} - {y2}) "
        f"+ ({z1} - {z2}) * ({z1} - {z2}))"
    )
    return f"(2.0 * {EARTH_R} * asin({r}))"


def ring_pip_sql(lat: str, lng: str, ring: np.ndarray) -> str:
    """Unrolled even-odd ray-cast parity for a fixed ring — the exact
    arithmetic of joins._ring_contains, as chained boolean XOR (<>).
    Horizontal edges are skipped exactly as the UDF does."""
    ring = np.asarray(ring, np.float64)
    ys, xs = ring[:, 0], ring[:, 1]
    terms = []
    n = len(ring)
    for i in range(n):
        y1, x1 = repr(ys[i]), repr(xs[i])
        y2, x2 = repr(ys[(i + 1) % n]), repr(xs[(i + 1) % n])
        if ys[i] == ys[(i + 1) % n]:
            continue
        xint = f"(({x2} - {x1}) * (({lat}) - {y1}) / ({y2} - {y1}) + {x1})"
        terms.append(
            f"CAST(((({y1} > ({lat})) <> ({y2} > ({lat}))) "
            f"AND (({lng}) < {xint})) AS INT)"
        )
    if not terms:
        return "FALSE"
    # balanced additive tree: a flat N-term `+` chain binds as an
    # N-deep left-nested tree and overflows DuckDB's binder recursion
    # limit (128) on densified rings (~270 edges); pairwise grouping
    # keeps the depth O(log N) with the identical sum
    while len(terms) > 1:
        terms = [
            f"({terms[i]} + {terms[i + 1]})" if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    return f"(({terms[0]}) % 2 = 1)"


def area_pip_sql(lat: str, lng: str, outers: list[np.ndarray],
                 inners: list[list[np.ndarray]] | None = None) -> str:
    """Q15 semantics: OR over (outer AND NOT any-hole)."""
    inners = inners or [[] for _ in outers]
    parts = []
    for outer, holes in zip(outers, inners):
        expr = ring_pip_sql(lat, lng, outer)
        for h in holes:
            expr = f"({expr} AND NOT {ring_pip_sql(lat, lng, h)})"
        parts.append(expr)
    return "(" + " OR ".join(parts) + ")"


# ---------------------------------------------------------------------------
# Shared demo fixtures: polygon layer + query centers
# ---------------------------------------------------------------------------
# Vertices intentionally avoid the events 0.01° lattice so no point
# ever sits exactly on an edge (strict vs non-strict agree).
DEMO_RINGS: dict[int, dict] = {
    1: {  # Europe-ish pentagon with a hole
        "outers": [np.array([
            (35.123456, -10.234567), (60.654321, -5.765432),
            (70.111111, 20.222222), (55.333333, 40.444444),
            (36.555555, 25.666666),
        ])],
        "inners": [[np.array([
            (45.123457, 5.234561), (52.987655, 10.876543), (46.543211, 20.135791),
        ])]],
    },
    2: {  # North-America quad
        "outers": [np.array([
            (25.135791, -125.246802), (55.975311, -130.864197),
            (60.123456, -60.654321), (28.765432, -70.987654),
        ])],
        "inners": [[]],
    },
    3: {  # Oceania triangle
        "outers": [np.array([
            (-45.111213, 110.141516), (-10.171819, 120.202122),
            (-30.232425, 155.262728),
        ])],
        "inners": [[]],
    },
}

# reference fixture cities (test/point_rtree_test.cc, latlng_test.cc)
DEMO_CENTERS: list[tuple[int, float, float]] = [
    (1, 49.8756276, 8.6577833),    # Darmstadt Mensa
    (2, 51.503872, -0.127109),     # London
    (3, 40.712728, -74.006015),    # New York
    (4, -33.867487, 151.206990),   # Sydney
]


def demo_areas(densify: bool = True):
    """The demo areas exactly as PolygonLayer will hold them: the
    layer densifies long edges by default (spherical reference
    semantics, joins.PIP_DENSIFY_DEG), so the oracle SQL must
    ray-cast over the SAME densified vertices."""
    from geospark.joins import PIP_DENSIFY_DEG, Area, densify_areas

    areas = [
        Area(aid, spec["outers"], spec["inners"]) for aid, spec in DEMO_RINGS.items()
    ]
    return densify_areas(areas, PIP_DENSIFY_DEG if densify else None)


def demo_layer(cover_zoom: int = 6):
    from geospark.joins import PolygonLayer

    # densify_areas is idempotent: the layer's own default pass is a
    # no-op on the already-densified rings, so layer.areas == these
    return PolygonLayer(demo_areas(), cover_zoom=cover_zoom)


def demo_layer_pip_sql(lat: str, lng: str) -> list[tuple[int, str]]:
    """(area_id, containment-SQL) for every demo area — over the
    densified rings, mirroring demo_layer() vertex-for-vertex."""
    return [
        (a.area_id, area_pip_sql(lat, lng, a.outers, a.inners))
        for a in demo_areas()
    ]


def ctile_x_sql(lng: str, z: int) -> str:
    """Continuous (fractional) tile-x at zoom z — the scanline
    supercover's coordinate system (no pixel rounding; the P3
    x-trunc/y-round asymmetry applies to integer pixels only)."""
    two_shift = repr(2.0 * K.MERC_ORIGIN_SHIFT)
    return (f"(({merc_x_sql(lng)} + {SHIFT}) / {two_shift}"
            f" * {float(1 << z)!r})")


def ctile_y_sql(lat: str, z: int) -> str:
    two_shift = repr(2.0 * K.MERC_ORIGIN_SHIFT)
    return (f"(({SHIFT} - {merc_y_sql(lat)}) / {two_shift}"
            f" * {float(1 << z)!r})")
