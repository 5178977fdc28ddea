"""polygon_tile_cover: every claim checked by INDEPENDENT geometry —
interior tiles by a plain-Python even-odd point-in-polygon at the tile
center, boundary tiles by Liang–Barsky edge-box intersection, and
completeness over the full bbox tile neighborhood (holes included)."""

import math

from geospark.raster import polygon_tile_cover

R = 6378137.0
SHIFT = 20037508.342789244
MAXLAT = 85.05112877980659


def _ct(lat, lng, z):
    mx = R * math.radians(lng)
    cl = max(-MAXLAT, min(MAXLAT, lat))
    s = math.sin(math.radians(cl))
    my = R * math.log((1.0 + s) / (1.0 - s)) / 2.0
    n = float(1 << z)
    return ((mx + SHIFT) / (2.0 * SHIFT) * n,
            (SHIFT - my) / (2.0 * SHIFT) * n)


def _pip_evenodd(rings_px, x, y):
    """Even-odd ray cast in continuous tile coords (all rings)."""
    inside = False
    for ring in rings_px:
        n = len(ring)
        for i in range(n):
            x0, y0 = ring[i]
            x1, y1 = ring[(i + 1) % n]
            if (y0 <= y) != (y1 <= y):
                cx = x0 + (x1 - x0) * (y - y0) / (y1 - y0)
                if cx > x:
                    inside = not inside
    return inside


def _edge_hits_box(p0, p1, tx, ty, pad=1e-9):
    x0, y0 = p0
    x1, y1 = p1
    dx, dy = x1 - x0, y1 - y0
    t0, t1 = 0.0, 1.0
    for p, q in ((-dx, x0 - (tx - pad)), (dx, (tx + 1 + pad) - x0),
                 (-dy, y0 - (ty - pad)), (dy, (ty + 1 + pad) - y0)):
        if p == 0:
            if q < 0:
                return False
            continue
        r = q / p
        if p < 0:
            if r > t1:
                return False
            t0 = max(t0, r)
        else:
            if r < t0:
                return False
            t1 = min(t1, r)
    return t0 <= t1


RINGS = [
    # pentagon with a triangular hole (mid-latitudes)
    [(35.1, -10.2), (60.6, -5.7), (70.1, 20.2), (55.3, 40.4), (36.5, 25.6)],
    [(45.1, 5.2), (52.9, 10.8), (46.5, 20.1)],
]
Z = 7  # fine enough that the hole has interior tiles of its own


def _spark_cover(spark):
    rings = spark.createDataFrame(
        [(1, [(float(a), float(b)) for a, b in r]) for r in RINGS],
        "area_id long, ring array<struct<lat: double, lng: double>>",
    )
    rows = polygon_tile_cover(rings, Z).collect()
    return {(r["tile_x"], r["tile_y"]): r["kind"] for r in rows}


def test_polygon_cover_against_independent_geometry(spark):
    got = _spark_cover(spark)
    rings_px = [[_ct(la, ln, Z) for la, ln in r] for r in RINGS]
    edges = [
        (ring[i], ring[(i + 1) % len(ring)])
        for ring in rings_px for i in range(len(ring))
    ]
    xs = [p[0] for r in rings_px for p in r]
    ys = [p[1] for r in rings_px for p in r]
    checked = 0
    hole_voids = 0
    for tx in range(int(min(xs)) - 1, int(max(xs)) + 2):
        for ty in range(int(min(ys)) - 1, int(max(ys)) + 2):
            on_edge = any(_edge_hits_box(a, b, tx, ty) for a, b in edges)
            center_in = _pip_evenodd(rings_px, tx + 0.5, ty + 0.5)
            kind = got.get((tx, ty))
            if on_edge:
                assert kind == "boundary", (tx, ty, kind)
            elif center_in:
                assert kind == "interior", (tx, ty, kind)
            else:
                # outside, or strictly inside the hole
                assert kind is None, (tx, ty, kind)
                if _pip_evenodd(rings_px[:1], tx + 0.5, ty + 0.5):
                    hole_voids += 1  # inside outer ring, voided by hole
            checked += 1
    assert checked > 100
    assert set(got.values()) == {"boundary", "interior"}
    # the hole leaves real voids strictly inside the outer ring
    assert hole_voids > 0


def test_polygon_cover_plan_has_no_python(spark):
    rings = spark.createDataFrame(
        [(1, [(0.0, 0.0), (5.0, 10.0), (0.0, 10.0)])],
        "area_id long, ring array<struct<lat: double, lng: double>>",
    )
    plan = polygon_tile_cover(rings, 5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_vectorize_tiles_round_trip(spark):
    """Rectangle decomposition is exact: rectangles re-explode to
    EXACTLY the input tile set, per area, with no overlap — on an
    irregular shape (polygon raster with a hole) plus a degenerate
    single-tile area and a one-row strip."""
    from pyspark.sql import functions as F

    from geospark.raster import polygon_tile_cover, vectorize_tiles

    rings = spark.createDataFrame(
        [
            (1, [(0.0, 0.0), (8.0, 14.0), (0.0, 14.0)]),
            (1, [(2.0, 6.0), (4.0, 10.0), (2.0, 10.0)]),  # hole
        ],
        "area_id long, ring array<struct<lat: double, lng: double>>",
    )
    cover = polygon_tile_cover(rings, 6).select(
        "area_id", "tile_x", "tile_y")
    extra = spark.createDataFrame(
        [(2, 40, 40), (3, 10, 5), (3, 11, 5), (3, 12, 5)],
        "area_id long, tile_x long, tile_y long",
    )
    tiles = cover.unionByName(extra)
    rects = vectorize_tiles(tiles)
    rows = rects.collect()
    # degenerate cases come out as expected single rectangles
    by_area = {}
    for r in rows:
        by_area.setdefault(r["area_id"], []).append(r)
    assert [(r["x0"], r["x1"], r["y0"], r["y1"])
            for r in by_area[2]] == [(40, 40, 40, 40)]
    assert [(r["x0"], r["x1"], r["y0"], r["y1"])
            for r in by_area[3]] == [(10, 12, 5, 5)]
    # exact round trip: re-exploded rectangles == input tile set
    re_exploded = rects.select(
        "area_id",
        F.explode(F.sequence("x0", "x1")).alias("tile_x"),
        F.col("y0"), F.col("y1"),
    ).select(
        "area_id", "tile_x",
        F.explode(F.sequence("y0", "y1")).alias("tile_y"),
    )
    got = {(r["area_id"], r["tile_x"], r["tile_y"])
           for r in re_exploded.collect()}
    want = {(r["area_id"], r["tile_x"], r["tile_y"])
            for r in tiles.collect()}
    assert got == want
    assert re_exploded.count() == len(got)  # rectangles are disjoint
    # conservation: per-rect n_tiles sums to the input count
    assert (rects.agg(F.sum("n_tiles")).collect()[0][0]
            == tiles.count())


def test_idw_interpolate_integer_exact(spark):
    """IDW semantics on a hand-computed fixture: one center, three
    samples at known distances — weights = 1e15 DIV d_cm^2, estimate
    = floor(sum(w*v_cents) / sum(w)); a lone-sample center returns
    exactly that sample's value in cents; out-of-radius samples are
    invisible."""
    from pyspark.sql import functions as F

    from geospark.functions import kernels as K
    from geospark.raster import idw_interpolate

    # center at origin; samples due north at ~1.1km, ~2.2km, ~5.6km,
    # plus one far outside the 10 km radius
    samples = [
        (1, 0.01, 0.0, 10.0),
        (2, 0.02, 0.0, 20.0),
        (3, 0.05, 0.0, 40.0),
        (4, 5.0, 0.0, 99.0),       # ~556 km: outside
    ]
    pts = spark.createDataFrame(
        samples, "point_id long, lat double, lng double, value double")
    centers = spark.createDataFrame(
        [(7, 0.0, 0.0), (8, 40.0, 40.0)],
        "query_id long, q_lat double, q_lng double")
    got = {r["query_id"]: r for r in idw_interpolate(
        pts, centers, 10_000.0).collect()}
    # expected from the same integer formulas, distances via the
    # engine's own haversine evaluated through Spark (bit-identical)
    d = [r[0] for r in spark.createDataFrame(
        [(la,) for _, la, _, _ in samples[:3]], "lat double"
    ).select(K.distance(F.lit(0.0), F.lit(0.0),
                        F.col("lat"), F.lit(0.0))).collect()]
    ws = [10 ** 15 // max(int(x * 100), 100) ** 2 for x in d]
    vs = [1000, 2000, 4000]
    num = sum(w * v for w, v in zip(ws, vs))
    den = sum(ws)
    assert got[7]["n_samples"] == 3
    assert got[7]["den_w"] == den
    assert got[7]["est_cents"] == num // den
    # nearest sample dominates: estimate within [1000, 2000)
    assert 1000 <= got[7]["est_cents"] < 2000
    assert 8 not in got  # no samples in radius -> no row


def test_idw_lone_sample_returns_value(spark):
    from geospark.raster import idw_interpolate

    pts = spark.createDataFrame(
        [(1, 10.001, 20.0, 123.45)],
        "point_id long, lat double, lng double, value double")
    centers = spark.createDataFrame(
        [(0, 10.0, 20.0)], "query_id long, q_lat double, q_lng double")
    rows = idw_interpolate(pts, centers, 5000.0).collect()
    assert len(rows) == 1
    assert rows[0]["est_cents"] == 12345  # floor(123.45*100)


def test_idw_negative_values(spark):
    """est_cents uses truncation-toward-zero integer division (Spark
    DIV == DuckDB // — both verified trunc, -7 DIV 2 = -3), and value
    quantization floors (so -20.005 -> -2001 cents, asymmetric with
    +20.005 -> 2000): pinned on an all-negative fixture computed from
    the same integer formulas."""
    import math

    from pyspark.sql import functions as F

    from geospark.functions import kernels as K
    from geospark.raster import idw_interpolate

    samples = [(1, 0.01, 0.0, -10.0), (2, 0.02, 0.0, -20.005)]
    pts = spark.createDataFrame(
        samples, "point_id long, lat double, lng double, value double")
    centers = spark.createDataFrame(
        [(7, 0.0, 0.0)], "query_id long, q_lat double, q_lng double")
    row = idw_interpolate(pts, centers, 10_000.0).collect()[0]
    d = [r[0] for r in spark.createDataFrame(
        [(la,) for _, la, _, _ in samples], "lat double"
    ).select(K.distance(F.lit(0.0), F.lit(0.0),
                        F.col("lat"), F.lit(0.0))).collect()]
    ws = [10 ** 15 // max(int(x * 100), 100) ** 2 for x in d]
    vs = [math.floor(v * 100.0) for _, _, _, v in samples]  # -1000, -2001
    assert vs == [-1000, -2001]
    num = sum(w * v for w, v in zip(ws, vs))
    den = sum(ws)
    trunc = -((-num) // den) if num < 0 else num // den
    assert row["n_samples"] == 2 and row["den_w"] == den
    assert row["est_cents"] == trunc
    # and the two division flavors genuinely differ on this fixture
    assert num % den != 0 and trunc == num // den + 1
