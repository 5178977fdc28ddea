"""Spatial joins vs the reference's own unit-test fixtures
(test/point_rtree_test.cc, test/box_test.cc) + PIP semantics."""

from __future__ import annotations

import numpy as np

from geospark.functions import numpy_kernels as NK
from geospark.joins import (
    Area,
    PolygonLayer,
    area_contains,
    box_query,
    knn_join,
    pip_join,
    radius_join,
)

# Darmstadt POIs (test/point_rtree_test.cc:10-16)
HBF = (49.8726016, 8.6310396)
LUISENPLATZ = (49.8728246, 8.6512529)
ALGO = (49.8780513, 8.6547033)
MENSA = (49.8756276, 8.6577833)


def _points_df(spark):
    rows = [
        (0, *HBF),
        (1, *LUISENPLATZ),
        (2, *ALGO),
    ]
    return spark.createDataFrame(rows, "point_id long, lat double, lng double")


def test_radius_join_darmstadt(spark):
    pts = _points_df(spark)
    centers = [(0, *MENSA)]

    # in_radius(450) -> {Algo} (point_rtree_test.cc:24-27)
    r = radius_join(pts, centers, max_m=450.0).collect()
    assert [x["point_id"] for x in r] == [2]

    # in_radius(450, 1000) -> {Luisenplatz} (point_rtree_test.cc:29-33)
    r = radius_join(pts, centers, max_m=1000.0, min_m=450.0).collect()
    assert [x["point_id"] for x in r] == [1]

    # in_radius_with_distance(10000) -> distance-ordered [Algo, Luisenplatz, Hbf]
    r = radius_join(pts, centers, max_m=10000.0).collect()
    assert [x["point_id"] for x in r] == [2, 1, 0]
    # distances match the exact haversine kernel
    for row in r:
        lat, lng = {0: HBF, 1: LUISENPLATZ, 2: ALGO}[row["point_id"]]
        expect = float(NK.distance(MENSA[0], MENSA[1], lat, lng))
        assert abs(row["dist_m"] - expect) < 1e-6


def test_knn_join_darmstadt(spark):
    pts = _points_df(spark)
    r = knn_join(pts, [(0, *MENSA)], k=2).collect()
    assert [x["point_id"] for x in r] == [2, 1]
    r = knn_join(pts, [(0, *MENSA)], k=5).collect()  # k > n: all 3
    assert [x["point_id"] for x in r] == [2, 1, 0]


def test_knn_join_df_matches_list_api(spark):
    """DataFrame-centers kNN == driver-list kNN, including a center in
    a sparse area (zoom escalation) and k > n behavior."""
    from geospark.joins import knn_join_df

    rows = [
        (i, float(49.5 + (i * 37 % 100) / 100.0), float(8.0 + (i * 53 % 200) / 100.0))
        for i in range(200)
    ] + [(900, -60.0, -150.0)]  # lone point far away
    pts = spark.createDataFrame(rows, "point_id long, lat double, lng double")
    centers = [(1, 49.87, 8.65), (2, -59.9, -150.2), (3, 20.0, 100.0)]
    via_list = knn_join(pts, centers, k=5, id_col="point_id")
    centers_df = spark.createDataFrame(
        centers, "query_id long, q_lat double, q_lng double"
    )
    via_df = knn_join_df(pts, centers_df, k=5, id_col="point_id")
    a = sorted((r["query_id"], r["point_id"]) for r in via_list.collect())
    b = sorted((r["query_id"], r["point_id"]) for r in via_df.collect())
    assert a == b
    assert len({q for q, _ in b}) == 3  # every center answered


def test_nearest_join_df_matches_knn_k1(spark):
    """The windowless k=1 path (partial-agg min-structs) returns
    exactly knn_join_df(k=1)'s nearest point and distance per center,
    including the escalation case (center in a sparse area) and the
    brute-force straggler path (tiny point set)."""
    from geospark.joins import knn_join_df, nearest_join_df

    rows = [
        (i, float(49.5 + (i * 37 % 100) / 100.0),
         float(8.0 + (i * 53 % 200) / 100.0))
        for i in range(200)
    ] + [(900, -60.0, -150.0)]
    pts = spark.createDataFrame(rows, "point_id long, lat double, lng double")
    centers = [(1, 49.87, 8.65), (2, -59.9, -150.2), (3, 20.0, 100.0)]
    cdf = spark.createDataFrame(
        centers, "query_id long, q_lat double, q_lng double"
    )
    via_knn = {
        r["query_id"]: (r["point_id"], round(r["dist_m"], 6))
        for r in knn_join_df(pts, cdf, k=1, id_col="point_id").collect()
    }
    via_nn = {
        r["query_id"]: (r["point_id"], round(r["dist_m"], 6))
        for r in nearest_join_df(pts, cdf, id_col="point_id").collect()
    }
    assert via_nn == via_knn and len(via_nn) == 3

    # 2-point set: every center below z=0 coverage hits the
    # brute-force branch and still gets its true nearest
    tiny = spark.createDataFrame(
        rows[:2], "point_id long, lat double, lng double")
    nn_tiny = {r["query_id"]: r["point_id"]
               for r in nearest_join_df(tiny, cdf, id_col="point_id",
                                        start_zoom=4).collect()}
    knn_tiny = {r["query_id"]: r["point_id"]
                for r in knn_join_df(tiny, cdf, k=1, id_col="point_id",
                                     start_zoom=4).collect()}
    assert nn_tiny == knn_tiny and len(nn_tiny) == 3


def test_pip_join_table_matches_broadcast_path(spark):
    """The polygon-TABLE PIP join (cogrouped refine, non-broadcast)
    must match the broadcast PolygonLayer path on the demo layer."""
    import numpy as np

    from geospark import geodata as G
    from geospark.joins import pip_join_table
    from geospark.sources import areas_to_df

    rng = np.random.RandomState(5)
    rows = [
        (i, float(rng.uniform(-75, 75)), float(rng.uniform(-179, 179)))
        for i in range(2000)
    ]
    pts = spark.createDataFrame(rows, "point_id long, lat double, lng double")
    layer = G.demo_layer()
    via_broadcast = sorted(
        (r["area_id"], r["point_id"]) for r in pip_join(pts, layer).collect()
    )
    poly_df = areas_to_df(spark, layer.areas)
    via_table = sorted(
        (r["area_id"], r["point_id"])
        for r in pip_join_table(pts, poly_df, cover_zoom=layer.cover_zoom).collect()
    )
    assert via_table == via_broadcast and len(via_table) > 0


def test_radius_join_df_matches_list_api(spark):
    """The DataFrame-of-centers radius join must produce the same pairs
    as the driver-list API (same cover mapping, same refine)."""
    from geospark.joins import radius_join_df

    rows = [
        (i, float(49.5 + (i * 37 % 100) / 100.0), float(8.0 + (i * 53 % 200) / 100.0))
        for i in range(300)
    ]
    pts = spark.createDataFrame(rows, "point_id long, lat double, lng double")
    centers = [(1, 49.87, 8.65), (2, 50.1, 9.2), (3, 49.6, 8.1)]
    via_list = radius_join(pts, centers, max_m=30_000.0)
    centers_df = spark.createDataFrame(
        centers, "query_id long, q_lat double, q_lng double"
    )
    via_df = radius_join_df(pts, centers_df, max_m=30_000.0)
    a = sorted((r["query_id"], r["point_id"]) for r in via_list.collect())
    b = sorted((r["query_id"], r["point_id"]) for r in via_df.collect())
    assert a == b and len(a) > 0


def test_box_query_strict(spark):
    # box::contains is STRICT (box.h:72-75): boundary points excluded
    rows = [(0, 1.0, 1.0), (1, 0.0, 0.5), (2, 0.5, 0.5)]
    pts = spark.createDataFrame(rows, "point_id long, lat double, lng double")
    got = box_query(pts, 0.0, 0.0, 1.0, 1.0).collect()
    assert [x["point_id"] for x in got] == [2]
    got = box_query(pts, 0.0, 0.0, 1.0, 1.0, strict=False).collect()
    assert sorted(x["point_id"] for x in got) == [0, 1, 2]


def test_area_contains_with_hole():
    outer = np.array([(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0)])
    hole = np.array([(4.0, 4.0), (4.0, 6.0), (6.0, 6.0), (6.0, 4.0)])
    area = Area(1, [outer], [[hole]])
    lat = np.array([5.0, 2.0, 5.0, 11.0])
    lng = np.array([5.0, 2.0, 4.5, 5.0])
    got = area_contains(area, lat, lng)
    assert got.tolist() == [False, True, False, False]


def test_pip_join_spark(spark):
    outer = np.array([(0.1, 0.1), (0.1, 9.9), (9.9, 9.9), (9.9, 0.1)])
    layer = PolygonLayer([Area(7, [outer])], cover_zoom=6)
    rows = [(0, 5.0, 5.0), (1, 20.0, 20.0), (2, 0.2, 9.8), (3, -5.0, 5.0)]
    pts = spark.createDataFrame(rows, "point_id long, lat double, lng double")
    got = pip_join(pts, layer).select("point_id", "area_id").collect()
    assert sorted((x["point_id"], x["area_id"]) for x in got) == [(0, 7), (2, 7)]


def test_pip_join_expr_and_udf_paths_agree(spark):
    """The codegen Column-expression refine and the pandas-UDF refine
    must classify identically (same arithmetic by construction)."""
    import numpy as np

    rng = np.random.RandomState(11)
    outer = np.array([(0.0, 0.0), (3.0, 10.0), (10.0, 7.0), (8.0, -2.0)])
    hole = np.array([(3.0, 2.0), (3.0, 5.0), (6.0, 5.0)])
    layer = PolygonLayer([Area(1, [outer], [[hole]])], cover_zoom=5)
    rows = [
        (i, float(rng.uniform(-3, 13)), float(rng.uniform(-5, 13)))
        for i in range(300)
    ]
    pts = spark.createDataFrame(rows, "point_id long, lat double, lng double")
    via_expr = sorted(
        r["point_id"]
        for r in pip_join(pts, layer, max_expr_edges=512).collect()
    )
    via_udf = sorted(
        r["point_id"]
        for r in pip_join(pts, layer, max_expr_edges=0).collect()
    )
    assert via_expr == via_udf
    # and both match the numpy oracle
    lat = np.array([r[1] for r in rows])
    lng = np.array([r[2] for r in rows])
    expect = sorted(
        int(rows[i][0])
        for i in np.nonzero(area_contains(Area(1, [outer], [[hole]]), lat, lng))[0]
    )
    assert via_expr == expect


def test_pip_join_multipolygon_with_hole(spark):
    a = Area(
        1,
        outers=[
            np.array([(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0)]),
            np.array([(20.0, 20.0), (20.0, 30.0), (30.0, 30.0), (30.0, 20.0)]),
        ],
        inners=[
            [np.array([(4.0, 4.0), (4.0, 6.0), (6.0, 6.0), (6.0, 4.0)])],
            [],
        ],
    )
    layer = PolygonLayer([a], cover_zoom=5)
    rows = [(0, 5.0, 5.0), (1, 2.0, 2.0), (2, 25.0, 25.0), (3, 15.0, 15.0)]
    pts = spark.createDataFrame(rows, "point_id long, lat double, lng double")
    got = pip_join(pts, layer).select("point_id").collect()
    assert sorted(x["point_id"] for x in got) == [1, 2]


def test_radius_join_high_latitude_vs_brute(spark):
    """Cover completeness at high latitude (mercator cells shrink as
    cos(lat)): radius results must equal the brute-force cross join."""
    import numpy as np
    from pyspark.sql import functions as F

    from geospark.functions import kernels as K
    from geospark.joins import radius_join

    rng = np.random.RandomState(5)
    lat0, lng0 = 78.0, 16.0  # Svalbard-ish
    rows = [
        (i, float(lat0 + rng.uniform(-0.3, 0.3)),
         float(lng0 + rng.uniform(-1.5, 1.5)))
        for i in range(400)
    ]
    pts = spark.createDataFrame(rows, "event_id long, lat double, lng double")
    centers = [(1, lat0, lng0), (2, lat0 + 0.2, lng0 - 1.0)]
    r = 9000.0
    got = sorted(
        (x["query_id"], x["event_id"])
        for x in radius_join(pts, centers, max_m=r).collect()
    )
    brute = []
    for qid, qla, qln in centers:
        d = K.distance(F.lit(qla), F.lit(qln), F.col("lat"), F.col("lng"))
        brute += [
            (qid, x["event_id"])
            for x in pts.withColumn("d", d).filter(F.col("d") < r).collect()
        ]
    assert got == sorted(brute)
    assert len(got) > 10


def test_radius_join_antimeridian(spark):
    """Covers crossing the +-180 line must wrap, not collapse — both
    the driver-list and DataFrame-centers forms, vs brute force."""
    import numpy as np
    from pyspark.sql import functions as F

    from geospark.functions import kernels as K
    from geospark.joins import radius_join, radius_join_df

    rng = np.random.RandomState(9)
    rows = []
    for i in range(300):
        lng = 179.0 + rng.uniform(0.0, 2.0)  # straddles the antimeridian
        if lng >= 180.0:
            lng -= 360.0
        rows.append((i, float(10.0 + rng.uniform(-0.5, 0.5)), float(lng)))
    pts = spark.createDataFrame(rows, "event_id long, lat double, lng double")
    centers = [(1, 10.0, 179.95), (2, 10.2, -179.9)]
    r = 40000.0

    def brute(qla, qln):
        d = K.distance(F.lit(qla), F.lit(qln), F.col("lat"), F.col("lng"))
        return {
            x["event_id"]
            for x in pts.withColumn("d", d).filter(F.col("d") < r).collect()
        }

    got_list = {}
    for x in radius_join(pts, centers, max_m=r).collect():
        got_list.setdefault(x["query_id"], set()).add(x["event_id"])
    cdf = spark.createDataFrame(
        centers, "query_id long, q_lat double, q_lng double"
    )
    got_df = {}
    for x in radius_join_df(pts, cdf, max_m=r).collect():
        got_df.setdefault(x["query_id"], set()).add(x["event_id"])
    for qid, qla, qln in centers:
        expect = brute(qla, qln)
        assert got_list.get(qid, set()) == expect, qid
        assert got_df.get(qid, set()) == expect, qid
        assert len(expect) > 5

def test_pip_planar_vs_spherical_divergence(spark):
    """Documents the ONE semantic gap vs the reference: within() there
    (src/polygon.cc:38-41) is boost::geometry SPHERICAL winding (edges
    are great circles); this engine's refine is PLANAR in lat/lng. For
    the quad (60,0)-(60,90)-(50,90)-(50,0) BOTH 90°-of-longitude edges
    bulge poleward at lng 45 — the top one to ~67.8°, the bottom one to
    ~59.3° — so the spherical polygon is a lens lying strictly ABOVE
    parts of the planar one. Divergence in both directions:
      - (65, 45): planar OUTSIDE, spherical INSIDE
      - (55, 45): planar INSIDE,  spherical OUTSIDE
    Area.densified_great_circle() opts into spherical (reference)
    parity while keeping the planar/codegen refine."""
    import math

    outer = [(60.0, 0.0), (60.0, 90.0), (50.0, 90.0), (50.0, 0.0)]
    area = Area(1, [outer])

    # great-circle latitude of the (60,0)->(60,90) edge at lng 45:
    # tan(lat) = (tan(l1) sin(g2-g) + tan(l2) sin(g-g1)) / sin(g2-g1)
    t = math.degrees(math.atan(
        (math.tan(math.radians(60.0)) * math.sin(math.radians(45.0))
         + math.tan(math.radians(60.0)) * math.sin(math.radians(45.0)))
        / math.sin(math.radians(90.0))
    ))
    assert t > 67.5  # the spherical top edge really does pass above 65N

    lat = np.array([65.0, 63.0, 55.0])
    lng = np.array([45.0, 45.0, 45.0])
    planar = area_contains(area, lat, lng)
    assert planar.tolist() == [False, False, True]  # shipped semantics

    sph = area.densified_great_circle(0.25)
    spherical = area_contains(sph, lat, lng)
    assert spherical.tolist() == [True, True, False]  # reference semantics

    # A DEFAULT-built layer auto-densifies long edges, so pip_join
    # gives the reference's SPHERICAL verdicts out of the box
    # (VERDICT r03 task #5); densify_deg=None opts back into planar.
    pts = spark.createDataFrame(
        [(0, 65.0, 45.0), (1, 63.0, 45.0), (2, 55.0, 45.0)],
        "point_id long, lat double, lng double",
    )
    got_default = {r["point_id"] for r in pip_join(
        pts, PolygonLayer([area], cover_zoom=4)).collect()}
    got_planar = {r["point_id"] for r in pip_join(
        pts, PolygonLayer([area], cover_zoom=4, densify_deg=None)).collect()}
    got_sph = {r["point_id"] for r in pip_join(
        pts, PolygonLayer([sph], cover_zoom=4)).collect()}
    assert got_default == {0, 1}  # reference (spherical) semantics
    assert got_planar == {2}      # explicit opt-out
    assert got_sph == {0, 1}


def test_densified_ring_preserves_planar_regions(spark):
    """Densifying a small low-latitude polygon is a no-op semantically:
    verdicts for interior/exterior points are unchanged."""
    outer = [(10.0, 10.0), (10.0, 11.0), (9.0, 11.0), (9.0, 10.0)]
    area = Area(3, [outer])
    d = area.densified_great_circle(0.1)
    lat = np.array([9.5, 8.5, 9.5])
    lng = np.array([10.5, 10.5, 12.0])
    assert area_contains(area, lat, lng).tolist() == [True, False, False]
    assert area_contains(d, lat, lng).tolist() == [True, False, False]


def test_map_match_vs_brute_force(spark):
    """match_points_to_segments == the goldens.map_match brute force on
    a mixed network: short city links, a degenerate 8000-km
    inter-city link (exercises the coarse-zoom cover path), a
    high-latitude line (lng under-cover fringe), and probes that
    match nothing."""
    from geospark.goldens import map_match as brute
    from geospark.joins import match_points_to_segments

    trajectories = [
        (1, [(48.1000, 11.5000), (48.1010, 11.5030), (48.1005, 11.5060)]),
        (2, [(48.1003, 11.5010), (35.6800, 139.7600)]),   # Munich -> Tokyo
        (3, [(78.2000, 15.6000), (78.2010, 15.6200)]),    # Svalbard
    ]
    probes = [
        (10, 48.10055, 11.50310),   # near line 1 mid
        (11, 48.10031, 11.50099),   # near shared area: lines 1 AND 2
        (12, 42.2000, 75.6305),     # ~600 m off the long link's merc midpoint
        (13, 78.20051, 15.61001),   # high-lat, between vertices
        (14, 0.0, 0.0),             # matches nothing
        (15, 48.0500, 11.5000),     # ~5.5 km away: outside 2 km
    ]
    max_m = 2000.0
    segs = []
    for uid, line in trajectories:
        for i in range(len(line) - 1):
            segs.append((uid, i, *line[i], *line[i + 1]))
    seg_df = spark.createDataFrame(
        segs,
        "line_id long, seg_idx int, f_lat double, f_lng double, "
        "t_lat double, t_lng double",
    )
    pts_df = spark.createDataFrame(
        probes, "point_id long, lat double, lng double")
    got = {
        r["point_id"]: (r["line_id"], r["seg_idx"],
                        round(r["dist_m"], 6), round(r["c_lat"], 9),
                        round(r["c_lng"], 9))
        for r in match_points_to_segments(pts_df, seg_df, max_m).collect()
    }
    want = {
        pid: (uid, si, round(d, 6), round(cla, 9), round(cln, 9))
        for pid, uid, si, d, cla, cln in brute(probes, trajectories, max_m)
    }
    assert got == want
    assert 14 not in got and 15 not in got
    assert {10, 11, 12, 13} <= set(got)
    # the interior probe really matched the degenerate long link
    assert got[12][0] == 2


def test_corridor_join_vs_brute_force(spark):
    """corridor_join == the goldens.corridor_pairs brute force on the
    same mixed network: probe 11 sits where lines 1 AND 2 both pass
    within 2 km, so the corridor keeps BOTH rows where the map-match
    argmin keeps one; map_match must equal the per-point argmin of
    the corridor relation (consistency of the two aggregates)."""
    from geospark.goldens import corridor_pairs
    from geospark.joins import corridor_join, match_points_to_segments

    trajectories = [
        (1, [(48.1000, 11.5000), (48.1010, 11.5030), (48.1005, 11.5060)]),
        (2, [(48.1003, 11.5010), (35.6800, 139.7600)]),
        (3, [(78.2000, 15.6000), (78.2010, 15.6200)]),
    ]
    probes = [
        (10, 48.10055, 11.50310),
        (11, 48.10031, 11.50099),
        (13, 78.20051, 15.61001),
        (14, 0.0, 0.0),
    ]
    max_m = 2000.0
    segs = []
    seg_rows = []
    for uid, line in trajectories:
        for i in range(len(line) - 1):
            segs.append((uid, i, line[i], line[i + 1]))
            seg_rows.append((uid, i, *line[i], *line[i + 1]))
    seg_df = spark.createDataFrame(
        seg_rows,
        "line_id long, seg_idx int, f_lat double, f_lng double, "
        "t_lat double, t_lng double",
    )
    pts_df = spark.createDataFrame(
        probes, "point_id long, lat double, lng double")
    got = sorted(
        (r["point_id"], r["line_id"], r["seg_idx"],
         round(r["dist_m"], 6), round(r["c_lat"], 9), round(r["c_lng"], 9))
        for r in corridor_join(pts_df, seg_df, max_m).collect()
    )
    want = sorted(
        (pid, uid, si, round(d, 6), round(cla, 9), round(cln, 9))
        for pid, uid, si, d, cla, cln in corridor_pairs(probes, segs, max_m)
    )
    assert got == want
    # probe 11 is inside BOTH corridors
    assert {u for p, u, *_ in got if p == 11} == {1, 2}
    # map_match == per-point argmin of the corridor relation
    mm = {
        r["point_id"]: (r["line_id"], r["seg_idx"], round(r["dist_m"], 6))
        for r in match_points_to_segments(pts_df, seg_df, max_m).collect()
    }
    best = {}
    for p, u, si, d, _, _ in got:
        if p not in best or (d, u, si) < best[p]:
            best[p] = (d, u, si)
    assert mm == {p: (u, si, d) for p, (d, u, si) in best.items()}


def test_map_match_antimeridian_probe(spark):
    """Probes nudged past lng -180 must still match a network link ON
    the antimeridian. Regression: the JVM pixel-x used floor while the
    reference (and the numpy cover twin) TRUNCATES toward zero —
    identical in range, but floor(-eps) = -1 desynced the probe key
    from the cover at lng < -180, and the old pad=1 ring only masked
    it by a linear-cell wraparound coincidence (pad=0 exposed it)."""
    from geospark.goldens import map_match_segments as brute
    from geospark.joins import match_points_to_segments

    segs = [
        (1, 0, (40.0, -180.0), (39.996, -180.0)),      # on the meridian
        (2, 0, (-80.0, 179.995), (-80.004, 179.996)),  # just west of it
        (3, 0, (0.0, -179.9998), (0.004, -179.9999)),  # just east of it
    ]
    probes = [
        (100, 40.0003, -180.0002),   # ~40 m, wrapped past -180
        (101, -79.9997, 179.9995),   # high-lat west-side neighbor
        (102, 0.0003, -180.0002),    # wrapped; nearest seg is EAST side
    ]
    seg_df = spark.createDataFrame(
        [(l, s, f[0], f[1], t[0], t[1]) for l, s, f, t in segs],
        "line_id long, seg_idx int, f_lat double, f_lng double, "
        "t_lat double, t_lng double",
    )
    pts_df = spark.createDataFrame(
        probes, "point_id long, lat double, lng double")
    got = {
        r["point_id"]: (r["line_id"], round(r["dist_m"], 6))
        for r in match_points_to_segments(pts_df, seg_df, 500.0).collect()
    }
    want = {
        pid: (uid, round(d, 6))
        for pid, uid, _si, d, _cla, _cln in brute(probes, segs, 500.0)
    }
    assert got == want
    assert set(got) == {100, 101, 102}


def test_knn_durable_spool_backend(spark, tmp_path):
    """The kNN escalation loop spools per-round summaries; with the
    reliable (DFS-checkpoint) backend the results must be identical
    to the local default — the backend changes durability, never
    rows."""
    import random

    from geospark.joins import knn_join_df

    rng = random.Random(7)
    pts = spark.createDataFrame(
        [(i, 48.0 + rng.random(), 11.0 + rng.random()) for i in range(400)],
        "point_id long, lat double, lng double",
    )
    centers = spark.createDataFrame(
        [(1, 48.5, 11.5), (2, 48.9, 11.1)],
        "query_id long, q_lat double, q_lng double",
    )

    def run():
        return sorted(
            (r["query_id"], r["point_id"], round(r["dist_m"], 6))
            for r in knn_join_df(pts, centers, k=5,
                                 id_col="point_id").collect()
        )

    base = run()
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    spark.conf.set("spark.geospark.spool", "reliable")
    try:
        durable = run()
    finally:
        spark.conf.set("spark.geospark.spool", "local")
    assert durable == base
    assert len(base) == 10


def test_pip_join_empty_layer(spark):
    """An empty polygon layer is a valid degenerate input: zero output
    rows, not an IndexError at plan-build time."""
    df = spark.createDataFrame([(1, 10.0, 10.0)],
                               "point_id long, lat double, lng double")
    out = pip_join(df, PolygonLayer([], cover_zoom=6))
    assert out.count() == 0


def test_knn_classify_majority_and_ties(spark):
    """Majority vote: 1-NN label loses to the 2-of-3 majority; an even
    2-2 split breaks to the lexicographically smaller label; votes
    come from exactly the k nearest under the (dist, id) kNN order."""
    from geospark.joins import knn_classify

    # center at origin; nearest point labeled 'z', next two 'a'
    pts = [
        (1, 0.001, 0.0, "z"),   # ~111 m, nearest
        (2, 0.002, 0.0, "a"),
        (3, 0.003, 0.0, "a"),
        (4, 0.004, 0.0, "b"),   # outside k=3
        # second center (id 8) at (10, 10): exact 2-2 tie b vs c
        (5, 10.001, 10.0, "c"),
        (6, 10.002, 10.0, "b"),
        (7, 10.003, 10.0, "c"),
        (8, 10.004, 10.0, "b"),
    ]
    df = spark.createDataFrame(
        pts, "point_id long, lat double, lng double, label string")
    got = {
        r["query_id"]: (r["label"], r["n_votes"])
        for r in knn_classify(
            df, [(0, 0.0, 0.0), (8, 10.0, 10.0)], k=3
        ).collect()
    }
    assert got[0] == ("a", 2)      # majority beats the nearest 'z'
    q8 = knn_classify(df, [(8, 10.0, 10.0)], k=4).collect()[0]
    assert (q8["label"], q8["n_votes"]) == ("b", 2)  # 2-2 tie -> 'b'
