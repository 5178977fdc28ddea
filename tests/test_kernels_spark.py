"""Column-expression kernel parity: reference unit-test fixtures run
as real distributed DataFrame ops (latlng_test.cc, webmercator_test.cc
ports). latlng equality tolerance: the reference uses 100*machine-eps
(latlng.h:22-27); we use abs=1e-9 deg which is stricter than needed
for these fixtures but looser than 100*eps — asserted values come out
far inside it."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

import geospark.functions.kernels as K

APPROX = 1e-4  # doctest::Approx default rel tolerance


def _one(spark, cols: dict):
    """Run a dict of Columns against a single-row DataFrame."""
    df = spark.createDataFrame([Row(dummy=1)])
    row = df.select(*[c.alias(n) for n, c in cols.items()]).collect()[0]
    return row.asDict()


# latlng_test.cc:8-13
def test_bearing_cardinal(spark):
    r = _one(
        spark,
        {
            "n": K.bearing(F.lit(0.0), F.lit(0.0), F.lit(10.0), F.lit(0.0)),
            "e": K.bearing(F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(10.0)),
            "s": K.bearing(F.lit(10.0), F.lit(0.0), F.lit(0.0), F.lit(0.0)),
            "w": K.bearing(F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(-10.0)),
        },
    )
    assert r["n"] == pytest.approx(0.0, abs=1e-9)
    assert r["e"] == pytest.approx(90.0, rel=APPROX)
    assert r["s"] == pytest.approx(180.0, rel=APPROX)
    assert r["w"] == pytest.approx(270.0, rel=APPROX)


# latlng_test.cc:15-30
def test_bearing_london_paris_roundtrip(spark):
    lo = (51.5074, -0.1278)
    pa = (48.8566, 2.3522)
    b = K.bearing(F.lit(lo[0]), F.lit(lo[1]), F.lit(pa[0]), F.lit(pa[1]))
    d = K.distance(F.lit(lo[0]), F.lit(lo[1]), F.lit(pa[0]), F.lit(pa[1]))
    rlat, rlng = K.destination_point(F.lit(lo[0]), F.lit(lo[1]), d, b)
    r = _one(spark, {"b": b, "rlat": rlat, "rlng": rlng})
    assert 90.0 < r["b"] < 180.0
    assert r["rlat"] == pytest.approx(pa[0], rel=0.01)
    assert r["rlng"] == pytest.approx(pa[1], rel=0.01)


# latlng_test.cc:32-59
@pytest.mark.parametrize(
    "src,dist,brg,expected",
    [
        ((40.0, -20.0), 111800.0, 0.0, (41.00555556, -20.0)),
        ((-23.0, 42.0), 2342000.0, 90.0, (-21.38472222, 64.70277777)),
        ((89.0, 3.0), 11111000.0, 77.0, (-9.69722222, 106.16833333)),
    ],
)
def test_destination_point_goldens(spark, src, dist, brg, expected):
    rlat, rlng = K.destination_point(F.lit(src[0]), F.lit(src[1]), F.lit(dist), F.lit(brg))
    r = _one(spark, {"lat": rlat, "lng": rlng})
    assert r["lat"] == pytest.approx(expected[0], rel=APPROX, abs=1e-7)
    assert r["lng"] == pytest.approx(expected[1], rel=APPROX, abs=1e-7)


# latlng_test.cc:61-93 — closest_on_segment endpoint snapping
ENDPOINT_CASES = [
    ((0.0, 0.0), (1.0, 0.0), (0.0, 1.0), True),
    ((0.0, 0.0), (1.0, 0.0), (0.0, -1.0), True),
    ((0.0, 0.0), (1.0, 0.0), (-1.0, 0.0), True),
    ((0.0, 0.0), (1.0, 0.0), (-0.5, 0.5), True),
    ((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), False),
    ((0.0, 0.0), (1.0, 0.0), (1.0, -1.0), False),
    ((0.0, 0.0), (1.0, 0.0), (2.0, 0.0), False),
    ((0.0, 0.0), (1.0, 0.0), (1.5, 0.5), False),
    ((50.0, 0.0), (90.0, 180.0), (39.0, 10.0), True),
    ((0.0, 0.0), (0.0, 90.0), (0.0, 120.0), False),
    ((24.427, -163.318), (46.629, -85.595), (83.911, -7.324), False),
    ((-54.556, 66.671), (-68.925, -70.823), (36.411, 97.435), True),
    ((-12.087, 53.036), (-63.395, -104.788), (-15.509, -137.375), False),
    ((48.384, 3.970), (-86.712, -147.266), (66.293, 3.294), True),
    ((-26.293, 83.294), (63.181, -44.492), (10.135, -159.263), False),
    ((35.700, 17.598), (57.153, 28.220), (65.793, 36.753), False),
    ((48.507, 17.041), (37.068, 48.912), (53.585, 1.913), True),
]


def test_closest_on_segment_endpoints(spark):
    rows = [
        Row(i=i, f_lat=f[0], f_lng=f[1], t_lat=t[0], t_lng=t[1], x_lat=x[0], x_lng=x[1])
        for i, (f, t, x, _) in enumerate(ENDPOINT_CASES)
    ]
    df = spark.createDataFrame(rows)
    lat, lng = K.closest_on_segment(
        F.col("x_lat"), F.col("x_lng"),
        F.col("f_lat"), F.col("f_lng"),
        F.col("t_lat"), F.col("t_lng"),
    )
    out = {r["i"]: r for r in df.select("i", lat.alias("lat"), lng.alias("lng")).collect()}
    for i, (f, t, x, is_start) in enumerate(ENDPOINT_CASES):
        exp = f if is_start else t
        assert out[i]["lat"] == pytest.approx(exp[0], abs=1e-7), i
        assert out[i]["lng"] == pytest.approx(exp[1], abs=1e-7), i


# latlng_test.cc:95-123 — interior candidates
INTERIOR_CASES = [
    ((0.0, 0.0), (1.0, 0.0), (0.1, 0.0)),
    ((0.0, 0.0), (1.0, 0.0), (0.9, 0.0)),
    ((0.0, 0.0), (1.0, 0.0), (0.5, 0.0)),
    ((0.0, 0.0), (1.0, 0.0), (0.5, 0.2)),
    ((-59.0, 54.0), (-67.0, 26.0), (-62.7, 42.0)),
    ((1.0, 1.0), (1.0020, 1.0005), (1.0010, 1.0011)),
    ((37.3908, 8.3000), (67.8311, 39.7556), (41.4347, 27.7353)),
    ((37.2922, 25.0194), (57.9814, 5.5728), (50.6969, 5.3486)),
    ((40.303, 45.234), (46.657, 15.126), (34.561, 41.347)),
    ((36.377, 25.299), (48.428, 39.082), (43.046, 24.722)),
    ((49.885, 22.146), (70.732, 29.241), (61.708, 8.514)),
    ((37.864, 38.041), (50.021, 7.588), (41.093, 8.343)),
    ((49.660, -5.444), (66.286, 48.260), (41.630, 9.008)),
]


def test_closest_on_segment_interior(spark):
    rows = [
        Row(i=i, f_lat=f[0], f_lng=f[1], t_lat=t[0], t_lng=t[1], x_lat=x[0], x_lng=x[1])
        for i, (f, t, x) in enumerate(INTERIOR_CASES)
    ]
    df = spark.createDataFrame(rows)
    lat, lng = K.closest_on_segment(
        F.col("x_lat"), F.col("x_lng"),
        F.col("f_lat"), F.col("f_lng"),
        F.col("t_lat"), F.col("t_lng"),
    )
    sel = df.select(
        "i",
        K.distance(F.col("x_lat"), F.col("x_lng"), lat, lng).alias("d_best"),
        K.distance(F.col("x_lat"), F.col("x_lng"), F.col("f_lat"), F.col("f_lng")).alias("d_from"),
        K.distance(F.col("x_lat"), F.col("x_lng"), F.col("t_lat"), F.col("t_lng")).alias("d_to"),
        lat.alias("lat"), lng.alias("lng"),
    )
    for r in sel.collect():
        f, t, _x = INTERIOR_CASES[r["i"]]
        assert (abs(r["lat"] - f[0]) > 1e-9 or abs(r["lng"] - f[1]) > 1e-9), r["i"]
        assert (abs(r["lat"] - t[0]) > 1e-9 or abs(r["lng"] - t[1]) > 1e-9), r["i"]
        assert r["d_best"] < r["d_from"], r["i"]
        assert r["d_best"] < r["d_to"], r["i"]


# latlng_test.cc:125-195 — approx closest_on_segment variants
def test_approx_closest_on_segment(spark):
    approx_endpoint = [c for c in ENDPOINT_CASES if c not in (ENDPOINT_CASES[8], ENDPOINT_CASES[14])]
    rows = [
        Row(i=i, f_lat=f[0], f_lng=f[1], t_lat=t[0], t_lng=t[1], x_lat=x[0], x_lng=x[1])
        for i, (f, t, x, _) in enumerate(approx_endpoint)
    ]
    df = spark.createDataFrame(rows)
    scale = K.lower_bound_distance_lng_degrees(F.col("x_lat"))
    lat, lng, _sq = K.approx_closest_on_segment(
        F.col("x_lat"), F.col("x_lng"),
        F.col("f_lat"), F.col("f_lng"),
        F.col("t_lat"), F.col("t_lng"),
        scale,
    )
    out = {r["i"]: r for r in df.select("i", lat.alias("lat"), lng.alias("lng")).collect()}
    for i, (f, t, x, is_start) in enumerate(approx_endpoint):
        exp = f if is_start else t
        assert out[i]["lat"] == pytest.approx(exp[0], abs=1e-7), i
        assert out[i]["lng"] == pytest.approx(exp[1], abs=1e-7), i


# latlng_test.cc:197-220 — approx vs exact distance within 5 m
def test_approx_vs_exact_distance(spark):
    cases = [
        ((0.0, 0.0), (0.1, 0.0)),
        ((0.0, 0.0), (0.9, 0.0)),
        ((0.0, 0.0), (0.5, 0.0)),
        ((0.0, 0.0), (0.5, 0.2)),
        ((1.0, 1.0), (1.0010, 1.0011)),
        ((0.0, 179.0), (1.0, 179.9)),
        ((0.0, 179.0), (1.0, -179.9)),
        ((1.0, 179.9), (2.0, -179.9)),
        ((1.0, -179.9), (-1.0, 179.9)),
    ]
    rows = [Row(i=i, a_lat=a[0], a_lng=a[1], b_lat=b[0], b_lng=b[1]) for i, (a, b) in enumerate(cases)]
    df = spark.createDataFrame(rows)
    scale = K.approx_distance_lng_degrees(F.col("a_lat"), F.col("a_lng"))
    d = K.distance(F.col("a_lat"), F.col("a_lng"), F.col("b_lat"), F.col("b_lng"))
    sq = K.approx_squared_distance(
        F.col("a_lat"), F.col("a_lng"), F.col("b_lat"), F.col("b_lng"), scale
    )
    for r in df.select((F.abs(d - F.sqrt(sq))).alias("err")).collect():
        assert r["err"] < 5.0


# webmercator_test.cc ports on Columns
def test_webmercator_columns(spark):
    r = _one(
        spark,
        {
            "px_c": K.merc_to_pixel_x(K.latlng_to_merc_x(F.lit(0.0)), 0, 256),
            "py_c": K.merc_to_pixel_y(K.latlng_to_merc_y(F.lit(0.0)), 0, 256),
            "px_ne": K.merc_to_pixel_x(K.latlng_to_merc_x(F.lit(180.0)), 0, 256),
            "py_ne": K.merc_to_pixel_y(K.latlng_to_merc_y(F.lit(K.MERC_MAX_LATITUDE)), 0, 256),
            "px_sw": K.merc_to_pixel_x(K.latlng_to_merc_x(F.lit(-180.0)), 0, 256),
            "py_sw": K.merc_to_pixel_y(K.latlng_to_merc_y(F.lit(-K.MERC_MAX_LATITUDE)), 0, 256),
            "mx": K.latlng_to_merc_x(F.lit(30.0)),
            "my": K.latlng_to_merc_y(F.lit(50.0)),
            "ilat": K.merc_to_lat(F.lit(6446275.84102)),
            "ilng": K.merc_to_lng(F.lit(3339584.7238)),
        },
    )
    assert (r["px_c"], r["py_c"]) == (128, 128)
    assert (r["px_ne"], r["py_ne"]) == (256, 0)
    assert (r["px_sw"], r["py_sw"]) == (0, 256)
    assert r["mx"] == pytest.approx(3339584.7238, rel=1e-6)
    assert r["my"] == pytest.approx(6446275.84102, rel=1e-6)
    assert r["ilat"] == pytest.approx(50.0, rel=1e-6)
    assert r["ilng"] == pytest.approx(30.0, rel=1e-6)


def test_tile_hash_spark_matches_numpy(spark):
    import numpy as np

    import geospark.functions.numpy_kernels as nk

    rng = np.random.RandomState(7)
    lats = rng.uniform(-85, 85, 50)
    lngs = rng.uniform(-180, 180, 50)
    expected = nk.tile_hash_32(lats, lngs)
    df = spark.createDataFrame(
        [Row(i=i, lat=float(a), lng=float(b)) for i, (a, b) in enumerate(zip(lats, lngs))]
    )
    out = df.select("i", K.tile_hash_32(F.col("lat"), F.col("lng")).alias("h")).collect()
    for r in out:
        assert r["h"] == int(expected[r["i"]]), r["i"]


def test_box_predicates(spark):
    # box_test.cc:5-18
    r = _one(
        spark,
        {
            "in1": K.box_contains_box(
                49.980557, 9.072252, 50.002645, 9.143697,
                50.0, 9.1, 50.0, 9.1,
            ),
            "out1": K.box_contains_box(
                49.980557, 9.072252, 50.002645, 9.143697,
                49.9, 9.11, 50.0, 9.12,
            ),
            "strict_edge": K.box_contains_point(0.0, 0.0, 1.0, 1.0, 0.0, 0.5),
            "inside": K.box_contains_point(0.0, 0.0, 1.0, 1.0, 0.5, 0.5),
        },
    )
    assert r["in1"] is True
    assert r["out1"] is False
    assert r["strict_edge"] is False  # strict inequality (box.h:72-75)
    assert r["inside"] is True


def test_fixed_point_codec(spark):
    r = _one(
        spark,
        {
            "f": K.double_to_fix(F.lit(49.8726016)),
            "d": K.fix_to_double(K.double_to_fix(F.lit(49.8726016))),
        },
    )
    assert r["f"] == round(49.8726016 * 1e7)
    assert r["d"] == pytest.approx(49.8726016, abs=1e-7)


def test_midpoint_and_xyz(spark):
    lat, lng = K.midpoint(F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(10.0))
    x, y, z = K.xyz(F.lit(45.0), F.lit(45.0))
    r = _one(spark, {"mlat": lat, "mlng": lng, "x": x, "y": y, "z": z})
    assert r["mlat"] == pytest.approx(0.0, abs=1e-9)
    assert r["mlng"] == pytest.approx(5.0, abs=1e-9)
    assert r["x"] == pytest.approx(0.5 * math.cos(math.radians(45)) * math.sin(math.radians(45)))
    assert r["z"] == pytest.approx(0.5 * math.sin(math.radians(45)))


def test_box_extend_overloads(spark):
    """box.h:31-48 extend(latlng)/extend(box), empty, centroid,
    box(polyline) (box_test.cc:5-18 style fixtures)."""
    from pyspark.sql import functions as F

    from geospark.functions import kernels as K

    inf = float("inf")
    df = spark.createDataFrame(
        [(inf, inf, -inf, -inf, 50.0, 8.0)],
        "mn_lat double, mn_lng double, mx_lat double, mx_lng double, "
        "lat double, lng double",
    )
    a, b, c, d = K.box_extend_point(
        F.col("mn_lat"), F.col("mn_lng"), F.col("mx_lat"), F.col("mx_lng"),
        F.col("lat"), F.col("lng"),
    )
    r = df.select(a.alias("a"), b.alias("b"), c.alias("c"), d.alias("d"),
                  K.box_empty(F.col("mn_lat"), F.col("mn_lng"),
                              F.col("mx_lat"), F.col("mx_lng")).alias("e"))
    row = r.collect()[0]
    assert (row["a"], row["b"], row["c"], row["d"]) == (50.0, 8.0, 50.0, 8.0)
    assert row["e"] is True  # default box is empty

    # extend(box) = union; centroid of the result
    df2 = spark.createDataFrame(
        [(1.0, 2.0, 3.0, 4.0, 0.0, 1.0, 2.0, 5.0)],
        "a1 double, a2 double, a3 double, a4 double, "
        "b1 double, b2 double, b3 double, b4 double",
    )
    u = K.box_extend_box(*[F.col(x) for x in
                           ("a1", "a2", "a3", "a4", "b1", "b2", "b3", "b4")])
    clat, clng = K.box_centroid(*u)
    row2 = df2.select(u[0].alias("u1"), u[1].alias("u2"), u[2].alias("u3"),
                      u[3].alias("u4"), clat.alias("clat"),
                      clng.alias("clng")).collect()[0]
    assert (row2["u1"], row2["u2"], row2["u3"], row2["u4"]) == (0.0, 1.0, 3.0, 5.0)
    assert (row2["clat"], row2["clng"]) == (1.5, 3.0)

    # box(polyline): bbox of a line column (box_test.cc:5-12)
    line_df = spark.createDataFrame(
        [([{"lat": 50.0, "lng": 8.0}, {"lat": 49.0, "lng": 9.5}],)],
        "line array<struct<lat:double,lng:double>>",
    )
    bb = K.box_of_line("line")
    row3 = line_df.select(bb[0].alias("x1"), bb[1].alias("y1"),
                          bb[2].alias("x2"), bb[3].alias("y2")).collect()[0]
    assert (row3["x1"], row3["y1"], row3["x2"], row3["y2"]) == (49.0, 8.0, 50.0, 9.5)


def test_od_matrix_first_last_selection(spark):
    """min_by/max_by struct argmin picks the (ts, event_id)-first and
    -last rows per user — including when the last event has an
    EARLIER row position and when ts ties break on event_id."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __spark_entry__ as E
    from pyspark.sql import functions as F

    rows = [
        # user 1: ts tie at the start -> event_id breaks it
        (1, 5, 100, 10.0, 10.0, 1.0),
        (1, 5, 99, 20.0, 20.0, 2.0),   # first (same ts, lower id)
        (1, 9, 101, 30.0, 30.0, 3.0),  # last
        # user 2: single event -> origin == destination
        (2, 1, 200, -40.0, 50.0, 7.5),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts long, event_id long, lat double,"
              " lng double, value double")
    key = F.struct("ts", "event_id")
    ends = df.groupBy("user_id").agg(
        F.min_by(F.struct("lat", "lng"), key).alias("o"),
        F.max_by(F.struct("lat", "lng"), key).alias("d"),
    ).collect()
    got = {r.user_id: (r.o.lat, r.o.lng, r.d.lat, r.d.lng) for r in ends}
    assert got[1] == (20.0, 20.0, 30.0, 30.0)
    assert got[2] == (-40.0, 50.0, -40.0, 50.0)
