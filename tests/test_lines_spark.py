"""Polyline operators as Spark plans vs numpy oracles + reference
fixtures (test/polyline_test.cc course, polyline_format_test.cc)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from geospark import lines as L
from geospark.functions import numpy_kernels as NK

# 8-point course from test/polyline_test.cc:12-24
COURSE = [
    (49.87810348510742, 8.654789924621582),
    (49.87817764282227, 8.655288696289062),
    (49.87831115722656, 8.656148910522461),
    (49.878414154052734, 8.656842231750488),
    (49.87851333618164, 8.657508850097656),
    (49.87859344482422, 8.658072471618652),
    (49.87862014770508, 8.658266067504883),
    (49.87869262695312, 8.658742904663086),
]


def _line_df(spark, pts=COURSE, line_id=0):
    data = [(line_id, [{"lat": p[0], "lng": p[1]} for p in pts])]
    return spark.createDataFrame(data, f"line_id long, line {L.LINE_TYPE}")


def test_length(spark):
    df = _line_df(spark)
    got = df.select(L.length("line").alias("len_m")).collect()[0]["len_m"]
    lats = np.array([p[0] for p in COURSE])
    lngs = np.array([p[1] for p in COURSE])
    expect = float(np.sum(NK.distance(lats[:-1], lngs[:-1], lats[1:], lngs[1:])))
    assert abs(got - expect) < 1e-9


def test_extract_forward_backward(spark):
    df = _line_df(spark)
    fwd = df.select(L.extract("line", 2, 4).alias("sub")).collect()[0]["sub"]
    assert [(p["lat"], p["lng"]) for p in fwd] == COURSE[2:5]
    bwd = df.select(L.extract("line", 4, 2).alias("sub")).collect()[0]["sub"]
    assert [(p["lat"], p["lng"]) for p in bwd] == COURSE[2:5][::-1]


def test_serde_roundtrip(spark):
    df = _line_df(spark)
    flat = df.select(L.serialize("line").alias("flat"))
    back = flat.select(L.deserialize("flat").alias("line")).collect()[0]["line"]
    assert [(p["lat"], p["lng"]) for p in back] == COURSE


def test_simplify_mask_udf_matches_numpy(spark):
    df = _line_df(spark)
    got = df.select(L.make_simplify_mask_udf()(F.col("line")).alias("m")).collect()[0]["m"]
    lats = np.array([p[0] for p in COURSE])
    lngs = np.array([p[1] for p in COURSE])
    expect = NK.serialize_simplify_mask(NK.make_simplify_mask(lats, lngs))
    assert bytes(got) == expect


def test_apply_mask_roundtrip(spark):
    df = _line_df(spark).withColumn("m", L.make_simplify_mask_udf()(F.col("line")))
    out = df.select(L.apply_simplify_mask_udf(0)(F.col("m"), F.col("line")).alias("s"))
    line0 = out.collect()[0]["s"]
    assert line0[0]["lat"] == COURSE[0][0]
    assert line0[-1]["lat"] == COURSE[-1][0]
    assert 2 <= len(line0) <= len(COURSE)
    # z20 mask keeps everything on this short course
    out20 = df.select(L.apply_simplify_mask_udf(20)(F.col("m"), F.col("line")).alias("s"))
    assert len(out20.collect()[0]["s"]) == len(COURSE)


def test_codec_udfs_google_example(spark):
    pts = [(38.5, -120.2), (40.7, -120.95), (43.252, -126.453)]
    df = _line_df(spark, pts)
    enc = df.select(L.encode_polyline_udf(5)(F.col("line")).alias("e")).collect()[0]["e"]
    assert enc == "_p~iF~ps|U_ulLnnqC_mqNvxq`@"
    dec = (
        df.withColumn("e", L.encode_polyline_udf(5)(F.col("line")))
        .select(L.decode_polyline_udf(5)(F.col("e")).alias("d"))
        .collect()[0]["d"]
    )
    for (lat, lng), p in zip(pts, dec):
        assert abs(p["lat"] - lat) < 1e-5 and abs(p["lng"] - lng) < 1e-5


def test_distance_to_polyline_course(spark):
    """test/polyline_test.cc:26-88: before/on/after the course."""
    cases = [
        # (query point, expected segment idx)
        ((49.87809944152832, 8.654722213745117), 0),   # before start -> seg 0
        ((49.87831115722656, 8.656148910522461), 1),   # exactly vertex 2 (end of seg 1)
        ((49.878695, 8.658742904663086), 6),           # near end
    ]
    rows = [
        (i, q[0], q[1], [{"lat": p[0], "lng": p[1]} for p in COURSE])
        for i, (q, _) in enumerate(cases)
    ]
    df = spark.createDataFrame(
        rows, f"pair_id long, qlat double, qlng double, line {L.LINE_TYPE}"
    )
    got = {
        r["pair_id"]: r
        for r in L.distance_to_polyline(df, "qlat", "qlng", "line", ["pair_id"]).collect()
    }
    for i, (q, seg) in enumerate(cases):
        assert got[i]["seg_idx"] == seg, (i, got[i])
    # vertex case: distance 0, closest == the vertex
    assert got[1]["dist_m"] < 1e-6


def test_cluster_nearby_spark_matches_reference(spark):
    """Distributed two-stage clustering == reference single-node
    algorithm (numpy twin) after canonicalization."""
    from geospark.cluster import cluster_nearby

    rng = np.random.RandomState(7)
    # three compact blobs + isolated points
    blobs = [
        (49.87, 8.65), (52.52, 13.40), (-33.86, 151.20),
    ]
    lats, lngs = [], []
    for blat, blng in blobs:
        lats.extend(blat + rng.uniform(-0.003, 0.003, 5))
        lngs.extend(blng + rng.uniform(-0.003, 0.003, 5))
    lats.extend([10.0, -60.0])
    lngs.extend([10.0, -120.0])
    n = len(lats)
    df = spark.createDataFrame(
        [(i, float(lats[i]), float(lngs[i])) for i in range(n)],
        "point_id long, lat double, lng double",
    )
    got = {
        r["point_id"]: r["cluster_id"]
        for r in cluster_nearby(df, 1000.0).collect()
    }
    ref = NK.cluster_nearby(np.array(lats), np.array(lngs), 1000.0)

    def canon(labels: dict[int, int]) -> dict[int, int]:
        groups: dict[int, list[int]] = {}
        for pid, c in labels.items():
            groups.setdefault(c, []).append(pid)
        return {pid: min(g) for g in groups.values() for pid in g}

    ref_labels = canon({i: int(ref[i]) for i in range(n)})
    got_labels = canon(got)
    assert got_labels == ref_labels


def test_cluster_second_contraction_round_parity(spark):
    """Forcing the second distributed contraction round
    (second_round_threshold=0) must produce identical labels — the
    reduced spanning pairs preserve connectivity exactly."""
    from geospark.cluster import cluster_nearby

    rng = np.random.RandomState(11)
    # chains crossing region borders: points spaced ~700m so edges
    # span cells and the contracted graph is non-empty
    lats, lngs = [], []
    for k in range(6):
        base_lat, base_lng = 40.0 + k * 0.5, 7.0 + k * 0.3
        for j in range(8):
            lats.append(base_lat + j * 0.006)
            lngs.append(base_lng)
    n = len(lats)
    df = spark.createDataFrame(
        [(i, float(lats[i]), float(lngs[i])) for i in range(n)],
        "point_id long, lat double, lng double",
    )
    base = {
        r["point_id"]: r["cluster_id"]
        for r in cluster_nearby(df, 1000.0, max_refine_size=0).collect()
    }
    forced = {
        r["point_id"]: r["cluster_id"]
        for r in cluster_nearby(
            df, 1000.0, max_refine_size=0, second_round_threshold=0
        ).collect()
    }
    assert base == forced
    # sanity: the chains actually merged into multi-member components
    from collections import Counter
    sizes = Counter(base.values())
    assert max(sizes.values()) >= 8


def test_cluster_high_latitude_edges(spark):
    """Mercator cells shrink as cos(lat): a fixed 3x3 neighborhood
    sized at the equator MISSES near-threshold pairs at high latitude
    (found at 12M-point stress scale). The disk-cover edge build must
    merge ~900m pairs at lat 60 and 84 with max_dist=1000."""
    import math

    from geospark.cluster import _zoom_for_dist, cluster_nearby

    z = _zoom_for_dist(1000.0)
    cell_deg = 360.0 / (1 << z)
    rows, pid = [], 0
    expected_pairs = []
    for lat in (60.0, 75.0, 84.0, -60.0):
        dlng = 900.0 / (111320.0 * math.cos(math.radians(lat)))
        base = 8.0 - (8.0 % cell_deg) + 0.9 * cell_deg  # straddle a boundary
        rows.append((pid, lat, base))
        rows.append((pid + 1, lat, base + dlng))
        expected_pairs.append((pid, pid + 1))
        pid += 2
    df = spark.createDataFrame(rows, "point_id long, lat double, lng double")
    out = {r["point_id"]: r["cluster_id"]
           for r in cluster_nearby(df, 1000.0).collect()}
    for a, b in expected_pairs:
        assert out[a] == out[b], (a, b, out)
    # distinct latitude bands stay separate
    assert len(set(out.values())) == len(expected_pairs)


def test_resample_matches_python_twin(spark):
    """lines.resample == a from-scratch scalar twin on a small mixed
    trajectory set (short/long/degenerate-zero segments), including
    the half-open boundary rule and the k=0 tick at the start."""
    import math

    from geospark.functions import kernels as K
    from geospark.lines import resample

    def hav(a, b):
        la1, ln1, la2, ln2 = map(math.radians, (a[0], a[1], b[0], b[1]))
        s = (math.sin((la2 - la1) / 2) ** 2 + math.cos(la1) * math.cos(la2)
             * math.sin((ln2 - ln1) / 2) ** 2)
        return 2 * K.EARTH_RADIUS_M * math.asin(min(1.0, math.sqrt(s)))

    trajs = {
        1: [(0.0, 0.0), (0.0, 1.0), (0.0, 1.0), (1.0, 1.0), (5.0, 9.0)],
        2: [(50.0, 10.0)],                      # single point: no ticks? k=0 needs a segment
        3: [(10.0, 10.0), (10.0, 10.4)],
    }
    rows = []
    for u, seq in trajs.items():
        for i, (la, ln) in enumerate(seq):
            rows.append((u, i, i, la, ln))
    df = spark.createDataFrame(rows, "user_id long, ts long, event_id long,"
                                     " lat double, lng double")
    step_m = 20_000.0
    step_cm = int(round(step_m * 100))
    got = {(r.user_id, r.tick_idx): (r.r_lat, r.r_lng)
           for r in resample(df, step_m).collect()}

    want = {}
    for u, seq in trajs.items():
        cum = 0
        for (a, b) in zip(seq, seq[1:]):
            ln_cm = int(math.floor(hav(a, b) * 100.0))
            if ln_cm <= 0:
                continue
            cum0, cum = cum, cum + ln_cm
            k_lo = (cum0 + step_cm - 1) // step_cm
            k_hi = (cum - 1) // step_cm
            for k in range(k_lo, k_hi + 1):
                f = (k * step_cm - cum0) / ln_cm
                want[(u, k)] = (a[0] + f * (b[0] - a[0]),
                                a[1] + f * (b[1] - a[1]))
    assert set(got) == set(want)
    for key in want:
        assert got[key] == want[key], key
    # start tick exists and equals the first point exactly
    assert got[(1, 0)] == (0.0, 0.0)
    assert (2, 0) not in got  # single point -> no segments -> no ticks


def test_apply_mask_null_line_stays_null(spark):
    """A NULL line with a NON-null mask (mask stored separately and
    re-joined) must yield NULL, not an array of null structs —
    regression for the JVM transform/element_at reassembly."""
    base = _line_df(spark)
    df = base.withColumn(
        "m", L.make_simplify_mask_udf()(F.col("line"))
    ).withColumn("line", F.lit(None).cast(base.schema["line"].dataType))
    out = df.select(
        L.apply_simplify_mask_udf(0)(F.col("m"), F.col("line")).alias("s"),
        F.size(L.apply_simplify_mask_udf(0)(F.col("m"), F.col("line")))
        .alias("n"))
    row = out.collect()[0]
    assert row["s"] is None
    assert row["n"] is None  # size(NULL), not a count of null structs


def test_simplify_udf_one_shot(spark):
    """M7/L2 one-shot degree-tolerance DP via the numeric-array UDF
    boundary: keep-mask parity with the kernel, NULL stays NULL,
    degenerate 0/1/2-point lines pass through unchanged."""
    import numpy as np

    from geospark import lines as L
    from geospark.functions import numpy_kernels as NK

    rng = np.random.default_rng(7)
    lats = rng.uniform(-60, 60, 40)
    lngs = rng.uniform(-170, 170, 40)
    line = [(float(a), float(b)) for a, b in zip(lats, lngs)]
    rows = [(1, line), (2, None), (3, []), (4, line[:1]), (5, line[:2])]
    df = spark.createDataFrame(
        rows, "id long, line array<struct<lat:double,lng:double>>")
    got = {r["id"]: r["s"] for r in df.select(
        "id", L.simplify_udf(5.0)("line").alias("s")).collect()}
    keep = NK.simplify_dp_latlng(lats, lngs, 5.0)
    want = [p for k, p in zip(keep, line) if k]
    assert [(p["lat"], p["lng"]) for p in got[1]] == want
    assert got[2] is None
    assert got[3] == []
    assert [(p["lat"], p["lng"]) for p in got[4]] == line[:1]
    assert [(p["lat"], p["lng"]) for p in got[5]] == line[:2]
