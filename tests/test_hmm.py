"""HMM (Viterbi) map matching: the parallel-road fixture where
per-point greedy snapping zig-zags and trajectory continuity must
not, plus bit-parity with the plain-Python twin."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from geospark.hmm import viterbi_map_match


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("hmm-test")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    yield s


def _fixture():
    # two parallel east-west roads ~200 m apart
    road1, road2 = 48.1000, 48.1018
    segs = []
    for line, la in ((1, road1), (2, road2)):
        for i in range(4):
            segs.append((line, i, (la, 11.500 + 0.005 * i),
                         (la, 11.500 + 0.005 * (i + 1))))
    # trajectory driving road 1; observations 3-4 have GPS noise
    # pulling them CLOSER to road 2
    lat_near1, lat_near2 = 48.1004, 48.1012
    pts = []
    for t in range(7):
        la = lat_near2 if t in (3, 4) else lat_near1
        pts.append((9, t, 100 + t, la, 11.5005 + 0.0027 * t))
    return pts, segs


def test_viterbi_beats_greedy_on_parallel_roads(spark):
    from geospark.joins import match_points_to_segments

    pts, segs = _fixture()
    pts_df = spark.createDataFrame(
        pts, "user_id long, seq long, point_id long, lat double, lng double")
    seg_df = spark.createDataFrame(
        [(l, i, f[0], f[1], t[0], t[1]) for l, i, f, t in segs],
        "line_id long, seg_idx int, f_lat double, f_lng double, "
        "t_lat double, t_lng double")
    # greedy zig-zags: the noisy observations snap to road 2
    greedy = {
        r["point_id"]: r["line_id"]
        for r in match_points_to_segments(
            pts_df.select("point_id", "lat", "lng"), seg_df, 1000.0
        ).collect()
    }
    assert greedy[103] == 2 and greedy[104] == 2
    assert greedy[100] == 1
    # Viterbi holds road 1 for the whole trajectory
    got = {
        r["point_id"]: r["line_id"]
        for r in viterbi_map_match(pts_df, seg_df, 1000.0, k=2,
                                   trans_weight=200).collect()
    }
    assert got == {100 + t: 1 for t in range(7)}


def test_viterbi_matches_golden_twin(spark):
    from geospark.goldens import viterbi_match_py

    pts, segs = _fixture()
    # add a second, shorter trajectory that genuinely lives on road 2
    pts = pts + [(5, t, 200 + t, 48.1016, 11.5010 + 0.003 * t)
                 for t in range(3)]
    pts_df = spark.createDataFrame(
        pts, "user_id long, seq long, point_id long, lat double, lng double")
    seg_df = spark.createDataFrame(
        [(l, i, f[0], f[1], t[0], t[1]) for l, i, f, t in segs],
        "line_id long, seg_idx int, f_lat double, f_lng double, "
        "t_lat double, t_lng double")
    got = sorted(
        (r["user_id"], r["seq"], r["point_id"], r["line_id"], r["seg_idx"])
        for r in viterbi_map_match(pts_df, seg_df, 1000.0, k=2,
                                   trans_weight=200).collect()
    )
    want = sorted(viterbi_match_py(pts, segs, 1000.0, 2, 200))
    assert got == want
    # the road-2 trajectory stays on road 2
    assert all(l == 2 for u, _, _, l, _ in want if u == 5)
