"""Fréchet distance + ring shoelace semantics."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from geospark.goldens import frechet_to_ref_py
from geospark.lines import frechet_to_ref, ring_shoelace


def _traj_df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, "
              "lat double, lng double")


def test_frechet_known_values(spark):
    ref = [(0.0, 0.0), (0.0, 1.0)]
    t0 = datetime(2024, 1, 1)
    rows = [
        # user 1 walks the reference path exactly -> 0
        (1, 1, t0, 0.0, 0.0), (1, 2, t0.replace(hour=1), 0.0, 1.0),
        # user 2 walks it OFFSET 0.1 deg north -> ~11119 m everywhere
        (2, 3, t0, 0.1, 0.0), (2, 4, t0.replace(hour=1), 0.1, 1.0),
        # user 3 walks it BACKWARD -> the coupling must pay the full
        # path length (~111 km), unlike Hausdorff which would be 0
        (3, 5, t0, 0.0, 1.0), (3, 6, t0.replace(hour=1), 0.0, 0.0),
    ]
    out = {r["user_id"]: r["frechet_m"] for r in
           frechet_to_ref(_traj_df(spark, rows), ref).collect()}
    assert out[1] == 0
    assert 11_000 < out[2] < 11_200
    assert out[3] > 100_000
    # every value matches the recursive twin
    for u, traj in ((1, [(0.0, 0.0), (0.0, 1.0)]),
                    (2, [(0.1, 0.0), (0.1, 1.0)]),
                    (3, [(0.0, 1.0), (0.0, 0.0)])):
        assert out[u] == frechet_to_ref_py(traj, ref)[1]


def test_frechet_single_point(spark):
    ref = [(0.0, 0.0), (0.0, 1.0)]
    rows = [(9, 1, datetime(2024, 1, 1), 0.0, 0.5)]
    out = frechet_to_ref(_traj_df(spark, rows), ref).collect()[0]
    assert out["n_pts"] == 1
    # a single point must visit both ref vertices: max of the two
    n, want = frechet_to_ref_py([(0.0, 0.5)], ref)
    assert out["frechet_m"] == want > 0


def test_ring_shoelace_unit_square_windings(spark):
    sq = [(0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0)]  # (lat,lng)
    rows = []
    for i, (la, ln) in enumerate(sq):                  # CCW (x=lng)
        rows.append((1, "outer", 0, i, la, ln))
    for i, (la, ln) in enumerate(reversed(sq)):        # CW
        rows.append((2, "outer", 0, i, la, ln))
    v = spark.createDataFrame(
        rows, "area_id long, ring_kind string, ring_idx long, "
              "vtx_idx long, lat double, lng double")
    out = {r["area_id"]: r for r in
           ring_shoelace(v, ["area_id", "ring_kind", "ring_idx"])
           .collect()}
    q = 100_000
    assert out[1]["area2_q"] == 2 * q * q and out[1]["winding"] == 1
    assert out[2]["area2_q"] == -2 * q * q and out[2]["winding"] == -1
    assert out[1]["n_vtx"] == 4
