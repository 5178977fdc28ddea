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


def test_hausdorff_order_insensitive_vs_frechet(spark):
    from geospark.lines import hausdorff_to_ref

    ref = [(0.0, 0.0), (0.0, 1.0)]
    t0 = datetime(2024, 1, 1)
    rows = [
        # exact path -> 0 both directions
        (1, 1, t0, 0.0, 0.0), (1, 2, t0.replace(hour=1), 0.0, 1.0),
        # BACKWARD path: hausdorff 0 (sets are equal) where frechet
        # pays the full ~111 km — the operator-pair contrast
        (3, 5, t0, 0.0, 1.0), (3, 6, t0.replace(hour=1), 0.0, 0.0),
        # one point sitting ON ref[0]: directed traj->ref is 0 but
        # ref->traj must pay ref[1]'s distance (asymmetry is real)
        (4, 7, t0, 0.0, 0.0),
    ]
    out = {r["user_id"]: r for r in
           hausdorff_to_ref(_traj_df(spark, rows), ref).collect()}
    assert out[1]["hausdorff_m"] == 0
    assert out[3]["hausdorff_m"] == 0
    fr = {r["user_id"]: r["frechet_m"] for r in
          frechet_to_ref(_traj_df(spark, rows), ref).collect()}
    assert fr[3] > 100_000  # same sets, order-sensitive metric pays
    assert out[4]["h_traj_ref_m"] == 0
    assert 110_000 < out[4]["h_ref_traj_m"] < 112_000
    assert out[4]["hausdorff_m"] == out[4]["h_ref_traj_m"]


def test_hausdorff_matches_brute_force(spark):
    import numpy as np

    from geospark.lines import hausdorff_to_ref

    rng = np.random.RandomState(7)
    ref = [(float(la), float(ln)) for la, ln in
           zip(rng.uniform(49, 51, 5), rng.uniform(7, 9, 5))]
    t0 = datetime(2024, 1, 1)
    rows = []
    pts: dict[int, list[tuple[float, float]]] = {}
    eid = 0
    for u in range(1, 6):
        n = int(rng.randint(1, 12))
        for _ in range(n):
            la = float(rng.uniform(49, 51))
            ln = float(rng.uniform(7, 9))
            rows.append((u, eid, t0, la, ln))
            pts.setdefault(u, []).append((la, ln))
            eid += 1

    def hav(a, b):
        la1, ln1 = np.radians(a)
        la2, ln2 = np.radians(b)
        x = (np.sin((la2 - la1) / 2) ** 2
             + np.cos(la1) * np.cos(la2) * np.sin((ln2 - ln1) / 2) ** 2)
        return int(2 * 6371000.0 * np.arcsin(min(1.0, np.sqrt(x))))

    out = {r["user_id"]: r for r in
           hausdorff_to_ref(_traj_df(spark, rows), ref).collect()}
    for u, ps in pts.items():
        fwd = max(min(hav(p, r) for r in ref) for p in ps)
        bwd = max(min(hav(r, p) for p in ps) for r in ref)
        assert out[u]["h_traj_ref_m"] == fwd
        assert out[u]["h_ref_traj_m"] == bwd
        assert out[u]["hausdorff_m"] == max(fwd, bwd)
        assert out[u]["n_pts"] == len(ps)


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


def test_frechet_string_user_key(spark):
    """frechet_to_ref must preserve a non-long user key's type in the
    grouped-map schema (regression for the hardcoded `long`)."""
    ref = [(0.0, 0.0), (0.0, 1.0)]
    t0 = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("dev-x", 1, t0, 0.0, 0.0), ("dev-x", 2, t0, 0.0, 1.0)],
        "user_id string, event_id long, ts timestamp, "
        "lat double, lng double")
    out = frechet_to_ref(df, ref).collect()
    assert len(out) == 1
    assert out[0]["user_id"] == "dev-x"
    assert out[0]["frechet_m"] == 0
