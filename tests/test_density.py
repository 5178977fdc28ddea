"""DBSCAN density classification: brute-force parity + label
semantics on constructed fixtures (geospark/density.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from geospark.density import density_classify, eps_pairs


def _hav(a, b):
    r = 6371000.0
    la1, ln1, la2, ln2 = map(math.radians, (a[0], a[1], b[0], b[1]))
    s = (math.sin((la2 - la1) / 2) ** 2
         + math.cos(la1) * math.cos(la2) * math.sin((ln2 - ln1) / 2) ** 2)
    return 2 * r * math.asin(min(1.0, math.sqrt(s)))


def _brute(rows, eps, min_pts):
    ids = [r[0] for r in rows]
    pos = {r[0]: (r[1], r[2]) for r in rows}
    nb = {i: 0 for i in ids}
    pairs = set()
    for i in ids:
        for j in ids:
            if i < j and _hav(pos[i], pos[j]) <= eps:
                nb[i] += 1
                nb[j] += 1
                pairs.add((i, j))
    core = {i for i in ids if nb[i] + 1 >= min_pts}
    labels = {}
    for i in ids:
        if i in core:
            labels[i] = "core"
        elif any((min(i, j), max(i, j)) in pairs and j in core
                 for j in ids if j != i):
            labels[i] = "border"
        else:
            labels[i] = "noise"
    return nb, labels, pairs


def test_density_brute_force_parity(spark):
    """Random-ish global scatter incl. a dense blob, a chain, and
    isolated points — counts and all three labels match brute force.
    Earth radius differs from the engine's (6371000 vs 6371e3? same) —
    kernels.distance uses EARTH_RADIUS_M; keep eps off any boundary."""
    rows = []
    # dense blob near Berlin (all within ~30 km)
    for k in range(6):
        rows.append((k, 52.5 + 0.05 * k, 13.4 + 0.03 * k))
    # a 2-point outpost ~60 km away: within eps of blob edge -> border
    rows.append((10, 52.5 + 0.05 * 5 + 0.5, 13.4 + 0.15))
    # isolated points
    rows.append((20, -33.9, 151.2))
    rows.append((21, 40.7, -74.0))
    # chain across the antimeridian
    rows.append((30, 10.0, 179.7))
    rows.append((31, 10.0, -179.8))
    rows.append((32, 10.0, -179.3))
    eps, min_pts = 80_000.0, 3
    df = spark.createDataFrame(rows, "point_id long, lat double, lng double")
    got = {r.point_id: (r.n_neighbors, r.label)
           for r in density_classify(df, eps, min_pts).collect()}
    nb, labels, _ = _brute(rows, eps, min_pts)
    assert set(got) == set(nb)
    for i in nb:
        assert got[i] == (nb[i], labels[i]), (i, got[i], (nb[i], labels[i]))
    assert {v[1] for v in got.values()} == {"core", "border", "noise"}


def test_eps_pairs_antimeridian_and_uniqueness(spark):
    """Pairs straddling the ±180 seam are found, and each unordered
    pair appears exactly once."""
    rows = [(0, 10.0, 179.95), (1, 10.0, -179.95), (2, 10.0, 179.80)]
    df = spark.createDataFrame(rows, "point_id long, lat double, lng double")
    # (0,1) straddles the seam at 0.10 deg (~10.9 km); (0,2) is 0.15
    # deg (~16.4 km); (1,2) is 0.25 deg (~27.4 km) — beyond eps
    pairs = [(r.pid, r.qid)
             for r in eps_pairs(df, 25_000.0).collect()]
    assert sorted(pairs) == [(0, 1), (0, 2)]
    assert len(pairs) == len(set(pairs))
    # widen eps so the far pair joins too
    pairs2 = [(r.pid, r.qid)
              for r in eps_pairs(df, 30_000.0).collect()]
    assert sorted(pairs2) == [(0, 1), (0, 2), (1, 2)]


def test_density_high_latitude_cover(spark):
    """The latitude-aware cover finds neighbors at lat 84 where a
    fixed 3x3 mercator neighborhood under-covers (the measured
    cluster_nearby bug class)."""
    rows = [(0, 84.0, 10.0), (1, 84.0, 10.9), (2, 84.0, 12.0)]
    # at lat 84: 1 deg lng ~ 11.6 km; eps 15 km links 0-1 and 1-2
    df = spark.createDataFrame(rows, "point_id long, lat double, lng double")
    got = {r.point_id: (r.n_neighbors, r.label)
           for r in density_classify(df, 15_000.0, 2).collect()}
    assert got[0][0] == 1 and got[1][0] == 2 and got[2][0] == 1
    assert all(v[1] == "core" for v in got.values())
