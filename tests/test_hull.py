"""Convex hull: monotone chain (engine) vs Jarvis march (oracle twin)
must agree vertex-for-vertex — two algorithms, one canonical form."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from geospark.goldens import convex_hull_jarvis
from geospark.hull import convex_hull, monotone_chain


def _chain_canonical(latlngs):
    import math

    xy = [
        (int(math.floor(ln * 1e7 + 0.5)), int(math.floor(la * 1e7 + 0.5)))
        for la, ln in latlngs
    ]
    return [(i, p[1], p[0]) for i, p in enumerate(monotone_chain(xy))]


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_chain_equals_jarvis_random(seed):
    rng = random.Random(seed)
    pts = [(rng.uniform(-80, 80), rng.uniform(-179, 179))
           for _ in range(rng.randrange(1, 200))]
    assert _chain_canonical(pts) == convex_hull_jarvis(pts)


def test_chain_equals_jarvis_degenerate():
    # single point / duplicates / all-collinear / tiny grid (many
    # collinear runs and exact ties)
    cases = [
        [(10.0, 20.0)],
        [(10.0, 20.0)] * 5,
        [(i * 1.0, i * 2.0) for i in range(7)],           # one line
        [(0.0, 0.0), (0.0, 1.0), (0.0, 2.0)],             # vertical
        [(float(a), float(b)) for a in range(4) for b in range(4)],
    ]
    rng = random.Random(99)
    cases.append([(float(rng.randrange(3)), float(rng.randrange(3)))
                  for _ in range(60)])
    for pts in cases:
        assert _chain_canonical(pts) == convex_hull_jarvis(pts), pts


def test_convex_hull_spark_matches_twin(spark):
    rng = random.Random(7)
    rows = [(u, rng.uniform(-60, 60), rng.uniform(-170, 170))
            for u in range(20) for _ in range(rng.randrange(1, 40))]
    df = spark.createDataFrame(rows, "user_id long, lat double, "
                                     "lng double")
    got = {}
    for r in convex_hull(df).collect():
        got.setdefault(r["user_id"], []).append(
            (r["hull_idx"], r["h_lat7"], r["h_lng7"]))
    for u in range(20):
        pts = [(la, ln) for uu, la, ln in rows if uu == u]
        assert sorted(got[u]) == convex_hull_jarvis(pts), u


def test_convex_hull_string_group_key(spark):
    """The grouped-kernel schema must carry the group column's REAL
    type — a string key used to crash on the hardcoded `long`."""
    rows = [("site-a", 0.0, 0.0), ("site-a", 0.0, 1.0),
            ("site-a", 1.0, 0.0), ("site-b", 5.0, 5.0)]
    df = spark.createDataFrame(rows, "site string, lat double, lng double")
    got = {}
    for r in convex_hull(df, group="site").collect():
        got.setdefault(r["site"], []).append(
            (r["hull_idx"], r["h_lat7"], r["h_lng7"]))
    assert sorted(got) == ["site-a", "site-b"]
    assert sorted(got["site-a"]) == convex_hull_jarvis(
        [(0.0, 0.0), (0.0, 1.0), (1.0, 0.0)])
    assert sorted(got["site-b"]) == convex_hull_jarvis([(5.0, 5.0)])
