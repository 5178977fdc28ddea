"""polygon_overlap_join — exact polygon x polygon overlap detection.

Hand fixtures exercise every branch of the decomposition (edge cross,
containment each way, hole-annulus geometry); the randomized check
uses axis-aligned rectangles where ground truth is independent
interval logic (closed overlap on both axes), not any shared
geometry code.
"""

from __future__ import annotations

import pytest

from geospark.joins import polygon_overlap_join


def _rings_df(spark, rows):
    return spark.createDataFrame(
        rows, "area_id long, ring array<struct<lat: double, lng: double>>"
    )


def _rect(lat0, lng0, lat1, lng1):
    """CCW rectangle ring [(lat,lng)...]."""
    return [(lat0, lng0), (lat0, lng1), (lat1, lng1), (lat1, lng0)]


def _run(spark, a_rows, b_rows, zoom=4):
    out = polygon_overlap_join(
        _rings_df(spark, a_rows), _rings_df(spark, b_rows), zoom=zoom
    ).collect()
    return {(r["id_a"], r["id_b"]): r for r in out}


def test_overlap_branches_with_hole(spark):
    """A = square [0,10]^2 with hole [2,8]^2 (an annulus).
    B polygons probe every decomposition branch."""
    a = [
        (1, _rect(0.0, 0.0, 10.0, 10.0)),
        (1, _rect(2.0, 2.0, 8.0, 8.0)),       # hole ring
    ]
    b = [
        (10, _rect(4.0, 4.0, 6.0, 6.0)),      # strictly inside the hole
        (11, _rect(3.0, 3.0, 9.0, 9.0)),      # crosses the hole ring
        (16, _rect(1.0, 1.0, 9.0, 9.0)),      # sandwiched: contains the
                                              # hole ring, inside outer
        (12, _rect(0.5, 0.5, 1.5, 1.5)),      # inside the annulus band
        (13, _rect(-1.0, -1.0, 11.0, 11.0)),  # contains all of A
        (14, _rect(20.0, 20.0, 30.0, 30.0)),  # disjoint
        (15, _rect(1.5, 1.5, 8.5, 8.5)),      # contains the hole ring,
                                              # inside the outer: overlap
                                              # with NO edge crossing
    ]
    got = _run(spark, a, b)
    assert (1, 10) not in got            # hole interior is not A
    assert got[(1, 11)]["edge_cross"] == 1
    r16 = got[(1, 16)]   # no crossing; containment witnesses both ways
    assert r16["edge_cross"] == 0
    assert r16["a_in_b"] == 1 and r16["b_in_a"] == 1
    r12 = got[(1, 12)]
    assert r12["edge_cross"] == 0 and r12["b_in_a"] == 1
    r13 = got[(1, 13)]
    assert r13["edge_cross"] == 0 and r13["a_in_b"] == 1
    assert (1, 14) not in got
    r15 = got[(1, 15)]
    # no edge crossing; witnessed BOTH ways: B's rep sits in the
    # annulus band, and A's hole ring (part of A's closed set) sits
    # inside B
    assert r15["edge_cross"] == 0
    assert r15["a_in_b"] == 1 and r15["b_in_a"] == 1


def test_overlap_touching_counts(spark):
    """Closed semantics: rectangles sharing only a boundary edge or a
    single corner still report overlap, via the edge predicate."""
    a = [(1, _rect(0.0, 0.0, 5.0, 5.0))]
    b = [
        (20, _rect(0.0, 5.0, 5.0, 10.0)),    # shares the lng=5 edge
        (21, _rect(5.0, 5.0, 10.0, 10.0)),   # shares corner (5,5)
        (22, _rect(5.001, 5.001, 9.0, 9.0)),  # just misses
    ]
    got = _run(spark, a, b)
    assert got[(1, 20)]["edge_cross"] == 1
    assert got[(1, 21)]["edge_cross"] == 1
    assert (1, 22) not in got


def test_overlap_concave(spark):
    """Concave A (U shape): B inside the cavity does not overlap even
    though it is inside A's bbox hull."""
    # U opening upward (in lat): arms at lng [0,2] and [8,10],
    # base lat [0,2], arms rise to lat 10
    u = [(10.0, 0.0), (0.0, 0.0), (0.0, 10.0), (10.0, 10.0),
         (10.0, 8.0), (2.0, 8.0), (2.0, 2.0), (10.0, 2.0)]
    a = [(1, [(float(la), float(ln)) for la, ln in u])]
    b = [
        (30, _rect(5.0, 4.0, 7.0, 6.0)),   # in the cavity — no overlap
        (31, _rect(0.5, 4.0, 1.5, 6.0)),   # in the base — contained
        (32, _rect(1.0, 1.0, 3.0, 3.0)),   # crosses the inner corner
    ]
    got = _run(spark, a, b)
    assert (1, 30) not in got
    r31 = got[(1, 31)]
    assert r31["edge_cross"] == 0 and r31["b_in_a"] == 1
    assert got[(1, 32)]["edge_cross"] == 1


def test_overlap_random_rects_vs_interval_logic(spark):
    """60x20 random axis-aligned rectangle pairs: truth is closed
    interval overlap on both axes — an algorithm that shares nothing
    with the engine's cover/orientation/parity machinery."""
    import random

    rng = random.Random(20260819)

    def mk(n, lo, hi, max_side):
        rows = []
        for i in range(n):
            la0 = rng.uniform(lo, hi)
            ln0 = rng.uniform(2 * lo, 2 * hi)
            la1 = la0 + rng.uniform(0.5, max_side)
            ln1 = ln0 + rng.uniform(0.5, max_side)
            rows.append((i, la0, ln0, la1, ln1))
        return rows

    ra = mk(60, -40.0, 40.0, 15.0)
    rb = mk(20, -40.0, 40.0, 25.0)
    a = [(i, _rect(la0, ln0, la1, ln1)) for i, la0, ln0, la1, ln1 in ra]
    b = [(i, _rect(la0, ln0, la1, ln1)) for i, la0, ln0, la1, ln1 in rb]

    got = set(_run(spark, a, b, zoom=5).keys())
    want = {
        (ia, ib)
        for ia, a0, o0, a1, o1 in ra
        for ib, b0, p0, b1, p1 in rb
        if a0 <= b1 and b0 <= a1 and o0 <= p1 and p0 <= o1
    }
    assert got == want


def test_overlap_multipolygon_parts(spark):
    """Two disjoint outer rings under one area id: overlap holds if
    ANY part overlaps; a B between the parts reports nothing."""
    a = [
        (1, _rect(0.0, 0.0, 2.0, 2.0)),
        (1, _rect(0.0, 8.0, 2.0, 10.0)),
    ]
    b = [
        (40, _rect(0.5, 8.5, 1.5, 9.5)),   # inside the SECOND part
        (41, _rect(0.5, 4.0, 1.5, 6.0)),   # between the parts
    ]
    got = _run(spark, a, b)
    assert got[(1, 40)]["b_in_a"] == 1
    assert (1, 41) not in got


def test_polygon_dissolve_chain_touch_isolated(spark):
    """Dissolve: an overlap CHAIN merges transitively (A-B-C where A
    and C never touch), an edge-touching pair merges (closed
    semantics), an isolated polygon keeps its own id."""
    from geospark.joins import polygon_dissolve

    rows = [
        (1, _rect(0.0, 0.0, 2.0, 2.0)),
        (2, _rect(1.0, 1.0, 3.0, 3.0)),      # overlaps 1
        (3, _rect(2.5, 2.5, 4.0, 4.0)),      # overlaps 2, not 1
        (4, _rect(10.0, 10.0, 11.0, 11.0)),  # isolated from 1-3
        (5, _rect(11.0, 10.0, 12.0, 11.0)),  # shares edge lat=11 with 4
    ]
    got = {r["area_id"]: r for r in
           polygon_dissolve(_rings_df(spark, rows), zoom=6).collect()}
    assert {k: v["component"] for k, v in got.items()} == {
        1: 1, 2: 1, 3: 1, 4: 4, 5: 4,
    }
    assert got[1]["is_merged"] == 1 and got[3]["is_merged"] == 1
    assert got[4]["is_merged"] == 1   # touching counts as merged
    # a truly isolated polygon
    rows.append((6, _rect(-50.0, -50.0, -49.0, -49.0)))
    got2 = {r["area_id"]: r for r in
            polygon_dissolve(_rings_df(spark, rows), zoom=6).collect()}
    assert got2[6]["component"] == 6 and got2[6]["is_merged"] == 0
