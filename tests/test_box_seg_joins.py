"""box_overlap_join / segment_intersection_join: brute-force parity on
deterministic pseudo-random fixtures (every candidate produced by the
cover join must equal the O(n^2) reference answer)."""

from __future__ import annotations


from geospark.joins import box_overlap_join, segment_intersection_join


def _boxes(seed: int, n: int, big_every: int = 0):
    """Deterministic boxes around Europe; every ``big_every``-th is a
    continent-scale box (exercises the broadcast big-branch)."""
    out = []
    for i in range(n):
        h1, h2, h3, h4 = (
            (i * 7919 + seed) % 997,
            (i * 104729 + seed) % 983,
            (i * 131 + seed) % 977,
            (i * 137 + seed) % 971,
        )
        lat = 35.0 + h1 * 0.008
        lng = -10.0 + h2 * 0.012
        dlat = 0.05 + h3 * 0.004
        dlng = 0.05 + h4 * 0.004
        if big_every and i % big_every == 0:
            dlat, dlng = 25.0, 40.0
        out.append((i, lat, lng, lat + dlat, lng + dlng))
    return out


def _brute_pairs(a, b):
    res = set()
    for ida, alat0, alng0, alat1, alng1 in a:
        for idb, blat0, blng0, blat1, blng1 in b:
            if (alat0 <= blat1 and alat1 >= blat0
                    and alng0 <= blng1 and alng1 >= blng0):
                res.add((ida, idb))
    return res


BOX_SCHEMA = "box_id long, min_lat double, min_lng double, max_lat double, max_lng double"


def test_box_overlap_join_brute_parity(spark):
    a = _boxes(1, 60)
    b = _boxes(500, 50)
    got = box_overlap_join(
        spark.createDataFrame(a, BOX_SCHEMA),
        spark.createDataFrame(b, BOX_SCHEMA),
        zoom=8,
    ).collect()
    want = _brute_pairs(a, b)
    assert want, "fixture produced no overlaps — broken test"
    assert {(r["id_a"], r["id_b"]) for r in got} == want
    # contains flags agree with the raw predicate
    am = {r[0]: r for r in a}
    bm = {r[0]: r for r in b}
    for r in got:
        _, a0, a1, a2, a3 = am[r["id_a"]]
        _, b0, b1, b2, b3 = bm[r["id_b"]]
        assert r["a_contains_b"] == (
            b0 >= a0 and b2 <= a2 and b1 >= a1 and b3 <= a3
        )
        assert r["b_contains_a"] == (
            a0 >= b0 and a2 <= b2 and a1 >= b1 and a3 <= b3
        )


def test_box_overlap_join_big_branch(spark):
    """Oversized boxes (cover > cover_limit) must still pair exactly —
    the three-branch split may not double-count or drop."""
    a = _boxes(7, 40, big_every=9)
    b = _boxes(900, 30, big_every=7)
    got = box_overlap_join(
        spark.createDataFrame(a, BOX_SCHEMA),
        spark.createDataFrame(b, BOX_SCHEMA),
        zoom=8, cover_limit=16,
    ).collect()
    pairs = [(r["id_a"], r["id_b"]) for r in got]
    assert len(pairs) == len(set(pairs)), "duplicate pairs emitted"
    want = _brute_pairs(a, b)
    assert want, "fixture produced no overlaps — broken test"
    assert set(pairs) == want


def _segs(seed: int, n: int):
    out = []
    for i in range(n):
        h1 = (i * 7919 + seed) % 997
        h2 = (i * 104729 + seed) % 983
        h3 = (i * 131 + seed) % 797
        h4 = (i * 137 + seed) % 787
        f_lat = 45.0 + h1 * 0.001
        f_lng = 5.0 + h2 * 0.001
        out.append((i, f_lat, f_lng,
                    f_lat + (h3 - 398) * 0.0004,
                    f_lng + (h4 - 393) * 0.0004))
    return out


def _sgn(x):
    return (x > 0) - (x < 0)


def _orient(px, py, qx, qy, rx, ry):
    return _sgn((qx - px) * (ry - py) - (qy - py) * (rx - px))


def _seg_intersect(s, t):
    _, ay0, ax0, ay1, ax1 = s
    _, by0, bx0, by1, bx1 = t
    o1 = _orient(ax0, ay0, ax1, ay1, bx0, by0)
    o2 = _orient(ax0, ay0, ax1, ay1, bx1, by1)
    o3 = _orient(bx0, by0, bx1, by1, ax0, ay0)
    o4 = _orient(bx0, by0, bx1, by1, ax1, ay1)
    if o1 != o2 and o3 != o4:
        return True

    def on(px, py, qx, qy, rx, ry):
        return (min(px, qx) <= rx <= max(px, qx)
                and min(py, qy) <= ry <= max(py, qy))

    return ((o1 == 0 and on(ax0, ay0, ax1, ay1, bx0, by0))
            or (o2 == 0 and on(ax0, ay0, ax1, ay1, bx1, by1))
            or (o3 == 0 and on(bx0, by0, bx1, by1, ax0, ay0))
            or (o4 == 0 and on(bx0, by0, bx1, by1, ax1, ay1)))


SEG_SCHEMA = "seg_id long, f_lat double, f_lng double, t_lat double, t_lng double"


def test_segment_intersection_join_brute_parity(spark):
    a = _segs(3, 120)
    b = _segs(7000, 120)
    got = segment_intersection_join(
        spark.createDataFrame(a, SEG_SCHEMA),
        spark.createDataFrame(b, SEG_SCHEMA),
        zoom=14,
    ).collect()
    want = {
        (s[0], t[0]) for s in a for t in b if _seg_intersect(s, t)
    }
    assert want, "fixture produced no intersections — broken test"
    assert {(r["id_a"], r["id_b"]) for r in got} == want


def test_segment_intersection_self_join_touching(spark):
    """Shared endpoints count as intersections; disjoint parallels do
    not; the cover join finds crossings whose segments share no
    endpoint tile row."""
    segs = [
        (0, 0.0, 0.0, 1.0, 1.0),
        (1, 1.0, 0.0, 0.0, 1.0),   # crosses 0 at (0.5, 0.5)
        (2, 1.0, 1.0, 2.0, 2.0),   # touches 0 at (1, 1)
        (3, 5.0, 5.0, 6.0, 5.0),   # far away
        (4, 0.0, 0.5, 2.0, 0.5),   # vertical, crosses 0 and 1
    ]
    df = spark.createDataFrame(segs, SEG_SCHEMA)
    got = segment_intersection_join(df, df, zoom=14).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in got if r["id_a"] < r["id_b"]}
    assert pairs == {(0, 1), (0, 2), (0, 4), (1, 4)}
