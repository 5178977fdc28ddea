"""segment_tile_cover: the scanline supercover is sandwiched by two
independent geometric predicates (numpy Liang–Barsky), and its size is
output-linear (no bbox blowup on long diagonals)."""

import math

import numpy as np

from pyspark.sql import functions as F

from geospark.cells import segment_tile_cover

R = 6378137.0
SHIFT = 20037508.342789244
MAXLAT = 85.05112877980659


def _ct(lat, lng, z):
    mx = R * math.radians(lng)
    cl = max(-MAXLAT, min(MAXLAT, lat))
    s = math.sin(math.radians(cl))
    my = R * math.log((1.0 + s) / (1.0 - s)) / 2.0
    n = float(1 << z)
    return ((mx + SHIFT) / (2.0 * SHIFT) * n,
            (SHIFT - my) / (2.0 * SHIFT) * n)


def _seg_box_hits(p0, p1, tx, ty, closed_pad):
    """Liang–Barsky: does segment p0->p1 intersect the box
    [tx-pad, tx+1+pad] x [ty-pad, ty+1+pad]?  pad=0 => closed box,
    pad<0 => strictly interior box."""
    x0, y0 = p0
    x1, y1 = p1
    dx, dy = x1 - x0, y1 - y0
    t0, t1 = 0.0, 1.0
    for p, q in (
        (-dx, x0 - (tx - closed_pad)),
        (dx, (tx + 1 + closed_pad) - x0),
        (-dy, y0 - (ty - closed_pad)),
        (dy, (ty + 1 + closed_pad) - y0),
    ):
        if p == 0:
            if q < 0:
                return False
            continue
        r = q / p
        if p < 0:
            if r > t1:
                return False
            t0 = max(t0, r)
        else:
            if r < t0:
                return False
            t1 = min(t1, r)
    return t0 <= t1


def _cover(spark, segs, z):
    df = spark.createDataFrame(
        segs, "seg_id long, lat0 double, lng0 double, lat1 double, lng1 double"
    )
    rows = segment_tile_cover(df, z).select("seg_id", "tile_x", "tile_y") \
        .collect()
    out = {}
    for r in rows:
        out.setdefault(r["seg_id"], set()).add((r["tile_x"], r["tile_y"]))
    return out


def test_cover_sandwich_random(spark):
    rng = np.random.RandomState(17)
    z = 6
    n = float(1 << z)
    segs = []
    for i in range(60):
        segs.append((
            i,
            float(rng.uniform(-80, 80)), float(rng.uniform(-179, 179)),
            float(rng.uniform(-80, 80)), float(rng.uniform(-179, 179)),
        ))
    # degenerate shapes: point, horizontal, vertical
    segs += [(60, 10.0, 20.0, 10.0, 20.0),
             (61, 45.0, -30.0, 45.0, 60.0),
             (62, -20.0, 5.0, 55.0, 5.0)]
    cover = _cover(spark, segs, z)
    eps = 1e-9
    for i, la0, ln0, la1, ln1 in segs:
        p0, p1 = _ct(la0, ln0, z), _ct(la1, ln1, z)
        got = cover.get(i, set())
        assert got, f"segment {i} produced no tiles"
        # every emitted tile's closed box must touch the segment
        for tx, ty in got:
            assert _seg_box_hits(p0, p1, tx, ty, eps), (i, tx, ty)
        # every tile whose strict interior the segment crosses must be
        # emitted — scan the bbox neighborhood
        xlo = int(math.floor(min(p0[0], p1[0]))) - 1
        xhi = int(math.floor(max(p0[0], p1[0]))) + 1
        ylo = int(math.floor(min(p0[1], p1[1]))) - 1
        yhi = int(math.floor(max(p0[1], p1[1]))) + 1
        for tx in range(max(xlo, 0), min(xhi, int(n) - 1) + 1):
            for ty in range(max(ylo, 0), min(yhi, int(n) - 1) + 1):
                if _seg_box_hits(p0, p1, tx, ty, -eps):
                    assert (tx, ty) in got, (i, tx, ty)


def test_cover_output_linear_on_diagonal(spark):
    """A near-global diagonal at z=10 must emit O(dx+dy) tiles, not
    O(dx*dy): the scanline never enumerates the bbox."""
    z = 10
    segs = [(0, -75.0, -170.0, 75.0, 170.0)]
    got = _cover(spark, segs, z)[0]
    p0, p1 = _ct(-75.0, -170.0, z), _ct(75.0, 170.0, z)
    span = abs(p1[0] - p0[0]) + abs(p1[1] - p0[1])
    assert len(got) <= span + 4          # supercover bound
    assert len(got) >= max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]))


def test_cover_plan_is_jvm_only(spark):
    df = spark.createDataFrame(
        [(1, 0.0, 0.0, 1.0, 1.0)],
        "seg_id long, lat0 double, lng0 double, lat1 double, lng1 double",
    )
    plan = segment_tile_cover(df, 5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_supercover_golden_twin_parity(spark):
    """goldens.supercover_tiles is formula-identical to the Spark
    segment_tile_cover operator — checked on steep, flat, reversed,
    long and degenerate segments at two zooms."""
    from geospark.cells import segment_tile_cover
    from geospark.goldens import supercover_tiles

    segs = [
        (48.1, 11.5, 48.2, 11.9),      # shallow
        (48.2, 11.9, 10.0, 12.0),      # steep, reversed y
        (-5.0, -120.0, 60.0, 30.0),    # transcontinental
        (0.0, 0.0, 0.0, 0.0),          # degenerate point
        (20.0, 5.0, 20.0, 9.0),        # exactly flat in y
        (75.0, -30.0, 75.2, -29.0),    # high latitude
    ]
    for zoom in (4, 9):
        df = spark.createDataFrame(
            segs, "lat0 double, lng0 double, lat1 double, lng1 double")
        got = {}
        rows = segment_tile_cover(
            df.withColumn("sid", F.monotonically_increasing_id()), zoom
        ).collect()
        for r in rows:
            got.setdefault(
                (r["lat0"], r["lng0"], r["lat1"], r["lng1"]), set()
            ).add((r["tile_x"], r["tile_y"]))
        for la0, ln0, la1, ln1 in segs:
            want = set(supercover_tiles((la0, ln0), (la1, ln1), zoom))
            assert got[(la0, ln0, la1, ln1)] == want, (la0, ln0, zoom)
