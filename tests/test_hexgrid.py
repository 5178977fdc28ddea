"""H3-style mercator hex index: Spark<->DuckDB<->numpy twin parity,
aperture-7 hierarchy properties, k-ring arithmetic.

Geometry properties (roundtrip, Voronoi nearest-center, ring pitch)
are asserted on the numpy twin — the Spark Column path is proven
equal to the twin bit-for-bit first, so the properties transfer.
Composing encode(center(cell)) as ONE Column expression is
deliberately not exercised: the cube-round conditionals duplicate
sub-expressions combinatorially (documented in hexgrid.py; the
algebraic hex_parent exists precisely so no query needs to)."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from geospark.functions import hexgrid as H


def _pts(n=4000, seed=11):
    rng = np.random.RandomState(seed)
    return rng.uniform(-80, 80, n), rng.uniform(-180, 180, n)


def test_spark_duckdb_numpy_twin_parity(spark):
    """The closed-form encode agrees bit-for-bit across all three
    implementations at several resolutions (incl. the finest), and
    the algebraic parent agrees between Spark, DuckDB and numpy."""
    lat, lng = _pts()
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lat, lng)],
        "lat double, lng double",
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE p AS SELECT * FROM (VALUES "
                + ",".join(f"({a!r}, {b!r})" for a, b in zip(lat, lng))
                + ") t(lat, lng)")
    for res in (0, 3, 7, 12, 15):
        got = [
            r["c"] for r in df.select(
                H.hex_cell("lat", "lng", res).alias("c")
            ).collect()
        ]
        want = [
            r[0] for r in con.execute(
                f"SELECT {H.hex_cell_sql('lat', 'lng', res)} FROM p"
            ).fetchall()
        ]
        twin = H.hex_cell_np(lat, lng, res)
        assert got == want, f"res {res} spark!=duckdb"
        assert got == list(twin), f"res {res} spark!=numpy"
    # parent parity at res 9
    cells = H.hex_cell_np(lat, lng, 9)
    sp = [
        r["p"] for r in df.select(
            H.hex_parent(H.hex_cell("lat", "lng", 9)).alias("p")
        ).collect()
    ]
    dk = [
        r[0] for r in con.execute(
            "SELECT " + H.hex_parent_sql(H.hex_cell_sql("lat", "lng", 9))
            + " FROM p"
        ).fetchall()
    ]
    assert sp == dk
    assert sp == list(H.hex_parent_np(cells))


def test_center_roundtrip_np():
    """A cell's center re-encodes to the same cell at the same res
    (centers are interior, never on a boundary) — via the twin, which
    the parity test pins to the Spark/DuckDB expressions."""
    rng = np.random.RandomState(5)
    x = rng.uniform(-2.0e7, 2.0e7, 50_000)
    y = rng.uniform(-1.9e7, 1.9e7, 50_000)
    for res in (2, 9, 15):
        c, s, size = H._COS[res], H._SIN[res], H._SIZE[res]
        xr = x * c + y * s
        yr = y * c - x * s
        q, r = H._cube_round_np((H.SQRT3 / 3.0 * xr - yr / 3.0) / size,
                                (2.0 / 3.0) * yr / size)
        cell = (res << 58) + (q + H.OFF) * (1 << 29) + (r + H.OFF)
        cx, cy = H.hex_center_xy_np(cell, res)
        xr2 = cx * c + cy * s
        yr2 = cy * c - cx * s
        q2, r2 = H._cube_round_np((H.SQRT3 / 3.0 * xr2 - yr2 / 3.0) / size,
                                  (2.0 / 3.0) * yr2 / size)
        assert np.array_equal(q, q2) and np.array_equal(r, r2)


def test_parent_is_geometric_parent_np():
    """The algebraic parent (inverse sublattice basis, trig-free)
    equals the geometric definition — encode the child's center at
    res-1 — everywhere."""
    rng = np.random.RandomState(1)
    x = rng.uniform(-2.0e7, 2.0e7, 100_000)
    y = rng.uniform(-1.9e7, 1.9e7, 100_000)
    for res in (1, 6, 12, 15):
        c, s, size = H._COS[res], H._SIN[res], H._SIZE[res]
        xr, yr = x * c + y * s, y * c - x * s
        q, r = H._cube_round_np((H.SQRT3 / 3.0 * xr - yr / 3.0) / size,
                                (2.0 / 3.0) * yr / size)
        cell = (res << 58) + (q + H.OFF) * (1 << 29) + (r + H.OFF)
        cx, cy = H.hex_center_xy_np(cell, res)
        cp, sp, sz = H._COS[res - 1], H._SIN[res - 1], H._SIZE[res - 1]
        xr2, yr2 = cx * cp + cy * sp, cy * cp - cx * sp
        gq, gr = H._cube_round_np((H.SQRT3 / 3.0 * xr2 - yr2 / 3.0) / sz,
                                  (2.0 / 3.0) * yr2 / sz)
        geo = ((res - 1) << 58) + (gq + H.OFF) * (1 << 29) + (gr + H.OFF)
        assert np.array_equal(H.hex_parent_np(cell), geo)


def test_parent_straddle_bounded(spark):
    """parent(encode(p, res)) equals encode(p, res-1) for the vast
    majority of points; the disagreeing fraction (area straddle, the
    documented H3-style approximation) stays bounded."""
    lat, lng = _pts(6000, seed=7)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lat, lng)],
        "lat double, lng double",
    )
    res = 8
    both = df.select(
        H.hex_parent(H.hex_cell("lat", "lng", res)).alias("via_child"),
        H.hex_cell("lat", "lng", res - 1).alias("direct"),
    )
    assert both.filter(H.hex_res("via_child") != res - 1).count() == 0
    frac = both.filter("via_child != direct").count() / 6000
    assert frac < 0.35, frac


def test_aperture_seven_np():
    """Exhaustively: every res-9 cell in a dense patch has exactly 7
    children mapping to it on average, and each child's parent is one
    of its 1-ring parents (compactness of the sublattice)."""
    rng = np.random.RandomState(3)
    # dense grid so every child cell in the patch is hit
    x = rng.uniform(0, 3.0e5, 400_000)
    y = rng.uniform(0, 3.0e5, 400_000)
    res = 9
    c, s, size = H._COS[res], H._SIN[res], H._SIZE[res]
    xr, yr = x * c + y * s, y * c - x * s
    q, r = H._cube_round_np((H.SQRT3 / 3.0 * xr - yr / 3.0) / size,
                            (2.0 / 3.0) * yr / size)
    cell = (res << 58) + (q + H.OFF) * (1 << 29) + (r + H.OFF)
    kids = np.unique(cell)
    pars = np.unique(H.hex_parent_np(kids))
    ratio = len(kids) / len(pars)
    assert 6.0 < ratio < 8.0, ratio  # aperture 7 (patch-edge noise)


def test_kring_offsets_count_and_distance():
    for k in (0, 1, 2, 5):
        offs = H.kring_offsets(k)
        assert len(offs) == 3 * k * k + 3 * k + 1
        assert len(set(offs)) == len(offs)
        for dq, dr in offs:
            assert max(abs(dq), abs(dr), abs(dq + dr)) <= k


def test_kring_shift_geometry_np():
    """1-ring neighbors' centers are exactly one hex pitch
    (sqrt(3)*size) away — the packed-id arithmetic lands on true
    lattice neighbors."""
    res = 6
    size = H._SIZE[res]
    cell = H.hex_cell_np([37.7], [-122.4], res)
    cx, cy = H.hex_center_xy_np(cell, res)
    for dq, dr in H.kring_offsets(1):
        if (dq, dr) == (0, 0):
            continue
        nb = cell + dq * (1 << 29) + dr
        nx, ny = H.hex_center_xy_np(nb, res)
        d = math.hypot(float(nx[0] - cx[0]), float(ny[0] - cy[0]))
        assert d == pytest.approx(math.sqrt(3.0) * size, rel=1e-9)


def test_assignment_is_nearest_center_np():
    """Every point is closer to its own cell's center than to any
    1-ring neighbor's center (Voronoi property of cube rounding)."""
    rng = np.random.RandomState(3)
    x = rng.uniform(-2.0e7, 2.0e7, 20_000)
    y = rng.uniform(-1.9e7, 1.9e7, 20_000)
    res = 5
    c, s, size = H._COS[res], H._SIN[res], H._SIZE[res]
    xr, yr = x * c + y * s, y * c - x * s
    q, r = H._cube_round_np((H.SQRT3 / 3.0 * xr - yr / 3.0) / size,
                            (2.0 / 3.0) * yr / size)
    cell = (res << 58) + (q + H.OFF) * (1 << 29) + (r + H.OFF)
    cx, cy = H.hex_center_xy_np(cell, res)
    own = np.hypot(cx - x, cy - y)
    for dq, dr in H.kring_offsets(1):
        if (dq, dr) == (0, 0):
            continue
        nx, ny = H.hex_center_xy_np(cell + dq * (1 << 29) + dr, res)
        assert (np.hypot(nx - x, ny - y) + 1e-9 >= own).all()


def test_hex_shift_matches_sql_join_shape(spark):
    """hex_shift is plain integer math on the packed id — a k-ring
    join stays an equi-join. Smoke the Spark side: shifting by every
    1-ring offset then shifting back is the identity."""
    lat, lng = _pts(500, seed=13)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lat, lng)],
        "lat double, lng double",
    ).select(H.hex_cell("lat", "lng", 7).alias("c"))
    for dq, dr in H.kring_offsets(1):
        n_bad = df.filter(
            H.hex_shift(H.hex_shift("c", dq, dr), -dq, -dr) != F.col("c")
        ).count()
        assert n_bad == 0


def test_with_hex_cell_matches_and_stays_compact(spark):
    """with_hex_cell produces bit-identical cells to the one-Column
    hex_cell AND keeps the physical plan linear-size — including
    under an equi-join, where an inferred IsNotNull(hex) used to be
    pushed below the staged projections, re-inlining the whole encode
    (~30 KB plan -> 4-8 s of codegen compile per query)."""
    lat, lng = _pts(2000, seed=29)
    df = spark.createDataFrame(
        [(i, float(a), float(b)) for i, (a, b) in enumerate(zip(lat, lng))],
        "id long, lat double, lng double",
    )
    staged = H.with_hex_cell(df, "lat", "lng", 9, "hex")
    naive = df.select("id", H.hex_cell("lat", "lng", 9).alias("hex2"))
    assert staged.join(naive, "id").filter("hex <> hex2").count() == 0

    # join on the staged cell: the non-nullable output must keep the
    # inferred join-key IsNotNull from re-inlining the encode
    other = staged.groupBy("hex").count()
    joined = staged.join(other, "hex")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert len(plan) < 20_000, f"hex join plan blew up to {len(plan)} chars"
    # the encode appears a bounded number of times (once per scan),
    # not once per downstream reference
    assert plan.count("85.0511287798") <= 8, plan.count("85.0511287798")
