"""Geohash index family + HyperLogLog sketch.

Geohash: the Spark flat bit-interleave is proven equal to TWO
independent derivations — the classic Morton-spread Python twin
(geohash_py) and the DuckDB SQL generators — then prefix/roundtrip
properties are asserted on the twin. Composing
encode(decode(encode(...))) as one Column chain is deliberately not
exercised: predicate pushdown re-inlines aliases multiplicatively
through stacked projections (documented in geohash.py); real pipelines
put an aggregate between encode and decode, as _q_geohash_rollup does.

HLL: register/estimator parity with an exact-NDV ground truth, merge
associativity, and the exact-integer Z determinism contract.
"""

from __future__ import annotations

import math
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from geospark import sketch as SK
from geospark.functions import geohash as GH


def _pts(n=3000, seed=7):
    rng = random.Random(seed)
    rows = [(i, rng.uniform(-90, 90), rng.uniform(-180, 180))
            for i in range(n)]
    # boundary cases: closed upper edges, origin, announcement fixture
    rows += [(n, 57.64911, 10.40744), (n + 1, 90.0, 180.0),
             (n + 2, -90.0, -180.0), (n + 3, 0.0, 0.0),
             (n + 4, 89.9999999, 179.9999999)]
    return rows


# ---------------------------------------------------------------- geohash --
def test_geohash_announcement_fixture():
    """The canonical public fixture (Niemeyer's announcement example)
    and its prefix ladder."""
    assert GH.geohash_py(57.64911, 10.40744, 11) == "u4pruydqqvj"
    for k in range(1, 11):
        assert GH.geohash_py(57.64911, 10.40744, k) == "u4pruydqqvj"[:k]


@pytest.mark.parametrize("chars", [1, 2, 5, 6, 11, 12])
def test_geohash_spark_matches_python_twin(spark, chars):
    rows = _pts()
    df = spark.createDataFrame(rows, "id long, lat double, lng double")
    got = (GH.with_geohash(df, "lat", "lng", chars, out="gh")
           .select("id", "lat", "lng", "gh").collect())
    assert len(got) == len(rows)
    for r in got:
        assert r.gh == GH.geohash_py(r.lat, r.lng, chars), (r.id, chars)


def test_geohash_duckdb_twin_parity(spark):
    rows = _pts(800)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pts AS SELECT * FROM (VALUES "
        + ",".join(f"({i},{la!r},{ln!r})" for i, la, ln in rows)
        + ") t(id, lat, lng)"
    )
    for chars in (3, 6):
        ilng, ilat = GH.quantize_axes_sql("lat", "lng", chars)
        code = GH.interleave_sql("ilng", "ilat", chars)
        sql = f"""WITH q AS (SELECT id, {ilng} AS ilng, {ilat} AS ilat
                             FROM pts),
                  c AS (SELECT id, {code} AS code FROM q)
                  SELECT id, {GH.geohash_chars_sql('code', chars)} AS gh,
                         code FROM c"""
        for i, gh, code_v in con.execute(sql).fetchall():
            la, ln = rows[i][1], rows[i][2]
            assert gh == GH.geohash_py(la, ln, chars)
            assert code_v == GH.geohash_int_py(la, ln, chars)


def test_geohash_prefix_property():
    """First k chars of a precision-n geohash == the precision-k
    geohash of the same point (the rollup contract), and in bit form
    parent code == child code >> 5*(n-k)."""
    rng = random.Random(3)
    for _ in range(500):
        la, ln = rng.uniform(-90, 90), rng.uniform(-180, 180)
        g8 = GH.geohash_py(la, ln, 8)
        c8 = GH.geohash_int_py(la, ln, 8)
        for k in (1, 3, 4, 7):
            assert GH.geohash_py(la, ln, k) == g8[:k]
            assert GH.geohash_int_py(la, ln, k) == c8 >> (5 * (8 - k))


def test_geohash_center_roundtrip():
    """Decode center then re-encode returns the same cell, and the
    center sits strictly inside the cell's bisection rectangle."""
    rng = random.Random(5)
    for chars in (2, 5, 6):
        for _ in range(300):
            la, ln = rng.uniform(-90, 90), rng.uniform(-180, 180)
            code = GH.geohash_int_py(la, ln, chars)
            cla, cln = GH.geohash_center_py(code, chars)
            assert GH.geohash_int_py(cla, cln, chars) == code
            # center within half a cell of the source point
            bits, n_lng, n_lat = 5 * chars, -(-5 * chars // 2), 5 * chars // 2
            assert abs(cla - la) <= 180.0 / (1 << n_lat)
            assert abs(cln - ln) <= 360.0 / (1 << n_lng)


def test_geohash_center_spark_matches_python(spark):
    rows = _pts(500)
    df = spark.createDataFrame(rows, "id long, lat double, lng double")
    d = GH.with_geohash_int(df, "lat", "lng", 6, out="code")
    d = GH.with_geohash_center(d, "code", 6)
    for r in d.select("id", "code", "gh_lat", "gh_lng").collect():
        cla, cln = GH.geohash_center_py(r.code, 6)
        assert r.gh_lat == cla and r.gh_lng == cln, r.id


def test_geohash_closed_upper_boundary():
    """lat=90 / lng=180 belong to the last cell, not an overflowed
    one (the clamp in _quantize)."""
    assert GH.geohash_py(90.0, 180.0, 1) == GH.geohash_py(89.99, 179.99, 1)
    assert GH.geohash_py(-90.0, -180.0, 1) == "0"


# -------------------------------------------------------------------- hll --
def _events(n_keys=40, dup=2):
    rows = []
    for t in range(n_keys):
        n = 1 + (t * 37) % 500
        for u in range(n):
            for _ in range(dup):
                rows.append((t, f"user_{t}_{u}"))
    return rows


def test_hll_estimate_accuracy_and_exact_column(spark):
    rows = _events()
    df = spark.createDataFrame(rows, "tile int, user string")
    p = 8
    est = SK.hll_sketch(df, ["tile"], "user", p=p).collect()
    true = {}
    for t, u in rows:
        true.setdefault(t, set()).add(u)
    assert len(est) == len(true)
    errs = []
    for r in est:
        assert r.exact_users == len(true[r.tile])
        errs.append(abs(r.est_users - r.exact_users)
                    / max(r.exact_users, 1))
    # 1.04/sqrt(256) ~ 6.5% std error; mean over 40 keys well within 2x
    assert sum(errs) / len(errs) < 2 * SK.hll_std_error(p)


def test_hll_merge_is_sketch_union(spark):
    """Merging a subset's registers into the full set's changes
    nothing (max-union absorbs), and merging two disjoint halves
    equals the one-shot sketch of the union."""
    rows = _events(n_keys=10)
    df = spark.createDataFrame(rows, "tile int, user string")
    lo = df.filter(F.length("user") % 2 == 0)
    hi = df.filter(F.length("user") % 2 == 1)
    p = 6
    full = SK.hll_registers(df, ["tile"], "user", p)
    halves = SK.hll_merge(
        SK.hll_registers(lo, ["tile"], "user", p)
        .select("tile", "reg", "m_rho")
        .union(SK.hll_registers(hi, ["tile"], "user", p)
               .select("tile", "reg", "m_rho")),
        ["tile"],
    )
    a = {(r.tile, r.reg): r.m_rho for r in full.collect()}
    b = {(r.tile, r.reg): r.m_rho for r in halves.collect()}
    assert a == b


def test_hll_register_python_twin(spark):
    """Registers match a from-scratch Python md5 derivation."""
    import hashlib

    rows = [(0, f"u{i}") for i in range(400)]
    df = spark.createDataFrame(rows, "k int, item string")
    p = 6
    tail = SK.HASH_BITS - p
    regs = {r.reg: (r.m_rho, r.n_items)
            for r in SK.hll_registers(df, ["k"], "item", p).collect()}
    want: dict[int, list[int]] = {}
    for _, it in rows:
        h = int(hashlib.md5(it.encode()).hexdigest()[:15], 16)
        reg, w = h >> tail, h & ((1 << tail) - 1)
        rho = tail + 1 if w == 0 else tail + 1 - w.bit_length()
        want.setdefault(reg, []).append(rho)
    assert set(regs) == set(want)
    for reg, rhos in want.items():
        assert regs[reg] == (max(rhos), len(rhos))


def test_hll_duckdb_estimator_parity(spark):
    """Full estimate parity against the SQL generators on a shared
    relation — including the exact-integer Z (no float-sum order
    dependence between the engines)."""
    rows = _events(n_keys=12, dup=1)
    df = spark.createDataFrame(rows, "tile int, user string")
    p = 7
    got = {r.tile: (r.regs_hit, r.est_users, r.exact_users)
           for r in SK.hll_sketch(df, ["tile"], "user", p=p).collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev AS SELECT * FROM (VALUES "
        + ",".join(f"({t},'{u}')" for t, u in rows) + ") t(tile, usr)"
    )
    reg, rho = SK.hll_register_sql("usr", p)
    zint = SK.hll_zint_sql(p)
    _z, est = SK.hll_estimate_sql(p)
    sql = f"""WITH d AS (SELECT DISTINCT tile, usr FROM ev),
              r AS (SELECT tile, {reg} AS reg, {rho} AS rho FROM d),
              regs AS (SELECT tile, reg, max(rho) AS m_rho,
                              count(*) AS n_items FROM r GROUP BY 1, 2),
              sk AS (SELECT tile, count(*) AS regs_hit, {zint} AS z_int,
                            CAST(sum(n_items) AS BIGINT) AS exact_users
                     FROM regs GROUP BY 1)
              SELECT tile, regs_hit, round({est}, 3) AS est_users,
                     exact_users FROM sk"""
    for t, rh, e, x in con.execute(sql).fetchall():
        assert got[t] == (rh, e, x), t


def test_hll_zint_bound():
    """The exact-integer Z accumulator cannot overflow a BIGINT at any
    valid p: worst case m registers all at rho=1 gives m * 2^(60-p)
    = 2^60."""
    for p in (4, 10, 16):
        s = SK.HASH_BITS - p + 1
        assert (1 << p) * (1 << (s - 1)) == 1 << 60


# -------------------------------------------------------- neighbors/kring --
def test_geohash_neighbor_codes(spark):
    """neighbor_code == encode of a point displaced by one cell pitch:
    interior cells, antimeridian wrap, and pole NULL."""
    chars = 4
    n_lng, n_lat = 10, 10
    rows = [
        (0, 40.0, -100.0),       # interior
        (1, 12.3, 179.95),       # east neighbor wraps to lng ~ -180
        (2, 89.95, 10.0),        # top row: north neighbor is NULL
        (3, -89.95, -10.0),      # bottom row: south neighbor is NULL
    ]
    df = spark.createDataFrame(rows, "id long, lat double, lng double")
    d = GH.with_geohash_axes(df, "lat", "lng", chars, "ilng", "ilat")
    d = d.select(
        "id", "lat", "lng", "ilng", "ilat",
        GH.neighbor_code(F.col("ilng"), F.col("ilat"), chars, 1, 0)
        .alias("e"),
        GH.neighbor_code(F.col("ilng"), F.col("ilat"), chars, 0, 1)
        .alias("n"),
        GH.neighbor_code(F.col("ilng"), F.col("ilat"), chars, 0, -1)
        .alias("s"),
    )
    pitch_lng, pitch_lat = 360.0 / (1 << n_lng), 180.0 / (1 << n_lat)
    got = {r.id: r for r in d.collect()}
    # interior + wrap: east neighbor == encode(point shifted one pitch,
    # wrapped into [-180, 180))
    for i in (0, 1):
        r = got[i]
        ln2 = r.lng + pitch_lng
        if ln2 >= 180.0:
            ln2 -= 360.0
        assert r.e == GH.geohash_int_py(r.lat, ln2, chars), i
    r = got[0]
    assert r.n == GH.geohash_int_py(r.lat + pitch_lat, r.lng, chars)
    assert r.s == GH.geohash_int_py(r.lat - pitch_lat, r.lng, chars)
    assert got[2].n is None and got[2].s is not None
    assert got[3].s is None and got[3].n is not None


def test_geohash_kring_block_is_exhaustive():
    assert len(GH.kring_offsets(1)) == 9
    assert len(GH.kring_offsets(2)) == 25
    assert (0, 0) in GH.kring_offsets(1)


def test_hll_child_merge_equals_direct_parent(spark):
    """merge(child sketches) == sketch(parent directly) — the
    associativity the rollup query's oracle certifies, asserted here
    at the register level."""
    rows = [(t, f"user_{(t * 31 + u) % 97}") for t in range(20)
            for u in range(1 + (t * 13) % 60)]
    df = spark.createDataFrame(rows, "child int, user string")
    p = 6
    child = SK.hll_registers(df, ["child"], "user", p)
    merged = SK.hll_merge(
        child.withColumn("parent", (F.col("child") / 4).cast("int")),
        ["parent"],
    )
    direct = SK.hll_registers(
        df.withColumn("parent", (F.col("child") / 4).cast("int"))
        .select("parent", "user"),
        ["parent"], "user", p,
    ).select("parent", "reg", "m_rho")
    a = {(r.parent, r.reg): r.m_rho for r in merged.collect()}
    b = {(r.parent, r.reg): r.m_rho for r in direct.collect()}
    assert a == b
