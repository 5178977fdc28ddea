"""S2 cell index: numpy kernel vs independent scalar twin, hierarchy
properties, and the two driver queries end-to-end on sf0.001."""
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from geospark import goldens as GO
from geospark.functions import s2cell as S2

SF = "/root/testdata/sf0.001"


def _rand_points(n=4000, seed=11):
    rng = np.random.default_rng(seed)
    lat = rng.uniform(-89.999, 89.999, n)
    lng = rng.uniform(-180.0, 180.0, n)
    lat = np.concatenate([lat, [90.0, -90.0, 0.0, 0.0, 45.0, -45.0, 85.05]])
    lng = np.concatenate([lng, [0.0, 17.0, 180.0, -180.0, 135.0, -91.0, 9.0]])
    return lat, lng


def test_leaf_matches_scalar_twin():
    lat, lng = _rand_points()
    vec = S2.s2_leaf_np(lat, lng)
    sca = np.array([GO.s2_cell_id_scalar(a, b, 30) for a, b in zip(lat, lng)],
                   dtype=np.uint64)
    assert np.array_equal(vec, sca)


@pytest.mark.parametrize("level", [0, 1, 7, 16, 29])
def test_parent_matches_scalar_twin(level):
    lat, lng = _rand_points(500, seed=level + 1)
    vec = S2.s2_cell_np(lat, lng, level)
    sca = np.array(
        [GO.s2_cell_id_scalar(a, b, level) for a, b in zip(lat, lng)],
        dtype=np.uint64,
    )
    assert np.array_equal(vec, sca)


def test_all_faces_reachable():
    lat, lng = _rand_points()
    faces = set((S2.s2_leaf_np(lat, lng) >> np.uint64(61)).tolist())
    assert faces == {0, 1, 2, 3, 4, 5}


def test_level0_structure():
    # spec bit layout: the level-0 cell of face f is f<<61 | 1<<60
    lat, lng = _rand_points(200)
    leaf = S2.s2_leaf_np(lat, lng)
    face = leaf >> np.uint64(61)
    assert np.array_equal(
        S2.s2_parent_np(leaf, 0), (face << np.uint64(61)) | np.uint64(1 << 60)
    )


def test_levels():
    lat, lng = _rand_points(200)
    leaf = S2.s2_leaf_np(lat, lng)
    assert set(S2.s2_level_np(leaf).tolist()) == {30}
    for lvl in (0, 4, 12, 30):
        assert set(S2.s2_level_np(S2.s2_parent_np(leaf, lvl)).tolist()) == {lvl}


@settings(max_examples=200, deadline=None)
@given(
    lat=st.floats(-90.0, 90.0, allow_nan=False),
    lng=st.floats(-180.0, 180.0, allow_nan=False),
    level=st.integers(0, 29),
)
def test_containment_property(lat, lng, level):
    """Every leaf lies inside [range_min, range_max] of each ancestor,
    and ancestor ranges nest monotonically."""
    leaf = int(GO.s2_cell_id_scalar(lat, lng, 30))
    cell = int(GO.s2_cell_id_scalar(lat, lng, level))
    lo, hi = GO.s2_range_scalar(cell)
    assert lo <= leaf <= hi
    child = int(GO.s2_cell_id_scalar(lat, lng, level + 1))
    clo, chi = GO.s2_range_scalar(child)
    assert lo <= clo and chi <= hi


def test_range_sign_consistency():
    """Containment intervals never straddle the int64 sign boundary
    (the invariant that makes signed BETWEEN joins exact)."""
    lat, lng = _rand_points()
    for level in (2, 9, 20):
        cells = S2.s2_cell_np(lat, lng, level)
        lo, hi = S2.s2_range_np(cells)
        lo64, hi64 = S2.as_int64(lo), S2.as_int64(hi)
        assert bool(np.all((lo64 < 0) == (hi64 < 0)))


def test_token():
    assert S2.s2_token(0x1000000000000001) == "1000000000000001"
    assert S2.s2_token(0x3000000000000000) == "3"


def test_s2_queries_match_twin(spark):
    import duckdb

    import __spark_entry__ as E
    from geospark import geodata as G

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF}/events.parquet')")
    pdf = con.sql(f"WITH pts AS ({G.EVENTS_POINTS_SQL}) "
                  f"SELECT event_id, lat, lng FROM pts ORDER BY event_id").df()
    con.close()
    ids, lats, lngs = (pdf["event_id"].tolist(), pdf["lat"].tolist(),
                       pdf["lng"].tolist())

    agg = {
        tuple(r[:2]): tuple(r[2:])
        for r in E._q_s2_cell_agg(spark, SF).collect()
    }
    want = {
        (c, p): (n, lo, hi, chk)
        for c, p, n, lo, hi, chk in GO.s2_cell_agg(
            lats, lngs, ids, E.S2_AGG_LEVEL, E.S2_AGG_PARENT, E.S2_CHECK_MOD)
    }
    assert agg == want

    rj = {r["center_id"]: (r["n_events"], r["min_event_id"],
                           r["leaf_xor_low32"])
          for r in E._q_s2_range_join(spark, SF).collect()}
    want_rj = {cid: (n, mn, xr) for cid, n, mn, xr in GO.s2_range_join(
        lats, lngs, ids, G.DEMO_CENTERS, E.S2_JOIN_LEVEL)}
    assert rj == want_rj


def test_range_join_is_broadcast_no_explosion(spark):
    """The S2 containment join must be a broadcast join with NO
    exploded cover column in the plan."""
    import __spark_entry__ as E

    plan = E._q_s2_range_join(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "Generate" not in plan  # no explode


def test_cover_cap_completeness():
    """Conservative cover: no point within the cap may fall outside
    every covered interval (random caps incl. polar/antimeridian)."""
    import math

    rng = np.random.default_rng(5)
    R = 6371000.0

    def hav(a1, b1, a2, b2):
        p1, p2 = math.radians(a1), math.radians(a2)
        dl, dp = math.radians(b2 - b1), math.radians(a2 - a1)
        a = (math.sin(dp / 2) ** 2
             + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2)
        return 2 * R * math.asin(min(1.0, math.sqrt(a)))

    caps = [(float(rng.uniform(-85, 85)), float(rng.uniform(-180, 180)),
             float(rng.uniform(500, 2e6))) for _ in range(8)]
    caps += [(89.5, 0.0, 100_000.0), (0.0, 179.9, 200_000.0)]
    for cla, cln, r in caps:
        ivs = S2.merge_ranges(S2.cover_cap(cla, cln, r))
        assert 1 <= len(ivs) <= 48
        lat = rng.uniform(max(-90, cla - 30), min(90, cla + 30), 800)
        lng = ((rng.uniform(cln - 45, cln + 45, 800) + 180) % 360) - 180
        leafs = S2.s2_leaf_np(lat, lng).tolist()
        for la, ln, lf in zip(lat, lng, leafs):
            if hav(cla, cln, la, ln) < r:
                assert any(lo <= lf <= hi for lo, hi in ivs), (cla, cln, r,
                                                               la, ln)


def test_s2_radius_join_matches_brute_force(spark):
    from geospark import geodata as G
    from geospark.functions import kernels as K
    from pyspark.sql import functions as F

    pts = G.events_points(spark, SF).select("event_id", "lat", "lng")
    enc = pts.withColumn("leaf", S2.s2_cell_udf(30)("lat", "lng"))
    got = {
        (r["query_id"], r["event_id"])
        for r in S2.s2_radius_join(enc, G.DEMO_CENTERS, 750_000.0).collect()
    }
    want = set()
    for cid, cla, cln in G.DEMO_CENTERS:
        d = K.distance(F.lit(cla), F.lit(cln), F.col("lat"), F.col("lng"))
        want |= {(cid, r["event_id"])
                 for r in pts.filter(d < 750_000.0).collect()}
    assert got == want
