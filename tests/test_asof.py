"""As-of join: brute-force parity over random event streams, all four
(direction, strict) corners, equal-timestamp ties, tolerance, and the
one-shuffle plan shape."""

import datetime as dt

import numpy as np
import pytest

from pyspark.sql import functions as F

from geospark.asof import asof_join


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _brute(left, right, direction, strict, tolerance_s=None):
    """left/right: list of (key, ts, id). Returns {left_id: right_id|None}.
    Ties among right rows at one (key, ts) resolve to max id (the
    operator's max-struct rule with id as the only value column)."""
    best = {}
    for lk, lts, lid in left:
        cands = []
        for rk, rts, rid in right:
            if rk != lk:
                continue
            if direction == "backward":
                ok = rts < lts if strict else rts <= lts
            else:
                ok = rts > lts if strict else rts >= lts
            if ok and (tolerance_s is None or abs(lts - rts) <= tolerance_s):
                cands.append((rts, rid))
        if not cands:
            best[lid] = None
        elif direction == "backward":
            mts = max(c[0] for c in cands)
            best[lid] = max(r for t, r in cands if t == mts)
        else:
            mts = min(c[0] for c in cands)
            best[lid] = max(r for t, r in cands if t == mts)
    return best


EPOCH = dt.datetime(2024, 1, 1)


def _ts(s):
    return EPOCH + dt.timedelta(seconds=int(s))


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("strict", [False, True])
def test_asof_random_parity(spark, direction, strict):
    rng = np.random.RandomState(11 + (direction == "forward") + 2 * strict)
    nkeys = 6
    left, right = [], []
    lid = rid = 0
    for _ in range(120):
        k = int(rng.randint(0, nkeys))
        t = int(rng.randint(0, 40))  # dense -> many exact ties
        if rng.rand() < 0.5:
            left.append((k, t, lid := lid + 1))
        else:
            right.append((k, t, rid := rid + 1))
    ldf = _mk(spark, [(k, _ts(t), i) for k, t, i in left],
              "user_id int, ts timestamp, lid long")
    rdf = _mk(spark, [(k, _ts(t), i) for k, t, i in right],
              "user_id int, ts timestamp, rid long")
    out = asof_join(ldf, rdf, by="user_id", direction=direction,
                    strict=strict)
    got = {r["lid"]: r["rid_r"] for r in out.collect()}
    want = _brute(left, right, direction, strict)
    assert got == want


def test_asof_tolerance_and_no_match(spark):
    left = [(1, 100, 1), (1, 200, 2), (2, 50, 3)]
    right = [(1, 90, 10), (1, 110, 11), (3, 1, 12)]
    ldf = _mk(spark, [(k, _ts(t), i) for k, t, i in left],
              "user_id int, ts timestamp, lid long")
    rdf = _mk(spark, [(k, _ts(t), i) for k, t, i in right],
              "user_id int, ts timestamp, rid long")
    out = asof_join(ldf, rdf, by="user_id", tolerance_s=30)
    got = {r["lid"]: r["rid_r"] for r in out.collect()}
    assert got == _brute(left, right, "backward", False, tolerance_s=30)
    assert got[2] is None   # nearest prior is 90s away > 30s
    assert got[3] is None   # no right rows for key 2 at all


def test_asof_carries_multiple_value_cols(spark):
    ldf = _mk(spark, [(1, _ts(10), 1)], "user_id int, ts timestamp, lid long")
    rdf = _mk(spark, [(1, _ts(5), 7, "a"), (1, _ts(5), 9, "b")],
              "user_id int, ts timestamp, rid long, tag string")
    row = asof_join(ldf, rdf, by="user_id").collect()[0]
    # max-struct tie rule: (9, 'b') beats (7, 'a') lexicographically
    assert (row["rid_r"], row["tag_r"], row["ts_r"]) == (9, "b", _ts(5))


def test_asof_single_shuffle_plan(spark):
    ldf = _mk(spark, [(1, _ts(10), 1)], "user_id int, ts timestamp, lid long")
    rdf = _mk(spark, [(1, _ts(5), 7)], "user_id int, ts timestamp, rid long")
    plan = asof_join(ldf, rdf, by="user_id")._jdf.queryExecution() \
        .optimizedPlan().toString()
    # one window over the union; no join operator at all
    assert "Join" not in plan
    assert plan.count("Window") == 1


def test_asof_user_columns_named_like_internals(spark):
    """Working columns must not shadow user columns: a left column
    literally named ``_ts`` (or ``_v``/``_k``) has to survive the join
    unchanged — regression for the silent-overwrite bug."""
    ldf = _mk(spark, [(1, _ts(10), 1, "keepme", 42)],
              "user_id int, ts timestamp, lid long, _ts string, _v long")
    rdf = _mk(spark, [(1, _ts(5), 7)], "user_id int, ts timestamp, rid long")
    row = asof_join(ldf, rdf, by="user_id").collect()[0]
    assert row["_ts"] == "keepme"
    assert row["_v"] == 42
    assert row["rid_r"] == 7 and row["ts_r"] == _ts(5)


def test_interval_join_vs_brute_force(spark):
    """Chunked interval_join == brute-force closed-overlap on mixed
    intervals: ones inside a bucket, spanning buckets, touching at a
    single instant (closed semantics), zero-length, and disjoint —
    each qualifying pair exactly once (the max(starts)-bucket rule),
    overlap_us exact."""
    from itertools import product

    from geospark.asof import interval_join

    W = 100
    left = [(1, 0, 50), (2, 90, 210), (3, 300, 300), (4, 500, 650)]
    right = [(10, 40, 95), (11, 205, 300), (12, 660, 700), (13, 130, 140)]
    ldf = spark.createDataFrame(
        left, "lid long, start_us long, end_us long")
    rdf = spark.createDataFrame(
        right, "rid long, start_us long, end_us long")
    got = sorted(
        (r["l_lid"], r["r_rid"], r["overlap_us"])
        for r in interval_join(ldf, rdf, W).collect()
    )
    want = sorted(
        (li, ri, min(le, re) - max(ls, rs))
        for (li, ls, le), (ri, rs, re) in product(left, right)
        if max(ls, rs) <= min(le, re)
    )
    assert got == want
    # the single-instant touch (11 end=300, 3 start=300) is IN (closed)
    assert (3, 11, 0) in got
    # cross-bucket pair [90,210]x[205,300] found despite bucket gap
    assert (2, 11, 5) in got
    # disjoint pairs absent
    assert all(o >= 0 for _, _, o in got)
