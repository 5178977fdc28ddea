"""Stay-point detection (lines.staypoints) semantics + plan shape."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from geospark import lines as L

H = 3_600_000_000  # 1 h in us


def _ts(h):
    return datetime(2024, 1, 1, h, 0, 0)


def _pts(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, "
              "lat double, lng double")


def test_staypoint_semantics_hand_built(spark):
    # user 1: 3 pings within ~100 m over 2 h (a stay), then a 1000 km
    # jump, then 2 pings 30 min apart (dwell below threshold -> drop)
    rows = [
        (1, 1, _ts(0), 50.0, 8.0),
        (1, 2, _ts(1), 50.0005, 8.0),
        (1, 3, _ts(2), 50.001, 8.0),
        (1, 4, _ts(3), 58.0, 20.0),
        (1, 5, _ts(3).replace(minute=30), 58.0001, 20.0),
        # user 2: single ping -> zero dwell, never a stay
        (2, 6, _ts(5), 10.0, 10.0),
    ]
    out = L.staypoints(_pts(spark, rows), d_max_m=500,
                       min_dwell_us=2 * H).collect()
    assert len(out) == 1
    sp = out[0]
    assert sp["user_id"] == 1 and sp["sp_idx"] == 0
    assert sp["n_pts"] == 3
    assert sp["dwell_us"] == 2 * H
    # centroid: integer mean of x1e7 fixed coords
    assert sp["c_lat7"] == (500000000 + 500005000 + 500010000) // 3
    assert sp["c_lng7"] == 80000000


def test_staypoint_boundary_step_is_inclusive(spark):
    # floor(step)=499 <= 500 keeps the run; a ~501 m step breaks it
    rows = [
        (1, 1, _ts(0), 0.0, 0.0),
        (1, 2, _ts(2), 0.00449, 0.0),   # ~499 m
        (2, 3, _ts(0), 0.0, 0.0),
        (2, 4, _ts(2), 0.00452, 0.0),   # ~502 m -> two 1-pt segments
    ]
    out = L.staypoints(_pts(spark, rows), d_max_m=500,
                       min_dwell_us=H)
    got = {r["user_id"]: r["n_pts"] for r in out.collect()}
    assert got == {1: 2}  # user 2's segments have zero dwell


def test_staypoints_single_exchange(spark):
    """The whole operator clusters on user_id: exactly one Exchange
    (sessionize's contract)."""
    rows = [(u, i, _ts(i % 20), float(u), float(i % 5)) for u in (1, 2, 3)
            for i in range(1, 8)]
    df = L.staypoints(_pts(spark, rows), d_max_m=1_000_000,
                      min_dwell_us=0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "BatchEvalPython" not in plan
