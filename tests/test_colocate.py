"""Co-location join (geospark/colocate.py): recall vs an in-engine
brute force (independent PLAN, same distance kernel) at awkward
latitudes/longitudes, plus the exact time-window boundary."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from geospark.colocate import colocate_pairs
from geospark.functions import kernels as K

T_US = 3_600_000_000  # 1 h


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, "
              "lat double, lng double")


def _brute(pts, d_m, t_us):
    l = pts.select(F.col("user_id").alias("u_l"),
                   F.col("event_id").alias("eid_l"),
                   F.unix_micros(F.col("ts").cast("timestamp"))
                   .alias("us_l"),
                   F.col("lat").alias("la_l"), F.col("lng").alias("ln_l"))
    r = pts.select(F.col("user_id").alias("u_r"),
                   F.col("event_id").alias("eid_r"),
                   F.unix_micros(F.col("ts").cast("timestamp"))
                   .alias("us_r"),
                   F.col("lat").alias("la_r"), F.col("lng").alias("ln_r"))
    step = F.floor(K.distance(F.col("la_l"), F.col("ln_l"),
                              F.col("la_r"), F.col("ln_r")))
    p = (l.crossJoin(r)
         .filter((F.col("u_l") != F.col("u_r"))
                 & ((F.col("us_l") < F.col("us_r"))
                    | ((F.col("us_l") == F.col("us_r"))
                       & (F.col("eid_l") < F.col("eid_r"))))
                 & (F.col("us_r") - F.col("us_l") <= t_us))
         .withColumn("step_m", step)
         .filter(F.col("step_m") <= float(d_m)))
    return (p.groupBy(F.least("u_l", "u_r").alias("user_lo"),
                      F.greatest("u_l", "u_r").alias("user_hi"))
            .agg(F.count("*").alias("n_encounters"),
                 F.sum(F.col("step_m").cast("long"))
                 .alias("sum_step_m")))


def _synthetic(n=400):
    """Deterministic points biased to the hard spots: high latitude
    (mercator cells shrink) and the antimeridian (x wrap)."""
    rows = []
    for i in range(n):
        band = i % 3
        jla = (i * 7 % 40) / 100.0    # ~0-44 km jitter
        jln = (i * 13 % 60) / 100.0
        if band == 0:      # polar-ish (cells shrink sharply)
            lat, lng = 82.0 + jla, -10.0 + jln * 8.0
        elif band == 1:    # antimeridian straddle
            lat = -40.0 + jla
            lng = 179.8 + jln
            if lng > 180.0:
                lng -= 360.0
        else:              # mid-latitude field
            lat, lng = 45.0 + jla, 5.0 + jln
        ts = datetime(2024, 1, 1, (i // 60) % 24, i % 60, (i * 3) % 60)
        rows.append((i % 40, i, ts, lat, lng))
    return rows


@pytest.mark.parametrize("d_m", [50_000, 500_000])
def test_colocate_matches_brute_force(spark, d_m):
    pts = _df(spark, _synthetic())
    got = {tuple(r) for r in
           colocate_pairs(pts, d_m, T_US).collect()}
    want = {tuple(r) for r in _brute(pts, d_m, T_US).collect()}
    assert got == want
    assert len(want) > 0  # the fixture must actually exercise pairs


def test_colocate_time_boundary_inclusive(spark):
    base = datetime(2024, 6, 1, 12, 0, 0)
    rows = [
        (1, 1, base, 10.0, 10.0),
        # exactly t later -> included
        (2, 2, datetime(2024, 6, 1, 13, 0, 0), 10.0, 10.001),
        # t + 1 s later -> excluded
        (3, 3, datetime(2024, 6, 1, 13, 0, 1), 10.0, 10.001),
        # same user, same place, in-window -> excluded
        (1, 4, datetime(2024, 6, 1, 12, 30, 0), 10.0, 10.0005),
    ]
    out = colocate_pairs(_df(spark, rows), 5_000, T_US).collect()
    got = {(r["user_lo"], r["user_hi"]): r["n_encounters"] for r in out}
    # (1,2) twice: event 1 at 12:00 (exactly t before) AND the same
    # user's event 4 at 12:30 both meet event 2; event 3 at t+1s after
    # event 1 is excluded but still meets events 2 and 4
    assert got == {(1, 2): 2, (2, 3): 1, (1, 3): 1}


def test_colocate_counts_multiple_encounters(spark):
    base = datetime(2024, 6, 1, 0, 0, 0)
    rows = [
        (1, 1, base, 0.0, 0.0),
        (2, 2, datetime(2024, 6, 1, 0, 10, 0), 0.0, 0.01),
        (1, 3, datetime(2024, 6, 1, 5, 0, 0), 0.0, 0.0),
        (2, 4, datetime(2024, 6, 1, 5, 20, 0), 0.0, 0.01),
    ]
    out = colocate_pairs(_df(spark, rows), 5_000, T_US).collect()
    assert len(out) == 1
    assert out[0]["n_encounters"] == 2
