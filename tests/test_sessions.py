"""Gap-based sessionization: brute-force parity + the one-shuffle
plan claim (HashPartitioning(user_id) satisfies the session rollup's
ClusteredDistribution, so no second Exchange appears)."""

from __future__ import annotations

import datetime

import pytest

from geospark.sessions import DEFAULT_GAP_US, sessionize


@pytest.fixture(scope="module")
def spark():
    from geospark.session import get_spark

    s = get_spark("test-sessions", master="local[4]", shuffle_partitions=4,
                  extra_conf={"spark.ui.enabled": "false"})
    yield s


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s),
          u, float(v)) for i, (u, s, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, value double",
    )


def _brute_sessions(rows, gap_s):
    """Scalar twin: per-user sort, split on gap, aggregate."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for i, (u, s, v) in enumerate(rows):
        by_user[u].append((s, i, v))
    out = {}
    for u, evs in by_user.items():
        evs.sort()
        idx = 0
        cur = []
        prev = None
        for s, i, v in evs:
            if prev is None or s - prev > gap_s:
                if cur:
                    out[(u, idx)] = cur
                    cur = []
                idx += 1
            cur.append((s, v))
            prev = s
        out[(u, idx)] = cur
    base_us = int(datetime.datetime(
        2024, 1, 1, tzinfo=datetime.timezone.utc
    ).timestamp()) * 1_000_000
    return {
        k: (len(v), base_us + min(s for s, _ in v) * 1_000_000,
            base_us + max(s for s, _ in v) * 1_000_000,
            (max(s for s, _ in v) - min(s for s, _ in v)) * 1_000_000,
            sum(round(x * 100) for _, x in v))
        for k, v in out.items()
    }


def test_sessionize_matches_brute_force(spark):
    import random

    rng = random.Random(17)
    rows = [(rng.randrange(5), rng.randrange(0, 200_000), rng.randrange(1000) / 7)
            for _ in range(400)]
    gap_s = 1800
    got = {
        (r["user_id"], r["session_idx"]):
        (r["n_events"], r["start_us"], r["end_us"], r["dwell_us"],
         r["value_cents"])
        for r in sessionize(_events(spark, rows),
                            gap_us=gap_s * 1_000_000).collect()
    }
    assert got == _brute_sessions(rows, gap_s)


def test_sessionize_gap_boundary(spark):
    """An event EXACTLY gap_us after the previous one stays in the
    same session (strict > starts a new one) — both engines implement
    the same strict inequality."""
    rows = [(1, 0, 1.0), (1, 1800, 1.0), (1, 3601, 1.0)]
    out = sessionize(_events(spark, rows), gap_us=1800 * 1_000_000).collect()
    by_idx = {r["session_idx"]: r["n_events"] for r in out}
    assert by_idx == {1: 2, 2: 1}


def test_sessionize_single_exchange(spark):
    """The windows and the session rollup all cluster on user_id —
    the physical plan must contain exactly ONE shuffle."""
    df = sessionize(_events(spark, [(1, 0, 1.0), (2, 5, 2.0)]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, f"expected 1 shuffle, saw {n_exchanges}:\n{plan}"


def test_sessionize_oracle_twin_duckdb(spark):
    """sessionize() == sessionize_sql() on the same parquet — the
    driver-gate comparison, run locally."""
    import duckdb

    from geospark.sessions import sessionize_sql

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    got = {
        (r["user_id"], r["session_idx"]):
        (r["n_events"], r["start_us"], r["end_us"], r["dwell_us"],
         r["value_cents"])
        for r in sessionize(ev, DEFAULT_GAP_US).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'"
    )
    want = {
        (int(u), int(i)): (int(n), int(s), int(e), int(d), int(c))
        for u, i, n, s, e, d, c in con.execute(sessionize_sql()).fetchall()
    }
    assert got == want
