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


def test_sessionize_stream_watermark_exact(spark):
    """Streaming sessionization (applyInPandasWithState) emits exactly
    the watermark-FINAL sessions, each once, across multi-batch state:
    3 parquet drops arrive as 3 micro-batches (maxFilesPerTrigger=1),
    keys span batches, and the union of emitted rows equals the batch
    twin (sessions.sessionize) restricted to sessions the final
    watermark closed. Open sessions stay in state, not in output.

    Includes the IDLE-KEY regression: user 4's only event arrives in
    batch 0 and the key never appears again — its session must still
    flush via the EventTimeTimeout once the watermark passes end+gap
    (under NoTimeout it would strand in state forever)."""
    import glob
    import os
    import shutil
    import tempfile

    from geospark.streaming import sessionize_stream

    tmp = tempfile.mkdtemp(prefix="geospark_sess_stream_")
    try:
        # batch b: user u gets events at minute offsets; user 1 has a
        # session spanning batches 0-1 (gap 10 min), user 2's early
        # session closes once batch 2's watermark passes it
        gap_us = 10 * 60 * 1_000_000
        batches = [
            [(1, 0), (1, 5), (2, 0), (4, 1)],  # t in minutes; u4 never again
            [(1, 12), (2, 100), (3, 40)],      # u1: 12-5=7 < 10 -> same session
            [(1, 200), (2, 210), (3, 220)],    # wm jumps to 100 then 200+
        ]
        rows_all = []
        for b, evs in enumerate(batches):
            df = spark.createDataFrame(
                [(u, datetime.datetime(2024, 1, 1)
                  + datetime.timedelta(minutes=m), float(u))
                 for u, m in evs],
                "user_id long, ts timestamp, value double",
            ).coalesce(1)
            df.write.mode("overwrite").parquet(f"{tmp}/b{b}")
            # single drop dir with sortable names -> deterministic
            # batch order under maxFilesPerTrigger=1
            os.makedirs(f"{tmp}/drop", exist_ok=True)
            for i, f in enumerate(sorted(glob.glob(f"{tmp}/b{b}/*.parquet"))):
                shutil.copy(f, f"{tmp}/drop/batch-{b}-{i}.parquet")
            rows_all.extend(evs)

        stream = (
            spark.readStream
            .schema("user_id long, ts timestamp, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/drop")
        )
        out = sessionize_stream(stream, gap_us=gap_us)
        q = (out.writeStream.format("memory")
             .queryName("sess_stream_test")
             .option("checkpointLocation", f"{tmp}/ckpt")
             .outputMode("append")
             .trigger(availableNow=True)
             .start())
        q.awaitTermination(300)
        got = {
            (r["user"], r["session_start_us"], r["session_end_us"],
             r["n_events"])
            for r in spark.sql("SELECT * FROM sess_stream_test").collect()
        }

        # batch twin on the full data; final watermark = max event time
        # through the SECOND-TO-LAST processed batch... conservatively,
        # every session the stream emitted must be a real batch session
        # and every session closed WELL before the final data must have
        # been emitted (u1's 0-12 min session, u2's t=0 and t=100
        # singletons, u3's t=40 singleton).
        full = spark.createDataFrame(
            [(i, u, datetime.datetime(2024, 1, 1)
              + datetime.timedelta(minutes=m), float(u))
             for i, (u, m) in enumerate(rows_all)],
            "event_id long, user_id long, ts timestamp, value double",
        )
        batch_sessions = {
            (r["user_id"], r["start_us"], r["end_us"], r["n_events"])
            for r in sessionize(full, gap_us=gap_us).collect()
        }
        assert got <= batch_sessions, got - batch_sessions
        base = int(datetime.datetime(
            2024, 1, 1, tzinfo=datetime.timezone.utc).timestamp()) * 1_000_000
        m = 60 * 1_000_000
        # the stream ends with a no-data micro-batch that fires armed
        # EventTimeTimeouts under the FINAL watermark (max event time
        # = 220min), so exactly the sessions with end + gap < 220min
        # finalize — including u4's idle-key singleton (end+gap=11min,
        # flushed by timeout during batch 3 with no u4 rows) and u1's
        # t=200 / u2's t=100 singletons (closed only by the terminal
        # no-data batch). u2's t=210 and u3's t=220 stay open
        # (end+gap = 220/230 are not < 220).
        must_emit = {
            (1, base + 0 * m, base + 12 * m, 3),
            (1, base + 200 * m, base + 200 * m, 1),
            (2, base + 0 * m, base + 0 * m, 1),
            (2, base + 100 * m, base + 100 * m, 1),
            (3, base + 40 * m, base + 40 * m, 1),
            (4, base + 1 * m, base + 1 * m, 1),
        }
        assert got == must_emit, got ^ must_emit
        # every emission is watermark-final: end + gap < final wm
        for u, s, e, n in got:
            assert e + gap_us < base + 220 * m, (u, s, e, n)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_sessionize_stream_preserves_key_type(spark, tmp_path):
    """The stateful operator's output schema must carry the caller's
    key type (regression for the hardcoded `user long`)."""
    from pyspark.sql.types import StringType

    from geospark.streaming import sessionize_stream

    src = tmp_path / "src"
    src.mkdir()
    stream = (
        spark.readStream
        .schema("user_id string, ts timestamp")
        .parquet(str(src))  # schema-only; never started
    )
    out = sessionize_stream(stream)
    assert isinstance(out.schema["user"].dataType, StringType)
