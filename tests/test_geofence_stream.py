"""geofence_stream — watermark-exact enter/exit transitions.

Multi-batch state: users cross fences across micro-batches, a point
inside a fence's HOLE never enters, an idle key's buffered final
transition flushes via EventTimeTimeout, and an event the final
watermark never passes is withheld (append-mode exactness).
"""

from __future__ import annotations

import datetime
import glob
import os
import shutil
import tempfile

from geospark.joins import Area
from geospark.streaming import geofence_stream

BASE = datetime.datetime(2024, 1, 1)


def _sq(lo_lat, lo_lng, hi_lat, hi_lng):
    return [(lo_lat, lo_lng), (lo_lat, hi_lng),
            (hi_lat, hi_lng), (hi_lat, lo_lng)]


FENCES = [
    Area(1, [_sq(0.0, 0.0, 10.0, 10.0)]),
    Area(2, [_sq(5.0, 5.0, 15.0, 15.0)]),
    Area(3, [_sq(40.0, 40.0, 50.0, 50.0)],
         [[_sq(42.0, 42.0, 48.0, 48.0)]]),   # fence with a hole
]


def _us(minutes: int) -> int:
    return int((BASE + datetime.timedelta(minutes=minutes)
                - datetime.datetime(1970, 1, 1)).total_seconds() * 1_000_000)


def test_geofence_stream_watermark_exact(spark):
    tmp = tempfile.mkdtemp(prefix="geospark_geofence_stream_")
    try:
        batches = [
            # (user, t_minutes, lat, lng)
            [(1, 0, 1.0, 1.0),      # u1 enters fence 1
             (1, 5, 7.0, 7.0),      # u1 also enters fence 2
             (2, 1, 45.0, 45.0)],   # u2 in fence 3's HOLE: no enter
            [(1, 12, 12.0, 12.0),   # u1 exits fence 1 (still in 2)
             (9, 90, 1.0, 1.0),     # u9 enters fence 1; key then idle
             (2, 50, 41.0, 41.0)],  # u2 enters fence 3's annulus
            [(1, 200, 20.0, 20.0),  # u1 exits fence 2
             (2, 300, 45.0, 45.0)],  # back in the hole — but t300 is
                                     # never < the final watermark:
                                     # WITHHELD, stays in state
        ]
        for b, evs in enumerate(batches):
            df = spark.createDataFrame(
                [(u, BASE + datetime.timedelta(minutes=m), la, ln)
                 for u, m, la, ln in evs],
                "user_id long, ts timestamp, lat double, lng double",
            ).coalesce(1)
            df.write.mode("overwrite").parquet(f"{tmp}/b{b}")
            os.makedirs(f"{tmp}/drop", exist_ok=True)
            for i, f in enumerate(sorted(glob.glob(f"{tmp}/b{b}/*.parquet"))):
                shutil.copy(f, f"{tmp}/drop/batch-{b}-{i}.parquet")

        stream = (
            spark.readStream
            .schema("user_id long, ts timestamp, lat double, lng double")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/drop")
        )
        out = geofence_stream(stream, FENCES)
        q = (out.writeStream.format("memory")
             .queryName("geofence_stream_test")
             .option("checkpointLocation", f"{tmp}/ckpt")
             .outputMode("append")
             .trigger(availableNow=True)
             .start())
        q.awaitTermination(300)
        got = {
            (r["user"], r["ts_us"], r["fence_id"], r["transition"])
            for r in spark.sql(
                "SELECT * FROM geofence_stream_test").collect()
        }
        want = {
            (1, _us(0), 1, "enter"),
            (1, _us(5), 2, "enter"),
            (1, _us(12), 1, "exit"),
            (1, _us(200), 2, "exit"),   # via EventTimeTimeout flush
            (2, _us(50), 3, "enter"),   # hole point at t1 never entered
            (9, _us(90), 1, "enter"),   # idle-key timeout flush
        }
        assert got == want
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_geofence_stream_crash_resume(spark):
    """Checkpoint state-store recovery: the SAME fixture stream run as
    three separate queries (process restarts) against one checkpoint +
    durable parquet sink — batch 0, kill, batch 1, kill, batch 2 —
    must emit EXACTLY the uninterrupted run's transitions. Each
    restart recovers every user's inside-fence set and the pending
    watermark buffer from the state store; the file-sink commit log
    keeps the output exactly-once across the kills."""
    tmp = tempfile.mkdtemp(prefix="geospark_geofence_resume_")
    try:
        batches = [
            [(1, 0, 1.0, 1.0), (1, 5, 7.0, 7.0), (2, 1, 45.0, 45.0)],
            [(1, 12, 12.0, 12.0), (9, 90, 1.0, 1.0), (2, 50, 41.0, 41.0)],
            [(1, 200, 20.0, 20.0), (2, 300, 45.0, 45.0)],
        ]
        os.makedirs(f"{tmp}/drop", exist_ok=True)
        sink = f"{tmp}/sink"

        def drain():
            """One 'process lifetime': start from the shared
            checkpoint, drain whatever files have landed, terminate."""
            stream = (
                spark.readStream
                .schema("user_id long, ts timestamp, lat double, lng double")
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{tmp}/drop")
            )
            q = (geofence_stream(stream, FENCES)
                 .writeStream.format("parquet")
                 .option("path", sink)
                 .option("checkpointLocation", f"{tmp}/ckpt")
                 .outputMode("append")
                 .trigger(availableNow=True)
                 .start())
            assert q.awaitTermination(300)

        for b, evs in enumerate(batches):
            df = spark.createDataFrame(
                [(u, BASE + datetime.timedelta(minutes=m), la, ln)
                 for u, m, la, ln in evs],
                "user_id long, ts timestamp, lat double, lng double",
            ).coalesce(1)
            df.write.mode("overwrite").parquet(f"{tmp}/b{b}")
            for i, f in enumerate(sorted(glob.glob(f"{tmp}/b{b}/*.parquet"))):
                shutil.copy(f, f"{tmp}/drop/batch-{b}-{i}.parquet")
            drain()  # query dies after this batch; next loop resumes

        got = {
            (r["user"], r["ts_us"], r["fence_id"], r["transition"])
            for r in spark.read.parquet(sink).collect()
        }
        want = {
            (1, _us(0), 1, "enter"),
            (1, _us(5), 2, "enter"),
            (1, _us(12), 1, "exit"),
            (1, _us(200), 2, "exit"),
            (2, _us(50), 3, "enter"),
            (9, _us(90), 1, "enter"),
        }
        assert got == want
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
