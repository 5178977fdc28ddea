"""Operator-scale evidence for the STATEFUL STREAMING family:
replay a deterministic multi-million-event GPS stream as time-sliced
micro-batches through geofence_stream and sessionize_stream
(applyInPandasWithState, EventTimeTimeout) and append wall times +
events/sec to BENCH.md.

The synthetic stream is splitmix64-driven (pure function of the event
index): n_users walkers emitting one ping per step, positions a
bounded random walk around per-user anchors spread across the demo
polygon layer's extent — so a realistic fraction of pings sit inside
fences and transitions actually occur (a uniform global scatter would
make fence hits ~0.1% and measure nothing but state overhead).

Usage: python scripts/stream_stress.py [n_events] [n_users] [n_slices]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_users = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    n_slices = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F  # noqa: F401

    from geospark import geodata as G
    from geospark.session import get_spark

    spark = get_spark(
        "stream-stress", master="local[32]", shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false",
                    "spark.driver.memory": "32g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    spool = f"/tmp/geospark_stream_stress_{n_events}_{n_users}_{n_slices}"
    if not os.path.exists(f"{spool}/_DONE"):
        from geospark.pages import _splitmix64, _u01  # deterministic PRNG

        os.makedirs(spool, exist_ok=True)
        idx = np.arange(n_events, dtype=np.uint64)
        user = (idx % np.uint64(n_users)).astype(np.int64)
        step = (idx // np.uint64(n_users)).astype(np.int64)
        # per-user anchors spread over the demo layer's bbox union
        # (Europe pentagon / NA quad / Oceania triangle + slack)
        ua = user.astype(np.uint64)
        anchor_lat = -50.0 + 120.0 * _u01(_splitmix64(ua * np.uint64(7) + np.uint64(1)))
        anchor_lng = -140.0 + 300.0 * _u01(_splitmix64(ua * np.uint64(7) + np.uint64(2)))
        # bounded random walk: +-0.5 deg per step, reflected at +-5 deg
        dlat = (_u01(_splitmix64(idx * np.uint64(11) + np.uint64(3))) - 0.5)
        dlng = (_u01(_splitmix64(idx * np.uint64(11) + np.uint64(4))) - 0.5)
        # cumulative walk without a per-user scan: offset = f(step)
        # (triangle wave keeps it bounded and deterministic per event)
        w_lat = ((step % 20) - 10) * 0.5 + dlat
        w_lng = ((step % 24) - 12) * 0.5 + dlng
        lat = np.clip(anchor_lat + w_lat, -84.0, 84.0)
        lng = ((anchor_lng + w_lng + 180.0) % 360.0) - 180.0
        # bursty cadence: pings 60s apart inside 10-ping bursts, 30min
        # of silence between bursts — so the 5-minute-gap sessionizer
        # actually closes sessions (a constant 60s cadence would keep
        # one session per user open forever and emit nothing)
        ts_us = (np.int64(1_700_000_000_000_000)
                 + step * np.int64(60_000_000)
                 + (step // 10) * np.int64(1_800_000_000)
                 + user * np.int64(13))
        order = np.argsort(ts_us, kind="stable")
        bounds = np.linspace(0, n_events, n_slices + 1).astype(np.int64)
        for i in range(n_slices):
            sl = order[bounds[i]:bounds[i + 1]]
            tbl = pa.table({
                "user_id": pa.array(user[sl], pa.int64()),
                "ts": pa.array(ts_us[sl], pa.timestamp("us")),
                "lat": pa.array(lat[sl], pa.float64()),
                "lng": pa.array(lng[sl], pa.float64()),
            })
            f = f"{spool}/slice{i:03d}.parquet"
            pq.write_table(tbl, f)
            os.utime(f, (1_700_000_000 + i * 60,) * 2)
        open(f"{spool}/_DONE", "w").close()

    results: dict[str, dict] = {}

    def run(name: str, fn) -> None:
        t0 = time.time()
        extra = fn()
        secs = time.time() - t0
        results[name] = {
            "sec": round(secs, 1),
            "events_per_sec": round(n_events / secs), **extra,
        }
        print(f"  {name}: {secs:.1f}s {extra}", flush=True)

    def _stream():
        return (
            spark.readStream
            .schema("user_id long, ts timestamp, lat double, lng double")
            .option("maxFilesPerTrigger", 2)
            .parquet(spool)
        )

    def _drain(out, qname: str, ckpt: str) -> int:
        q = (out.writeStream.format("memory").queryName(qname)
             .outputMode("append")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        if not q.awaitTermination(3600):
            q.stop()
            raise RuntimeError(f"{qname}: did not terminate")
        return spark.table(qname).count()

    import tempfile

    from geospark.streaming import geofence_stream, sessionize_stream

    def _geofence():
        out = geofence_stream(_stream(), G.demo_layer().areas)
        n = _drain(out, "stress_geofence",
                   tempfile.mkdtemp(prefix="gf_ckpt_"))
        return {"transitions": n}

    run("geofence_stream_demo_layer", _geofence)

    def _sessionize():
        out = sessionize_stream(_stream(), gap_us=5 * 60_000_000)
        n = _drain(out, "stress_sessions",
                   tempfile.mkdtemp(prefix="ss_ckpt_"))
        return {"sessions": n}

    run("sessionize_stream_gap5m", _sessionize)

    per_batch_lines: list[str] = []

    def _geofence_kill_resume():
        """The resumability claim, exercised at operator scale: run the
        SAME geofence stream through a durable parquet sink, hard-stop
        the query mid-stream (mid-batch — availableNow is still
        draining), then restart from the checkpoint and drain. The
        state store (RocksDB-format HDFS state by default in local
        mode) recovers every user's inside-fence set and pending
        watermark buffer; the file sink's commit log makes the kill
        exactly-once, so the final transition set must be IDENTICAL to
        the uninterrupted memory-sink run above."""
        ckpt = tempfile.mkdtemp(prefix="gf_kr_ckpt_")
        sink = tempfile.mkdtemp(prefix="gf_kr_sink_") + "/out"

        def start():
            return (
                geofence_stream(_stream(), G.demo_layer().areas)
                .writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )

        def progress_rows(q):
            return [
                (p["batchId"], p["numInputRows"],
                 p["durationMs"].get("triggerExecution", 0))
                for p in q.recentProgress if p["numInputRows"]
            ]

        # half the micro-batches, then kill (stop() aborts in-flight work)
        target = max(1, (n_slices + 1) // 2 // 2)
        q = start()
        while q.isActive:
            if len(progress_rows(q)) >= target:
                q.stop()
                break
            time.sleep(0.25)
        q.awaitTermination(600)
        before = progress_rows(q)

        q2 = start()
        if not q2.awaitTermination(3600):
            q2.stop()
            raise RuntimeError("resume did not terminate")
        after = progress_rows(q2)

        n = spark.read.parquet(sink).count()
        base = results.get("geofence_stream_demo_layer", {}).get("transitions")
        for phase, rows in (("before-kill", before), ("after-resume", after)):
            for bid, nrows, ms in rows:
                rps = round(nrows / max(ms, 1) * 1000)
                per_batch_lines.append(
                    f"| {phase} | {bid} | {nrows} | {ms} | {rps} |")
        return {
            "transitions": n,
            "matches_uninterrupted": (base is None or n == base),
            "batches_before_kill": len(before),
            "batches_after_resume": len(after),
        }

    run("geofence_kill_resume", _geofence_kill_resume)

    out = {
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
        "n_events": n_events, "n_users": n_users, "n_slices": n_slices,
        "results": results,
    }
    print(json.dumps(out))
    lines = [
        "",
        f"## Stateful-streaming scale run {out['ts']} — "
        f"{n_events:,} events, {n_users:,} users, {n_slices} slices, "
        "local[32]",
        "",
        "| operator | wall s | events/sec | outputs |",
        "| --- | --- | --- | --- |",
    ]
    for name, r in results.items():
        extra = {k: v for k, v in r.items()
                 if k not in ("sec", "events_per_sec")}
        lines.append(
            f"| {name} | {r['sec']} | {r['events_per_sec']} | {extra} |")
    if per_batch_lines:
        lines += [
            "",
            "Per-micro-batch throughput across the kill/resume "
            "(parquet sink, checkpoint state-store recovery):",
            "",
            "| phase | batch | input rows | trigger ms | rows/sec |",
            "| --- | --- | --- | --- | --- |",
            *per_batch_lines,
        ]
    lines.append("")
    with open(REPO / "BENCH.md", "a") as f:
        f.write("\n".join(lines))
    spark.stop()


if __name__ == "__main__":
    main()
