"""Incremental tile-count maintenance: streaming deltas into a
SnapshotTable must equal a batch recompute, survive resume (new files
only), skip replayed batches, and compact the manifest chain."""

from pyspark.sql import functions as F

from geospark.cells import with_tile
from geospark.extract import extract_points
from geospark.pages import synth_pages
from geospark.runtime import SnapshotTable
from geospark.streaming import maintain_tile_counts, read_tile_counts

ZOOM = 6


def _write_drop(spark, src_dir, seq, n):
    """One 'crawl drop': n synthetic pages as FLAT parquet files in the
    stream source dir (the file source lists flat files). Drops of
    different sizes overlap in content — harmless, because the batch
    recompute reads the very same files. Returns the file paths."""
    import glob
    import os
    import shutil

    os.makedirs(src_dir, exist_ok=True)
    stage = f"{src_dir}-stage-{seq}"
    synth_pages(spark, n, partitions=2).write.mode("overwrite").parquet(stage)
    out = []
    for i, f in enumerate(sorted(glob.glob(f"{stage}/part-*.parquet"))):
        dst = f"{src_dir}/drop{seq}-{i}.parquet"
        shutil.copy(f, dst)
        out.append(dst)
    shutil.rmtree(stage)
    return out


def _expected(spark, dirs):
    pages = spark.read.parquet(*dirs)
    pts = extract_points(pages.select("url", "text"))
    return {
        (r["tile_x"], r["tile_y"]): r["n"]
        for r in with_tile(pts, ZOOM).groupBy("tile_x", "tile_y")
        .agg(F.count("*").alias("n")).collect()
    }


def _got(spark, table_path):
    st = SnapshotTable(spark, table_path)
    return {
        (r["tile_x"], r["tile_y"]): r["n_points"]
        for r in read_tile_counts(st).collect()
    }


def test_incremental_equals_batch_and_resumes(spark, tmp_path):
    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    d01 = _write_drop(spark, src, 0, 400) + _write_drop(spark, src, 1, 350)

    from geospark.streaming import read_pages_stream

    q = maintain_tile_counts(
        read_pages_stream(spark, src, max_files_per_trigger=2),
        table, ckpt, zoom=ZOOM, compact_every=3,
    )
    q.awaitTermination(120)
    assert _got(spark, table) == _expected(spark, d01)

    # resume: a third drop arrives; the SAME checkpoint processes only it
    d2 = _write_drop(spark, src, 2, 300)
    st = SnapshotTable(spark, table)
    n_manifests_before = len(st._manifests())
    q2 = maintain_tile_counts(
        read_pages_stream(spark, src, max_files_per_trigger=2),
        table, ckpt, zoom=ZOOM, compact_every=3,
    )
    q2.awaitTermination(120)
    assert _got(spark, table) == _expected(spark, d01 + d2)
    added = [m["stage"] for m in st._manifests()[n_manifests_before:]]
    assert any(s.startswith("batch-") for s in added)
    # every delta commit is small (lineage metrics recorded per batch)
    for m in st._manifests():
        assert "rows_added" in m and "wall_s" in m


def test_replayed_batch_id_is_skipped(spark, tmp_path):
    table = str(tmp_path / "table2")
    st = SnapshotTable(spark, table)
    delta = spark.createDataFrame(
        [(1, 2, 5)], "tile_x long, tile_y long, n_points long"
    )
    st.write(delta, stage="batch-7", mode="append")
    before = _got(spark, table)

    # simulate foreachBatch crash-replay of batch 7 via the same guard
    stages = [m["stage"] for m in st._manifests()]
    assert "batch-7" in stages  # the guard maintain_tile_counts uses
    assert _got(spark, table) == before


def test_compaction_bounds_read_fanin(spark, tmp_path):
    table = str(tmp_path / "table3")
    st = SnapshotTable(spark, table)
    for i in range(6):
        st.write(
            spark.createDataFrame(
                [(1, 1, 1)], "tile_x long, tile_y long, n_points long"
            ),
            stage=f"batch-{i}", mode="append",
        )
    assert _got(spark, table) == {(1, 1): 6}
    st.write(read_tile_counts(st), stage="compact-5", mode="overwrite")
    assert len(st.current()["data_dirs"]) == 1      # fan-in reset
    assert _got(spark, table) == {(1, 1): 6}        # value preserved
    st.write(
        spark.createDataFrame(
            [(1, 1, 4)], "tile_x long, tile_y long, n_points long"
        ),
        stage="batch-6", mode="append",
    )
    assert _got(spark, table) == {(1, 1): 10}


def test_dedup_pages_stream_first_arrival_wins(spark, tmp_path):
    """Overlapping crawl drops: each url must come out exactly once
    regardless of how the file source splits batches. synth_pages
    hashes warc_ts over a 30-day span while files arrive in id order,
    so the horizon must exceed the span or rows arriving after the
    watermark jumped would be discarded as LATE (not as duplicates) —
    the companion test below pins that horizon behavior explicitly."""
    from geospark.streaming import dedup_pages_stream, read_pages_stream

    src = str(tmp_path / "dsrc")
    _write_drop(spark, src, 0, 120)
    _write_drop(spark, src, 1, 200)  # ids 0..119 duplicate drop 0

    stream = read_pages_stream(spark, src, max_files_per_trigger=1)
    out = dedup_pages_stream(stream, watermark="45 days")
    q = (
        out.writeStream.format("memory").queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT url, count(*) AS n FROM dedup_stream GROUP BY url"
    ).collect()
    assert len(rows) == 200            # distinct urls across both drops
    assert all(r["n"] == 1 for r in rows)


def _write_pages_file(spark, src_dir, name, rows, mtime):
    """One flat parquet file of explicit pages rows with a pinned mtime
    (the file stream source orders batches by modification time)."""
    import glob
    import os
    import shutil

    from geospark.pages import PAGES_SCHEMA

    os.makedirs(src_dir, exist_ok=True)
    stage = f"{src_dir}-stage-{name}"
    spark.createDataFrame(rows, PAGES_SCHEMA).coalesce(1) \
        .write.mode("overwrite").parquet(stage)
    dst = f"{src_dir}/{name}.parquet"
    shutil.copy(glob.glob(f"{stage}/part-*.parquet")[0], dst)
    os.utime(dst, (mtime, mtime))
    shutil.rmtree(stage)


def test_dedup_pages_stream_horizon_eviction(spark, tmp_path):
    """The documented contract: a re-crawl of the same url WITHIN the
    watermark horizon is dropped, BEYOND it re-emits (state evicted);
    batch exact_dedup is the full-corpus complement downstream."""
    from datetime import datetime, timedelta

    from geospark.streaming import dedup_pages_stream, read_pages_stream

    t0 = datetime(2025, 3, 1, 12, 0, 0)

    def row(url, ts):
        return (url, ts, b"<html/>", "x", "en")

    src = str(tmp_path / "hsrc")
    base = 1_700_000_000
    _write_pages_file(spark, src, "f0", [row("a", t0), row("b", t0)], base)
    _write_pages_file(                       # dup of a, 10 min later
        spark, src, "f1",
        [row("a", t0 + timedelta(minutes=10)),
         row("c", t0 + timedelta(minutes=10))], base + 10)
    _write_pages_file(                       # advances watermark to t0+2h
        spark, src, "f2", [row("d", t0 + timedelta(hours=3))], base + 20)
    _write_pages_file(                       # spacer batch: state eviction
        # runs at END of a batch with the t0+2h watermark, purging a
        spark, src, "f3",
        [row("e", t0 + timedelta(hours=3, minutes=5))], base + 30)
    _write_pages_file(                       # re-crawl beyond the horizon
        spark, src, "f4",
        [row("a", t0 + timedelta(hours=3, minutes=10))], base + 40)

    stream = read_pages_stream(spark, src, max_files_per_trigger=1)
    out = dedup_pages_stream(stream, watermark="1 hour")
    q = (
        out.writeStream.format("memory").queryName("dedup_h")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "hckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    counts = {
        r["url"]: r["n"]
        for r in spark.sql(
            "SELECT url, count(*) AS n FROM dedup_h GROUP BY url"
        ).collect()
    }
    assert counts == {"a": 2, "b": 1, "c": 1, "d": 1, "e": 1}


def test_streaming_compaction_expires_folded_deltas(spark, tmp_path):
    """With expire_on_compact (the default), each compaction reclaims
    the delta data dirs it folded — disk tracks the live view — while
    the manifests stay as replay markers and the counts stay exact."""
    import os

    src = str(tmp_path / "src")
    table = str(tmp_path / "table4")
    ckpt = str(tmp_path / "ckpt4")
    drops = []
    for i in range(3):
        drops += _write_drop(spark, src, i, 200)

    from geospark.streaming import read_pages_stream

    q = maintain_tile_counts(
        read_pages_stream(spark, src, max_files_per_trigger=1),
        table, ckpt, zoom=ZOOM, compact_every=1,  # compact every batch
    )
    q.awaitTermination(180)
    assert _got(spark, table) == _expected(spark, drops)
    st = SnapshotTable(spark, table)
    # every batch compacted+expired: only the LAST compaction's data
    # dir (plus nothing else) should survive on disk
    live = set(st.current()["data_dirs"])
    on_disk = {f"{st.path}/data/{d}" for d in os.listdir(f"{st.path}/data")}
    assert on_disk == live, (on_disk, live)
    # manifests (6 batches: 3 drops x 2 part files, + 6 compactions)
    # all retained for replay
    stages = [m["stage"] for m in st._manifests()]
    assert sum(s.startswith("batch-") for s in stages) == 6
    assert sum(s.startswith("compact-") for s in stages) == 6


def test_sliding_tile_counts_append_semantics(spark, tmp_path):
    """sliding_tile_counts: every event lands in exactly
    window/slide overlapping windows, append mode emits a window
    exactly once when the watermark passes its end, and the final
    (unfinalizable) windows stay withheld — pinned on a hand-built
    3-batch stream with known timestamps."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from geospark.streaming import sliding_tile_counts

    # win=20s slide=10s; events at t=5,12,25,31,47 (same location)
    src = str(tmp_path / "src")
    os.makedirs(src)
    base = 1_700_000_000_000_000  # us
    batches = [[5, 12], [25, 31], [47]]
    for i, ts_list in enumerate(batches):
        tbl = pa.table({
            "user_id": pa.array([1] * len(ts_list), pa.int64()),
            "ts": pa.array([base + t * 1_000_000 for t in ts_list],
                           pa.timestamp("us")),
            "lat": pa.array([48.1] * len(ts_list), pa.float64()),
            "lng": pa.array([11.5] * len(ts_list), pa.float64()),
        })
        f = f"{src}/b{i}.parquet"
        pq.write_table(tbl, f)
        os.utime(f, (1_700_000_000 + i * 60,) * 2)
    stream = (
        spark.readStream
        .schema("user_id long, ts timestamp, lat double, lng double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = sliding_tile_counts(stream, zoom=4, window="20 seconds",
                              slide="10 seconds", watermark="0 seconds")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        q = (
            out.writeStream.format("memory")
            .queryName("trend_test")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    rows = spark.sql(
        "SELECT unix_micros(win_start) AS ws, n_points FROM trend_test"
    ).collect()
    got = sorted((int((r["ws"] - base) / 1_000_000), r["n_points"])
                 for r in rows)
    # watermark ends at t=47: finalized windows are those ending <= 47.
    # windows (start, [events]): (-10,[5]) (0,[5,12]) (10,[12,25])
    # (20,[25,31]) -> ends 10/20/30/40 <= 47 all emitted; (30,[31,47])
    # ends 50 and (40,[47]) ends 60 stay withheld.
    assert got == [(-10, 1), (0, 2), (10, 2), (20, 2)]
