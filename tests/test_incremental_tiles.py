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
