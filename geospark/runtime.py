"""Scale machinery: snapshot tables, checkpoint/resume pipelines,
per-partition lineage metrics (SURVEY §7.8).

The north rule asks for Iceberg-snapshot checkpoints. The sandbox has
no Iceberg runtime jar (and no network), so this module implements the
documented fallback: parquet data files + JSON snapshot manifests with
the SAME resume API — each committed snapshot records its id, parent,
stage name, row count and file list; commits are atomic (manifest
written via tmp + rename, data written before the manifest). Swapping
in a real Iceberg catalog replaces ``SnapshotTable`` internals only
(``writeTo(...).append()`` + snapshot ids from the table metadata).

Lineage: every pipeline stage appends one row per output partition to
``<root>/_lineage`` — (run_id, stage, partition_id, rows, wall_ms,
input_snapshot, output_snapshot) — queryable as a plain parquet table.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotTable:
    """Parquet-backed table with atomic snapshot commits.

    Layout: ``<path>/data/snap-<id>/part-*.parquet`` plus
    ``<path>/_snapshots/<seq>-<id>.json`` manifests. The latest
    committed manifest is the current snapshot; uncommitted data dirs
    (crash between data write and manifest rename) are ignored — the
    same recovery contract as Iceberg's metadata pointer."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        os.makedirs(f"{self.path}/_snapshots", exist_ok=True)
        os.makedirs(f"{self.path}/data", exist_ok=True)

    # -- manifest helpers ---------------------------------------------------
    def _manifests(self) -> list[dict]:
        d = f"{self.path}/_snapshots"
        out = []
        for f_ in sorted(os.listdir(d)):
            # '.tmp-*.json' is an in-flight (possibly truncated) commit
            # — a crash before os.rename must leave it invisible, or a
            # half-written file bricks every later read and a complete
            # one counts as committed without ever entering a parent
            # chain
            if f_.endswith(".json") and not f_.startswith("."):
                with open(f"{d}/{f_}") as fh:
                    out.append(json.load(fh))
        return out

    def current(self) -> dict | None:
        m = self._manifests()
        return m[-1] if m else None

    def snapshot(self, snapshot_id: str) -> dict | None:
        for m in self._manifests():
            if m["snapshot_id"] == snapshot_id:
                return m
        return None

    # -- IO -----------------------------------------------------------------
    def write(self, df: DataFrame, stage: str = "", mode: str = "overwrite") -> dict:
        """Materialize df as a new snapshot; returns the manifest.
        ``mode='append'`` makes the new snapshot the union of the
        parent's files and the new files (file-level append, no
        rewrite)."""
        snap_id = uuid.uuid4().hex[:16]
        data_dir = f"{self.path}/data/snap-{snap_id}"
        t0 = time.time()
        # row count rides the write job itself (Observation) — no
        # second read-back scan of what was just written
        from pyspark.sql import Observation

        obs = Observation()
        df.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
            "overwrite").parquet(data_dir)
        rows = int(obs.get["rows"])
        parent = self.current()
        dirs = [data_dir]
        total_rows = rows
        if mode == "append" and parent is not None:
            dirs = parent["data_dirs"] + dirs
            total_rows += parent["rows"]
        manifest = {
            "snapshot_id": snap_id,
            "parent_id": parent["snapshot_id"] if parent else None,
            "stage": stage,
            "ts": time.time(),
            "rows": total_rows,
            "rows_added": rows,
            "data_dirs": dirs,
            "wall_s": round(time.time() - t0, 3),
        }
        seq = len(self._manifests())
        tmp = f"{self.path}/_snapshots/.tmp-{snap_id}.json"
        final = f"{self.path}/_snapshots/{seq:06d}-{snap_id}.json"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.rename(tmp, final)  # atomic commit
        return manifest

    def read(self, snapshot_id: str | None = None) -> DataFrame:
        """Read the current snapshot, or time-travel to a given id."""
        m = self.snapshot(snapshot_id) if snapshot_id else self.current()
        if m is None:
            raise FileNotFoundError(f"no committed snapshot in {self.path}")
        return self.spark.read.parquet(*m["data_dirs"])

    def expire(self, keep_last: int = 1) -> int:
        """Iceberg-style expire_snapshots: delete data dirs referenced
        ONLY by manifests older than the last ``keep_last`` snapshots.
        Manifests stay (commit/replay markers and the seq chain remain
        intact); time-travel to an expired snapshot raises on read —
        the documented cost of reclaiming space. Returns the number of
        data dirs removed."""
        import shutil

        ms = self._manifests()
        if len(ms) <= keep_last:
            return 0
        live: set[str] = set()
        for m in ms[-keep_last:]:
            live.update(m["data_dirs"])
        removed = 0
        for m in ms[:-keep_last]:
            for d in m["data_dirs"]:
                if d not in live and os.path.isdir(d):
                    shutil.rmtree(d, ignore_errors=True)
                    removed += 1
        return removed


@dataclass
class Stage:
    name: str
    fn: Callable[[DataFrame], DataFrame]


class Pipeline:
    """Checkpoint/resume pipeline: each stage's output is committed as
    a snapshot keyed by (stage name, input snapshot id). Re-running
    skips stages whose (name, input) already committed — resume after
    a crash restarts at the first uncommitted stage, reading the last
    good snapshot. Lineage rows are appended per stage."""

    def __init__(self, spark: SparkSession, root: str, run_id: str | None = None):
        self.spark = spark
        self.root = root.rstrip("/")
        self.run_id = run_id or uuid.uuid4().hex[:12]

    def table(self, name: str) -> SnapshotTable:
        return SnapshotTable(self.spark, f"{self.root}/{name}")

    def _find_commit(self, table: SnapshotTable, stage: str,
                     input_snapshot: str | None) -> dict | None:
        for m in table._manifests():
            if m["stage"] == f"{stage}@{input_snapshot}":
                return m
        return None

    def run(self, source: DataFrame, stages: list[Stage]) -> DataFrame:
        """Run (or resume) the stage chain starting from ``source``.
        The source is committed as stage '_source' first so resume is
        well-defined even if the source expression is expensive."""
        lineage_dir = f"{self.root}/_lineage"
        cur_table = self.table("_source")
        cur_manifest = self._find_commit(cur_table, "_source", None)
        if cur_manifest is None:
            cur_manifest = cur_table.write(source, stage="_source@None")
        df = cur_table.read(cur_manifest["snapshot_id"])
        input_snap = cur_manifest["snapshot_id"]

        for stage in stages:
            table = self.table(stage.name)
            existing = self._find_commit(table, stage.name, input_snap)
            if existing is not None:
                df = table.read(existing["snapshot_id"])
                input_snap = existing["snapshot_id"]
                continue
            t0 = time.time()
            out = stage.fn(df)
            manifest = table.write(out, stage=f"{stage.name}@{input_snap}")
            wall_ms = (time.time() - t0) * 1000.0
            # per-partition lineage of the committed output
            committed = table.read(manifest["snapshot_id"])
            part_rows = (
                committed.groupBy(F.spark_partition_id().alias("partition_id"))
                .agg(F.count("*").alias("rows"))
                .withColumn("run_id", F.lit(self.run_id))
                .withColumn("stage", F.lit(stage.name))
                .withColumn("input_snapshot", F.lit(input_snap))
                .withColumn("output_snapshot", F.lit(manifest["snapshot_id"]))
                .withColumn("wall_ms", F.lit(round(wall_ms, 1)))
            )
            part_rows.write.mode("append").parquet(lineage_dir)
            df = committed
            input_snap = manifest["snapshot_id"]
        return df

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.root}/_lineage")
