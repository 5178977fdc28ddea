"""End-to-end training-data rehearsal at corpus scale (VERDICT r03
task #7): extract -> exact dedup -> minhash near-dup dedup ->
decontaminate -> pii_scrub -> split -> pack over a 5M-doc synthetic
crawl, every stage committed through runtime.Pipeline/SnapshotTable.

Usage:
    python scripts/training_pipeline.py [n_docs]
    TRAIN_KILL_AFTER=neardup_dedup python scripts/training_pipeline.py
        -> commits up to that stage, then exits non-zero (a crash).
    Re-running without the env resumes from the checkpoint: committed
    stages are skipped (their wall shows as 'resumed'), the rest run,
    and the final output is bit-identical to an uninterrupted run.

Appends a per-stage wall/row table to BENCH.md on full completion.
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
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    kill_after = os.environ.get("TRAIN_KILL_AFTER")

    from geospark.pages import synth_documents
    from geospark.runtime import Pipeline
    from geospark.session import get_spark
    from geospark.training import synth_corpus_pages, training_stages

    spark = get_spark(
        "training-pipeline", master="local[32]", shuffle_partitions=64,
        extra_conf={"spark.ui.enabled": "false",
                    "spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    root = f"/tmp/geospark_training_{n_docs}"
    eval_texts = synth_documents(spark, 200)  # benchmark/eval stand-in
    stages = training_stages(eval_texts, seq_len=2048, pack_shards=256)

    if kill_after:
        names = [s.name for s in stages]
        if kill_after not in names:
            raise SystemExit(f"unknown stage {kill_after}; have {names}")
        stages = stages[: names.index(kill_after) + 1]

    pipe = Pipeline(spark, root)
    source = synth_corpus_pages(spark, n_docs, partitions=64)

    t0 = time.time()
    final = pipe.run(source, stages)
    total = time.time() - t0
    n_final = final.count()

    if kill_after:
        print(f"KILLED after stage {kill_after} "
              f"({total:.1f}s, {n_final} rows committed so far)")
        spark.stop()
        sys.exit(3)  # simulated crash — rerun without the env to resume

    # per-stage evidence from the snapshot manifests + lineage rows of
    # THIS run (stages resumed from a prior run have no lineage rows
    # under this run_id — reported as 'resumed')
    lineage = pipe.lineage().filter(f"run_id = '{pipe.run_id}'")
    walls = {
        r["stage"]: r["wall_ms"]
        for r in lineage.select("stage", "wall_ms").distinct().collect()
    }
    rows_out = {}
    for s in ["_source", *[st.name for st in stages]]:
        cur = pipe.table(s).current()
        if cur:
            rows_out[s] = cur["rows"]

    per_stage = [
        (s.name,
         round(walls[s.name] / 1000.0, 1) if s.name in walls else "resumed",
         rows_out.get(s.name))
        for s in stages
    ]
    out = {
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
        "n_docs": n_docs,
        "total_sec": round(total, 1),
        "docs_per_sec": round(n_docs / total),
        "final_rows": n_final,
        "stages": {n: {"wall_s": w, "rows_out": r} for n, w, r in per_stage},
        "run_id": pipe.run_id,
    }
    print(json.dumps(out))

    lines = [
        "",
        f"## Training-data rehearsal {out['ts']} — {n_docs:,} docs, "
        "local[32], runtime.Pipeline snapshot commits",
        "",
        f"End-to-end {out['total_sec']}s ({out['docs_per_sec']:,} docs/sec "
        f"through all 7 stages); final packed-sequence spans: {n_final:,}. "
        f"Source pages: {rows_out.get('_source'):,} rows committed first "
        "(resume is well-defined even if the source expression is "
        "expensive).",
        "",
        "| stage | wall s | rows out |",
        "| --- | --- | --- |",
    ]
    for name, wall, rows in per_stage:
        lines.append(f"| {name} | {wall} | {rows:,} |")
    lines.append("")
    with open(REPO / "BENCH.md", "a") as f:
        f.write("\n".join(lines))
    spark.stop()


if __name__ == "__main__":
    main()
