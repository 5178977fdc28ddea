"""Operator-scale evidence for embedding near-dup: run the auto-sized
multi-table sign-LSH (neardup_lsh_params + the one-scan Arrow
bucketer) on >=5M synthetic 64-d vectors with PLANTED near-duplicate
pairs at known cosine (pages.synth_embeddings), and measure the three
numbers the design claims:

- candidate pairs vs the budget (10 per row — scales with n so the
  refine stage stays linear; must be within ~2x of target);
- recall on planted pairs with exact cos >= threshold (must be >=
  the target_recall the sizing solved for);
- wall time per stage (bucket+join, exact refine).

Appends a BENCH.md section. Usage: python scripts/emb_stress.py [n_vecs]
"""

from __future__ import annotations

import datetime
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent

THRESHOLD = 0.95
TARGET_RECALL = 0.9
DIM = 64


def main() -> None:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000

    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    from geospark.session import get_spark
    from geospark import embeddings as E

    spark = get_spark(
        "emb-stress", master="local[32]", shuffle_partitions=64,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "48g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    path = f"/tmp/geospark_stress_emb_{n_vecs}_{DIM}"
    if not os.path.exists(f"{path}/_SUCCESS"):
        from geospark.pages import synth_embeddings

        synth_embeddings(
            spark, n_vecs, dim=DIM, dup_frac=0.15, min_cos=0.90,
            partitions=64,
        ).write.mode("overwrite").parquet(path)
    emb = spark.read.parquet(path)
    n = emb.count()

    target_candidates = max(10 * n, 1_000_000)
    n_planes, n_tables = E.neardup_lsh_params(
        n, THRESHOLD, TARGET_RECALL, target_candidates, dim=DIM
    )
    expected = (n_tables * n * (n - 1) / 2
                * E._p_collide_unrelated(n_planes, DIM))
    print(f"n={n} -> n_planes={n_planes} n_tables={n_tables} "
          f"(expected unrelated candidates ~{expected:.2e}, "
          f"budget {target_candidates:.0e})")

    t0 = time.time()
    cand = E.neardup_candidates(
        emb, n_planes, DIM, n_tables, engine="arrow"
    ).persist(StorageLevel.DISK_ONLY)
    n_cand = cand.count()
    t_cand = time.time() - t0

    t0 = time.time()
    pairs = E.refine_pairs(emb, cand, THRESHOLD).persist(
        StorageLevel.DISK_ONLY
    )
    n_pairs = pairs.count()
    t_refine = time.time() - t0

    # planted ground truth: (src_id, vec_id) pairs whose EXACT cosine
    # is >= threshold (the generator plants cos uniform in [0.90, 1],
    # so ~half the planted pairs are above 0.95)
    vecs = emb.select(F.col("vec_id").alias("vid"),
                      F.col("embedding").alias("vec"))
    planted = (
        emb.filter("is_dup")
        .select(F.col("src_id").alias("a"), F.col("vec_id").alias("b"),
                F.col("embedding").alias("vb"))
        .join(vecs, F.col("a") == F.col("vid"))
        .withColumn("cos", E.dot("vec", "vb") / (E.norm("vec") * E.norm("vb")))
        .filter(F.col("cos") >= THRESHOLD)
        .select("a", "b")
        .persist(StorageLevel.DISK_ONLY)
    )
    n_truth = planted.count()
    found = planted.join(
        pairs, (F.col("a") == F.col("vec_id_a"))
        & (F.col("b") == F.col("vec_id_b")), "left_semi"
    ).count()
    recall = found / max(n_truth, 1)

    result = {
        "n_vecs": n, "dim": DIM, "threshold": THRESHOLD,
        "n_planes": n_planes, "n_tables": n_tables,
        "candidate_budget": target_candidates,
        "expected_candidates": round(expected),
        "candidates": n_cand, "cand_sec": round(t_cand, 1),
        "pairs_above_threshold": n_pairs, "refine_sec": round(t_refine, 1),
        "planted_truth_pairs": n_truth, "planted_found": found,
        "recall": round(recall, 4),
        "target_recall": TARGET_RECALL,
    }
    print(json.dumps(result))

    ts = datetime.datetime.now().strftime("%Y-%m-%d %H:%M")
    with open(REPO / "BENCH.md", "a") as f:
        f.write(
            f"\n## Embedding near-dup at operator scale — {n:,} vectors, "
            f"local[32] ({ts})\n\n"
            f"Auto-sized by `neardup_lsh_params(n={n}, cos>={THRESHOLD}, "
            f"recall>={TARGET_RECALL}, budget={target_candidates:.0e})` -> "
            f"**{n_planes} planes x {n_tables} tables**; buckets via the "
            f"one-scan Arrow BLAS bucketer (`lsh_bucket_arrow`).\n\n"
            f"| stage | wall s | count |\n| --- | --- | --- |\n"
            f"| bucket + self-join + distinct (candidates) | {t_cand:.1f} | "
            f"{n_cand:,} (expected ~{expected:.2e}, budget "
            f"{target_candidates:.0e}) |\n"
            f"| exact cosine refine (pairs >= {THRESHOLD}) | {t_refine:.1f} | "
            f"{n_pairs:,} |\n\n"
            f"Planted-pair recall: **{found:,} / {n_truth:,} = "
            f"{recall:.4f}** (target {TARGET_RECALL}; sizing predicts "
            f"1-(1-p1)^L with p1=(1-acos({THRESHOLD})/pi)^{n_planes}).\n"
        )
    spark.stop()


if __name__ == "__main__":
    main()
