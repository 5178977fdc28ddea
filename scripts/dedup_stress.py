"""Operator-scale evidence for the DEDUP family: run exact dedup,
minhash-LSH, simhash and fingerprint on a synthetic documents table
100-1000x the sf0.1 driver input and append wall times + candidate
counts to BENCH.md. The synthetic corpus (pages.synth_documents) has
KNOWN duplicate structure — ~15% of docs are 0-3-token mutations of a
5% canonical pool — so the measured pair counts are interpretable
(exact dups, near-dups at token distance 1-3, negligible random
collisions).

Usage: python scripts/dedup_stress.py [n_docs]
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

    from pyspark.sql import functions as F

    from geospark.session import get_spark

    spark = get_spark(
        "dedup-stress", master="local[32]", shuffle_partitions=64,
        extra_conf={
            "spark.ui.enabled": "false",
            # the spooled shingle relation is ~40x the corpus rows;
            # cache blocks + Arrow batches need real heap at 5M docs
            "spark.driver.memory": "48g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs_path = f"/tmp/geospark_stress_docs_{n_docs}"
    if not os.path.exists(f"{docs_path}/_SUCCESS"):
        from geospark.pages import synth_documents

        synth_documents(spark, n_docs, partitions=64).write.mode(
            "overwrite"
        ).parquet(docs_path)
    docs = spark.read.parquet(docs_path)
    n = docs.count()
    results: dict[str, dict] = {}

    only = {s for s in os.environ.get("STRESS_ONLY", "").split(",") if s}

    def run(name: str, fn) -> None:
        if only and name not in only:
            return
        t0 = time.time()
        extra = fn()
        secs = time.time() - t0
        results[name] = {
            "sec": round(secs, 1), "docs_per_sec": round(n / secs), **extra,
        }
        print(f"  {name}: {secs:.1f}s {extra}", flush=True)

    import geospark.textops as T

    run("exact_dedup", lambda: {
        "rows_out": T.exact_dedup(docs).count(),
    })

    def _incremental():
        # prior corpus = first half by doc_id; new crawl = everything
        # (a full re-crawl) — the anti-join must drop every text whose
        # bytes exist in the prior half, including the mutation pool's
        # exact dups that straddle the boundary
        seen = docs.filter(F.col("doc_id") % 2 == 0).select(
            F.md5("text").alias("content_md5"))
        kept = T.incremental_dedup(docs, seen).count()
        return {"rows_out": kept}

    run("incremental_dedup_halfseen", _incremental)

    run("minhash_lsh_t05", lambda: {
        "pairs": T.minhash_neardup_pairs(docs, threshold=0.5).count(),
    })
    # candidate volume is the scale driver — measured as its own row
    # (it recomputes shingles+signatures, so folding it into the
    # operator row would double-count)
    run("minhash_candidates", lambda: {
        "candidates": T.lsh_candidates(T.minhash_signatures(docs)).count(),
    })

    def _simhash():
        # radius 3 -> mih_plan picks its own banding; recall-complete
        # at any corpus size.
        pairs = T.simhash_pairs(docs, max_hamming=3, n_docs=n)
        return {"pairs": pairs.count()}

    run("simhash_h3", _simhash)

    def _simhash_r8():
        # radius 8 at corpus scale — the multi-flip multi-index path
        # (VERDICT r03 task #2): mih_plan(8) -> 3x20-bit bands, 1 flip
        # per side (2^20 buckets), instead of 9 contiguous ~6.7-bit
        # bands whose buckets collide ~n^2/100 at n=5M.
        plan = T.mih_plan(8, n_docs=n)
        pairs = T.simhash_pairs(docs, max_hamming=8, n_docs=n)
        return {"pairs": pairs.count(), "plan": plan}

    run("simhash_r8_mih", _simhash_r8)

    def _simhash_r8_candidates():
        # candidate volume for BOTH radius-8 plans from bucket
        # statistics (aggregate probe rows to per-bucket counts, then
        # sum cntA*cntB — the ordered matched-row count the join would
        # stream, ~2x the a<b candidate count). This is the
        # sub-quadratic evidence: mih candidates should be ~100x below
        # the contiguous-9-band plan at 5M docs.
        from geospark.spool import spool

        sig = spool(T.simhash(docs), "stress_simhash_sig")
        out = {}
        for label, (m, t1, t2) in (
            ("mih", T.mih_plan(8, n_docs=n)),
            ("contiguous9", (9, 0, 0)),
        ):
            bands = T.simhash_bands(m)
            ca = (T._simhash_probe_side(sig, bands, t1)
                  .groupBy("band", "val")
                  .agg(F.count("*").alias("ca")))
            if t2 == t1:
                joined = ca.select(
                    F.sum(F.col("ca") * F.col("ca")).alias("rows"))
            else:
                cb = (T._simhash_probe_side(sig, bands, t2)
                      .groupBy("band", "val")
                      .agg(F.count("*").alias("cb")))
                joined = ca.join(cb, ["band", "val"]).select(
                    F.sum(F.col("ca") * F.col("cb")).alias("rows"))
            out[f"{label}_matched_rows"] = int(joined.collect()[0]["rows"])
            out[f"{label}_plan"] = (m, t1, t2)
        return out

    run("simhash_r8_candidates", _simhash_r8_candidates)

    # keep-one dedup closure: time the connected-components contraction
    # ALONE over a pre-materialized pair relation (pair generation is
    # already measured by the minhash rows above)
    from geospark.graph import neardup_dedup
    from geospark.spool import spool as _spool

    if not only or "cc_keep_one_dedup" in only:
        pairs = _spool(
            T.minhash_neardup_pairs(docs, threshold=0.5)
            .select("doc_id_a", "doc_id_b"),
            "stress_pairs",
        )
        n_pairs = pairs.count()
    else:
        pairs = n_pairs = None  # STRESS_ONLY skipped the expensive spool

    def _cc():
        dd = neardup_dedup(docs, pairs)
        agg = dd.agg(
            F.count("*").alias("docs"),
            F.sum("is_dup").alias("dropped"),
        ).collect()[0]
        return {"pairs_in": n_pairs, "docs_dropped": int(agg["dropped"]),
                "docs_kept": int(agg["docs"] - agg["dropped"])}

    run("cc_keep_one_dedup", _cc)

    run("fingerprint", lambda: {
        "rows_out": T.fingerprint(docs).count(),
    })

    run("token_stats", lambda: {
        "rows_out": T.token_stats(docs).count(),
    })

    # concat-and-chunk packing: two-level prefix scan (256 shards) +
    # span explode over the full corpus token stream
    run("pack_sequences_L2048", lambda: {
        "rows_out": T.pack_sequences(docs, seq_len=2048,
                                     n_shards=256).count(),
    })

    def _bm25():
        # 3 probes x 3 terms over the 50k-token vocabulary: expected
        # df per term ~ n*40/50000, so the candidate relation (docs
        # sharing >= 1 probe term) is ~9*df rows — the vocabulary
        # filter before the tf shuffle is what this row evidences
        probes = [
            (1, ["t00042", "t01337", "t02718"]),
            (2, ["t10007", "t20011", "t30013"]),
            (3, ["t40009", "t45007", "t49999"]),
        ]
        top = T.bm25_topk(docs, probes, k=10)
        return {"rows_out": top.count()}

    run("bm25_topk_3probes", _bm25)

    def _dup_spans():
        # the known dup structure (~15% mutated copies) makes the
        # duplicated-window population interpretable at scale
        ds = T.dup_span_stats(docs, n=10)
        agg = ds.agg(
            F.sum((F.col("n_dup_positions") > 0).cast("int"))
            .alias("docs_with_dups"),
            F.sum("n_dup_positions").alias("dup_windows"),
        ).collect()[0]
        return {"docs_with_dups": int(agg["docs_with_dups"]),
                "dup_windows": int(agg["dup_windows"])}

    run("dup_spans_n10", _dup_spans)

    # --- mergeable sketches at corpus scale -------------------------
    import __spark_entry__ as E
    from geospark import sketch as SK

    # wider than the driver query's 1024: additive noise is ~N/w, and
    # the bigram stream N here is ~39x docs
    CMS_W = 1 << 16

    def _cms_build():
        # the whole point at scale: the bigram stream (~39x docs)
        # explodes x4 rows, but map-side partial agg caps every task's
        # shuffle output at d*w cells — the sketch row count IS the
        # shuffle volume
        sk = SK.cms_table(E._bigram_occurrences(docs), [], "bigram",
                          d=4, w=CMS_W)
        return {"sketch_cells": sk.count()}

    run("cms_build_bigrams", _cms_build)

    def _cms_lookup():
        # the scale-shaped use: a SMALL probe set against a sketch of
        # a huge stream (this corpus is uniform by construction, so
        # there are no true heavy hitters — the honest metric is the
        # point-query overestimate, expected ~N/w per probe)
        bg = _spool(E._bigram_occurrences(docs), "stress_cms_bg")
        sk = SK.cms_table(bg, [], "bigram", d=4, w=CMS_W)
        probe_docs = docs.filter(F.col("doc_id") < 200)
        probes = E._bigram_occurrences(probe_docs).distinct()
        est = SK.cms_lookup(sk, probes, [], "bigram", d=4, w=CMS_W)
        exact = (bg.join(F.broadcast(probes), "bigram")
                 .groupBy("bigram").agg(F.count("*").alias("c")))
        agg = est.join(exact, "bigram").agg(
            F.count("*").alias("n_probes"),
            F.max(F.col("est_cnt") - F.col("c")).alias("max_over"),
            F.round(F.avg(F.col("est_cnt") - F.col("c")), 1)
            .alias("mean_over"),
            F.sum(F.when(F.col("est_cnt") < F.col("c"), 1).otherwise(0))
            .alias("underestimates"),
        ).collect()[0]
        return {"n_probes": int(agg["n_probes"]),
                "mean_over": float(agg["mean_over"]),
                "max_over": int(agg["max_over"]),
                "underestimates": int(agg["underestimates"])}

    run("cms_point_lookup", _cms_lookup)

    BLOOM_K, BLOOM_M = 7, 1 << 25  # sized for ~n/2 distinct hashes

    def _bloom():
        prior = docs.filter(F.col("doc_id") % 2 == 0).select(
            F.md5("text").alias("h"))
        bits = _spool(
            SK.bloom_bits(prior, "h", k=BLOOM_K, mbits=BLOOM_M),
            "stress_bloom_bits",
        )
        nb = bits.count()
        probes = docs.select(F.md5("text").alias("h"))
        maybe = SK.bloom_probe(bits, probes, "h", k=BLOOM_K,
                               mbits=BLOOM_M)
        seen = prior.distinct().withColumn("_p", F.lit(1))
        agg = maybe.join(seen, "h", "left").agg(
            F.count("*").alias("probed"),
            F.sum("bloom_maybe").alias("maybe"),
            F.sum(F.when(F.col("_p").isNull()
                         & (F.col("bloom_maybe") == 1), 1)
                  .otherwise(0)).alias("false_pos"),
            F.sum(F.when(F.col("_p").isNull(), 1).otherwise(0))
            .alias("absent"),
            F.sum(F.when(F.col("_p").isNotNull()
                         & (F.col("bloom_maybe") == 0), 1)
                  .otherwise(0)).alias("false_neg"),
        ).collect()[0]
        return {
            "bits_lit": nb,
            "probed_distinct": int(agg["probed"]),
            "false_neg": int(agg["false_neg"]),
            "fpr": round(agg["false_pos"] / max(agg["absent"], 1), 6),
        }

    run("bloom_crawl_filter", _bloom)

    out = {"n_docs": n, "ops": results, "cpus": 32,
           "ts": time.strftime("%Y-%m-%d %H:%M:%S")}
    print(json.dumps(out))

    lines = [
        "",
        f"## Dedup-family scale run {out['ts']} — {n:,} docs, local[32]",
        "",
        "| operator | wall s | docs/sec | outputs |",
        "| --- | --- | --- | --- |",
    ]
    for name, r in results.items():
        extra = {k: v for k, v in r.items() if k not in ("sec", "docs_per_sec")}
        lines.append(f"| {name} | {r['sec']} | {r['docs_per_sec']} | {extra} |")
    lines.append("")
    with open(REPO / "BENCH.md", "a") as f:
        f.write("\n".join(lines))
    spark.stop()


if __name__ == "__main__":
    main()
