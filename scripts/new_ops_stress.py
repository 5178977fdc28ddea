"""Operator-scale evidence for the round-3 additions: bigram-LM
perplexity scoring and BPE merge training at 5M docs, PQ encode +
ADC top-k at 5M vectors, and degree-oriented triangle counting on a
12M-node / 72M-edge graph. Reuses the cached synthetic corpora from
dedup_stress.py / emb_stress.py when present. Appends a BENCH.md
section.

Usage: python scripts/new_ops_stress.py [n_docs] [n_vecs] [n_nodes]
Env: STRESS_ONLY=lm_ppl_en5pct,bpe_10merges,... to run a subset
(keys = the run() names, e.g. reverse_geocode_12m, span_scrub_n10).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent
DIM = 64


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000
    n_nodes = int(sys.argv[3]) if len(sys.argv) > 3 else 12_000_000

    from pyspark.sql import functions as F

    from geospark.session import get_spark

    spark = get_spark(
        "new-ops-stress", master="local[32]", shuffle_partitions=64,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "48g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    only = {s for s in os.environ.get("STRESS_ONLY", "").split(",") if s}
    results: dict[str, dict] = {}

    def run(name: str, base_n: int, fn) -> None:
        if only and name not in only:
            return
        # drop the previous op's spooled relations BEFORE timing: the
        # py4j references pin localCheckpoint blocks until Python GC
        # runs, and a session-long pile-up thrashes executor storage
        # (measured: bpe_encode_5m 511s polluted vs 25s isolated)
        import gc

        gc.collect()
        spark._jvm.System.gc()
        t0 = time.time()
        extra = fn()
        secs = time.time() - t0
        results[name] = {
            "sec": round(secs, 1), "rows_per_sec": round(base_n / secs),
            "input_rows": base_n, **extra,
        }
        print(f"  {name}: {secs:.1f}s {extra}", flush=True)

    # --- documents corpus (shared with dedup_stress cache) ----------
    docs_path = f"/tmp/geospark_stress_docs_{n_docs}"
    if not os.path.exists(f"{docs_path}/_SUCCESS"):
        from geospark.pages import synth_documents

        synth_documents(spark, n_docs, partitions=64).write.mode(
            "overwrite"
        ).parquet(docs_path)
    docs = spark.read.parquet(docs_path)

    def _lm():
        # 5% 'en' reference slice: the model is ~|ref docs| x 39
        # mostly-distinct bigram types over the 50k vocab -- large
        # enough here that AQE picks a shuffle join for the bigram
        # model (the honest web-scale shape; a per-language model
        # that fits broadcasts instead)
        from geospark.textops import lm_score

        d = docs.withColumn(
            "lang",
            F.when(F.col("doc_id") % 20 == 0, "en").otherwise("xx"),
        )
        out = lm_score(d, "en")
        agg = out.agg(
            F.count("*").alias("n"),
            F.sum("n_bigrams").alias("bigrams"),
        ).collect()[0]
        return {"docs_scored": int(agg["n"]),
                "bigrams_scored": int(agg["bigrams"])}

    run("lm_ppl_en5pct", n_docs, _lm)

    def _bpe():
        # ONE corpus-sized word-count shuffle, then 10 vocab-sized
        # merge rounds (50k words here) with a 1-row argmax each
        from geospark.textops import bpe_train

        m = bpe_train(docs, n_merges=10).collect()
        return {"merges": len(m),
                "top_merge": f"{m[0]['lhs']}+{m[0]['rhs']}@{m[0]['pair_count']}"}

    run("bpe_10merges", n_docs, _bpe)

    # --- embeddings corpus (shared with emb_stress cache) -----------
    emb_path = f"/tmp/geospark_stress_emb_{n_vecs}_{DIM}"
    if not os.path.exists(f"{emb_path}/_SUCCESS"):
        from geospark.pages import synth_embeddings

        synth_embeddings(
            spark, n_vecs, dim=DIM, dup_frac=0.15, min_cos=0.90,
            partitions=64,
        ).write.mode("overwrite").parquet(emb_path)
    emb = spark.read.parquet(emb_path)

    def _pq():
        from geospark.embeddings import pq_topk

        top = pq_topk(emb, [3, 57, 111, 222, 404], k=10, m=4,
                      n_codes=16, dim=DIM, arrow=True)
        rows = top.collect()
        return {"rows_out": len(rows)}

    run("pq_adc_topk_5q", n_vecs, _pq)

    def _tri():
        from geospark.graph import triangle_count

        salts = [(1, 7919), (2, 104729), (3, 999983),
                 (4, 31337), (5, 6700417), (6, 179424673)]
        nodes = spark.range(n_nodes).select(F.col("id").alias("node"))
        nn = nodes.agg(F.count("*").alias("_n"))
        edges = nodes.crossJoin(F.broadcast(nn)).select(
            F.col("node").alias("src"),
            F.explode(F.array(*[
                (F.col("node") * F.lit(p) + F.lit(j)) % F.col("_n")
                for j, p in salts
            ])).alias("dst"),
        )
        out = triangle_count(edges)
        agg = out.agg(
            F.count("*").alias("nodes_in_tri"),
            (F.sum("n_tri") / 3).cast("long").alias("n_triangles"),
        ).collect()[0]
        return {"nodes_in_tri": int(agg["nodes_in_tri"]),
                "n_triangles": int(agg["n_triangles"])}

    run("triangles_6salt", n_nodes, _tri)

    def _cc():
        # graph_cc's deterministic chains-of-5 + every-37th-node
        # long-range merge graph at full node scale: the edge relation
        # is ~1.04x nodes, and every star-contraction round is a
        # full-relation shuffle — the honest iterative-cost shape
        from geospark.graph import connected_components

        nodes = spark.range(n_nodes).select(F.col("id").alias("node"))
        nn = nodes.agg(F.count("*").alias("_n"))
        base = nodes.crossJoin(F.broadcast(nn))
        chain = base.filter(
            (F.col("node") % 5 != 4) & (F.col("node") + 1 < F.col("_n"))
        ).select(F.col("node").alias("src"),
                 (F.col("node") + 1).alias("dst"))
        mrg = base.filter(F.col("node") % 37 == 0).select(
            F.col("node").alias("src"),
            ((F.col("node") * 13 + 5) % F.col("_n")).alias("dst"),
        )
        cc = connected_components(chain.unionByName(mrg), "src", "dst")
        agg = cc.groupBy("component").count().agg(
            F.count("*").alias("n_components"),
            F.max("count").alias("max_comp"),
            F.sum("count").alias("n_labeled"),
        ).collect()[0]
        return {"n_components": int(agg["n_components"]),
                "max_comp": int(agg["max_comp"]),
                "n_labeled": int(agg["n_labeled"])}

    run("graph_cc_chains", n_nodes, _cc)

    def _geocode():
        # toponym resolution at mention scale: n_nodes mentions over a
        # 450k-row ambiguous gazetteer (150k names x 3 candidates —
        # GeoNames-city order of magnitude). The gazetteer broadcasts;
        # the only mention shuffle is the partial-argmin minima.
        from geospark.geocode import gazetteer, resolve_mentions

        n_names = 150_000
        gaz = gazetteer(spark, n_names, 3)
        mentions = spark.range(n_nodes).select(
            F.col("id").alias("mention_id"),
            F.concat(F.lit("place_"),
                     (F.col("id") % n_names).cast("string")).alias("name"),
            (((F.col("id") * 7919) % 16000) / 100.0 - 80.0).alias("lat"),
            (((F.col("id") * 104729) % 36000) / 100.0 - 180.0).alias("lng"),
        )
        res = resolve_mentions(mentions, gaz)
        agg = res.agg(
            F.count("*").alias("n_resolved"),
            F.countDistinct("gaz_id").alias("n_places"),
            F.sum(F.col("dist_m")).alias("dist_sum"),
        ).collect()[0]
        return {"n_resolved": int(agg["n_resolved"]),
                "n_places": int(agg["n_places"])}

    run("geocode_12m_mentions", n_nodes, _geocode)

    def _revgeo():
        # reverse geocoding at point scale: nearest of 450k places per
        # point via cell-ring kNN k=1 (z8 start — ~7 places/cell).
        from geospark.geocode import gazetteer, reverse_geocode

        gaz = gazetteer(spark, 150_000, 3)
        pts = spark.range(n_nodes).select(
            F.col("id").alias("point_id"),
            (((F.col("id") * 7919) % 16000) / 100.0 - 80.0).alias("lat"),
            (((F.col("id") * 104729) % 36000) / 100.0 - 180.0).alias("lng"),
        )
        res = reverse_geocode(pts, gaz, start_zoom=8)
        agg = res.agg(
            F.count("*").alias("n"),
            F.countDistinct("gaz_id").alias("n_places"),
            F.sum("dist_floor_m").alias("dist_sum"),
        ).collect()[0]
        return {"n_resolved": int(agg["n"]),
                "n_places_hit": int(agg["n_places"])}

    run("reverse_geocode_12m", n_nodes, _revgeo)

    def _scrub():
        # exact-substring scrubbing over the dup-structured corpus
        # (15% exact/near duplicates): gram window + covered-position
        # anti-join + per-doc reconstruction, xxhash64 fast path.
        from geospark.textops import scrub_dup_spans

        out = scrub_dup_spans(docs, n=10, hash_fn="xxhash64")
        agg = out.agg(
            F.count("*").alias("n"),
            F.sum("n_removed").alias("tokens_removed"),
            F.sum((F.col("n_removed") > 0).cast("long")).alias("docs_cut"),
        ).collect()[0]
        return {"docs_out": int(agg["n"]),
                "tokens_removed": int(agg["tokens_removed"]),
                "docs_cut": int(agg["docs_cut"])}

    run("span_scrub_n10", n_docs, _scrub)

    def _corridor():
        # corridor join at probe scale: 12M probes against a 3M-link
        # network (one ~400 m link per 4th id, co-located with its
        # probe), 500 m corridor — the per-(point, line) variant of
        # the map-match plan (multi-zoom cover + S8/S1 refine +
        # partial min-struct per pair).
        from geospark.joins import corridor_join

        pts = spark.range(n_nodes).select(
            F.col("id").alias("point_id"),
            ((((F.col("id") * 7919) % 16000) / 100.0 - 80.0)
             + 0.0003).alias("lat"),
            ((((F.col("id") * 104729) % 36000) / 100.0 - 180.0)
             - 0.0002).alias("lng"),
        )
        base = spark.range(n_nodes).filter(F.col("id") % 4 == 0)
        segs = base.select(
            (F.col("id") / 4).cast("long").alias("line_id"),
            F.lit(0).alias("seg_idx"),
            (((F.col("id") * 7919) % 16000) / 100.0 - 80.0).alias("f_lat"),
            (((F.col("id") * 104729) % 36000) / 100.0 - 180.0).alias("f_lng"),
            ((((F.col("id") * 7919) % 16000) / 100.0 - 80.0)
             + 0.003).alias("t_lat"),
            ((((F.col("id") * 104729) % 36000) / 100.0 - 180.0)
             + 0.002).alias("t_lng"),
        )
        out_df = corridor_join(pts, segs, 500.0)
        agg = out_df.agg(
            F.count("*").alias("n_pairs"),
            F.countDistinct("point_id").alias("n_probes_hit"),
        ).collect()[0]
        return {"n_pairs": int(agg["n_pairs"]),
                "n_probes_hit": int(agg["n_probes_hit"])}

    run("corridor_12m", n_nodes, _corridor)

    def _ivfpq():
        # IVF-PQ composed ANN at corpus scale: 16-centroid trained
        # coarse quantizer (2 Lloyd iters = 2 corpus scans +
        # model-sized update shuffles), residual-PQ encode map-side,
        # 5 queries x 4-probe ADC over the m-byte code relation.
        from geospark.embeddings import ivfpq_topk

        top = ivfpq_topk(emb, [3, 57, 111, 222, 404], k=10,
                         n_centroids=16, iters=2, n_probe=4,
                         m=4, n_codes=16, arrow=True)
        rows = top.collect()
        return {"rows_out": len(rows)}

    run("ivfpq_5m", n_vecs, _ivfpq)

    def _idw():
        # IDW interpolation at point scale: 12M samples onto the z8
        # tile-center grid of the demo box (~1.5k targets broadcast),
        # 100 km inverse-square radius, integer-exact weights.
        from geospark.functions import numpy_kernels as NK
        from geospark.raster import idw_interpolate

        lat_min, lng_min, lat_max, lng_max = 10.0, -20.0, 60.0, 40.0
        z, ts = 8, 4096
        px1, py1 = NK.latlng_to_pixel(lat_max, lng_min, z, ts)
        px2, py2 = NK.latlng_to_pixel(lat_min, lng_max, z, ts)
        res = NK.resolution(z, ts)
        msz = NK.map_size(z, ts)
        targets = []
        for ty in range(int(py1) // ts, int(py2) // ts + 1):
            for tx in range(int(px1) // ts, int(px2) // ts + 1):
                mx = (tx + 0.5) * ts * res - NK.MERC_ORIGIN_SHIFT
                my = (msz - (ty + 0.5) * ts) * res - NK.MERC_ORIGIN_SHIFT
                la, ln = NK.merc_to_latlng(mx, my)
                targets.append(((tx << 32) | ty, float(la), float(ln)))
        centers = spark.createDataFrame(
            targets, "query_id long, q_lat double, q_lng double")
        pts = spark.range(n_nodes).select(
            F.col("id").alias("point_id"),
            (((F.col("id") * 7919) % 16000) / 100.0 - 80.0).alias("lat"),
            (((F.col("id") * 104729) % 36000) / 100.0 - 180.0).alias("lng"),
            ((F.col("id") % 49000) / 100.0).alias("value"),
        )
        out_df = idw_interpolate(pts, centers, 100_000.0)
        agg = out_df.agg(
            F.count("*").alias("n_tiles"),
            F.sum("n_samples").alias("n_pairs"),
        ).collect()[0]
        return {"n_tiles": int(agg["n_tiles"]),
                "n_pairs": int(agg["n_pairs"])}

    run("idw_12m", n_nodes, _idw)

    def _hmm():
        # Viterbi map matching at trajectory scale: 12M observations
        # in 120k 100-point trajectories against the 3M-link network
        # of the corridor stress; k=3 candidates, one Arrow kernel per
        # trajectory.
        from geospark.hmm import viterbi_map_match

        pts = spark.range(n_nodes).select(
            (F.col("id") / 100).cast("long").alias("user_id"),
            (F.col("id") % 100).alias("seq"),
            F.col("id").alias("point_id"),
            ((((F.col("id") * 7919) % 16000) / 100.0 - 80.0)
             + 0.0003).alias("lat"),
            ((((F.col("id") * 104729) % 36000) / 100.0 - 180.0)
             - 0.0002).alias("lng"),
        )
        base = spark.range(n_nodes).filter(F.col("id") % 4 == 0)
        segs = base.select(
            (F.col("id") / 4).cast("long").alias("line_id"),
            F.lit(0).alias("seg_idx"),
            (((F.col("id") * 7919) % 16000) / 100.0 - 80.0).alias("f_lat"),
            (((F.col("id") * 104729) % 36000) / 100.0 - 180.0).alias("f_lng"),
            ((((F.col("id") * 7919) % 16000) / 100.0 - 80.0)
             + 0.003).alias("t_lat"),
            ((((F.col("id") * 104729) % 36000) / 100.0 - 180.0)
             + 0.002).alias("t_lng"),
        )
        out_df = viterbi_map_match(pts, segs, 500.0, k=3,
                                   trans_weight=100)
        agg = out_df.agg(
            F.count("*").alias("n_matched"),
            F.countDistinct("user_id").alias("n_traj"),
        ).collect()[0]
        return {"n_matched": int(agg["n_matched"]),
                "n_traj": int(agg["n_traj"])}

    run("hmm_12m", n_nodes, _hmm)

    def _bpe_encode():
        # tokenizer APPLY at corpus scale: 10 merges learned on the
        # 1% doc_id sample, replayed over the full 5M-doc corpus —
        # one word-count shuffle + literal-rule codegen folds on the
        # vocab relation.
        from geospark.textops import bpe_encode, bpe_train

        sample = docs.filter(F.col("doc_id") % 100 == 0)
        merges = [(r["lhs"], r["rhs"]) for r in
                  bpe_train(sample, n_merges=10).orderBy("rank").collect()]
        out_df = bpe_encode(docs, merges)
        agg = out_df.agg(
            F.count("*").alias("n_tokens"),
            F.sum("count").alias("occurrences"),
        ).collect()[0]
        return {"n_tokens": int(agg["n_tokens"]),
                "occurrences": int(agg["occurrences"])}

    run("bpe_encode_5m", n_docs, _bpe_encode)

    def _dsir():
        # DSIR importance resampling at corpus scale: 5% 'en' target
        # slice, B=4096 hashed-token model; ONE token pass feeds the
        # bucket model (B rows/task after map-side combine), the B-row
        # delta broadcasts into the per-doc partial-agg scoring pass,
        # top-k is a heap merge.
        from geospark.textops import importance_resample

        d = docs.withColumn(
            "lang",
            F.when(F.col("doc_id") % 20 == 0, "en").otherwise("xx"),
        )
        rows = importance_resample(d, k=100).collect()
        return {"rows_out": len(rows),
                "top_weight_milli": int(rows[0]["weight_milli"])}

    run("dsir_5m", n_docs, _dsir)

    def _kn():
        # interpolated Kneser-Ney scoring at corpus scale, same 5%
        # 'en' reference slice as lm_ppl_en5pct: model relations stay
        # vocab-sized (bigram types + per-context totals + distinct-
        # continuation counts), scoring is three hash joins + one
        # per-doc rollup.
        from geospark.textops import lm_score_kn

        d = docs.withColumn(
            "lang",
            F.when(F.col("doc_id") % 20 == 0, "en").otherwise("xx"),
        )
        agg = lm_score_kn(d, "en").agg(
            F.count("*").alias("n"),
            F.sum("n_bigrams").alias("bigrams"),
        ).collect()[0]
        return {"docs_scored": int(agg["n"]),
                "bigrams_scored": int(agg["bigrams"])}

    run("kn_ppl_en5pct", n_docs, _kn)

    def _semdedup():
        # SemDeDup at 1M vectors with k = n/500 clusters — the
        # paper's scaling knob: pair cost is sum(|cluster|^2), so k
        # grows with n to hold the per-cluster quadratic bounded; the
        # synthetic corpus plants 15% near-duplicates at cos >= 0.90,
        # found here at tau = sqrt(9801/10000) = 0.99^... (0.35 grid
        # default would merge the whole corpus at this density, so
        # the stress uses the paper-typical high threshold).
        from geospark.embeddings import semdedup

        sub = emb.filter(F.col("vec_id") < 1_000_000)
        out = semdedup(sub, n_centroids=2000, iters=2,
                       tau_num=9801, tau_den=10000, arrow=True)
        agg = out.agg(
            F.count("*").alias("n"), F.sum("is_dup").alias("dups"),
        ).collect()[0]
        return {"rows": int(agg["n"]), "n_dups": int(agg["dups"])}

    run("semdedup_1m", 1_000_000, _semdedup)

    out = {"ops": results, "cpus": 32,
           "ts": time.strftime("%Y-%m-%d %H:%M:%S")}
    print(json.dumps(out))

    lines = [
        "",
        f"## New-ops scale run {out['ts']} — "
        f"{n_docs:,} docs / {n_vecs:,} vecs / {n_nodes:,} nodes, local[32]",
        "",
        "| operator | wall s | input rows/sec | outputs |",
        "| --- | --- | --- | --- |",
    ]
    for name, r in results.items():
        extra = {k: v for k, v in r.items()
                 if k not in ("sec", "rows_per_sec", "input_rows")}
        lines.append(
            f"| {name} | {r['sec']} | {r['rows_per_sec']} | {extra} |")
    lines.append("")
    with open(REPO / "BENCH.md", "a") as f:
        f.write("\n".join(lines))
    spark.stop()


if __name__ == "__main__":
    main()
