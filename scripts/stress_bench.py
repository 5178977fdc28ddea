"""Operator-scale evidence: run the core join/cluster family on a
points table 100x the sf0.1 driver input (extracted from the synthetic
pages cache) and append wall times to BENCH.md. The sf tables verify
CORRECTNESS; this shows the same plans at data volumes where a wrong
shuffle would be minutes, not noise.

Usage: python scripts/stress_bench.py [n_pages]
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
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000

    from pyspark.sql import functions as F

    from geospark.session import get_spark

    spark = get_spark(
        "stress-bench", master="local[32]", shuffle_partitions=64,
        extra_conf={
            "spark.ui.enabled": "false",
            # 60M-point runs: edge spools + shuffle buffers need real
            # heap (the 8g default OOMed cluster_10m at 40M pages)
            "spark.driver.memory": "48g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    pages_path = f"/tmp/geospark_bench_pages_{n_pages}"
    pts_path = f"/tmp/geospark_stress_points_{n_pages}"
    if not os.path.exists(f"{pages_path}/_SUCCESS"):
        from geospark.pages import synth_pages

        synth_pages(spark, n_pages).write.mode("overwrite").parquet(pages_path)
    if not os.path.exists(f"{pts_path}/_SUCCESS"):
        from geospark.extract import extract_points

        pts = extract_points(spark.read.parquet(pages_path)).withColumn(
            "point_uid", F.monotonically_increasing_id()
        )
        pts.write.mode("overwrite").parquet(pts_path)

    points = spark.read.parquet(pts_path).select(
        F.col("point_uid").alias("point_id"), "lat", "lng"
    )
    n_points = points.count()
    results: dict[str, dict] = {}

    only = {s for s in os.environ.get("STRESS_ONLY", "").split(",") if s}

    def run(name: str, fn) -> None:
        if only and name not in only:
            return
        t0 = time.time()
        rows = fn()
        secs = time.time() - t0
        results[name] = {
            "sec": round(secs, 1), "rows_out": rows,
            "pts_per_sec": round(n_points / secs),
        }
        print(f"  {name}: {secs:.1f}s rows={rows}")

    # 50k query centers against the full point table (DataFrame form)
    centers = points.filter(F.col("point_id") % 997 == 0).select(
        F.col("point_id").alias("query_id"),
        F.col("lat").alias("q_lat"), F.col("lng").alias("q_lng"),
    ).limit(50_000)
    from geospark.joins import knn_join_df, radius_join_df

    run("radius_join_df_50k_centers_2km", lambda: radius_join_df(
        points, centers, max_m=2000.0).count())

    knn_centers = centers.limit(2_000)
    run("knn_join_df_2k_centers_k10", lambda: knn_join_df(
        points, knn_centers, k=10, id_col="point_id").count())

    from geospark import geodata as G
    from geospark.joins import pip_join

    run("pip_join_demo_layer", lambda: pip_join(points, G.demo_layer()).count())

    from geospark.cells import with_tile

    run("tile_assign_z10_agg", lambda: with_tile(points, 10)
        .groupBy("tile_x", "tile_y").count().count())

    from geospark.functions import s2cell as S2

    def _s2_encode_agg():
        # Arrow-batched leaf encode over the full table + JVM re-level
        # + count per level-8 cell — the north-star "encode to S2 cells
        # in batched pandas UDFs" leg at operator scale
        df = points.withColumn("leaf", S2.s2_cell_udf(30)("lat", "lng"))
        return (df.withColumn("cell", S2.s2_parent_col("leaf", 8))
                .groupBy("cell").count().count())

    run("s2_encode_leaf_agg_l8", _s2_encode_agg)

    def _s2_cell_join():
        # 50k single-level query cells: containment at a FIXED level is
        # equality of the level-12 ancestor, so the scalable plan is a
        # broadcast EQUI-join on the re-leveled id (the BETWEEN range
        # join — the driver query — is the mixed-level form; a 50k-
        # interval nested loop would be the wrong plan at this scale)
        c = centers.limit(50_000).toPandas()
        cells = S2.s2_cell_np(c["q_lat"].to_numpy(), c["q_lng"].to_numpy(), 12)
        cdf = spark.createDataFrame(
            list(zip(c["query_id"].tolist(), S2.as_int64(cells).tolist())),
            "query_id long, cell12 long",
        ).dropDuplicates(["cell12"])
        df = points.withColumn("leaf", S2.s2_cell_udf(30)("lat", "lng"))
        return (df.withColumn("cell12", S2.s2_parent_col("leaf", 12))
                .join(F.broadcast(cdf), "cell12")
                .groupBy("query_id").count().count())

    run("s2_cell_join_50k_cells_l12", _s2_cell_join)

    def _s2_radius():
        # mixed-level cap covers for 1k centers -> ancestor-at-level
        # broadcast EQUI-join (one (level, ancestor) key per distinct
        # cover level) -> exact haversine refine. The interval BETWEEN
        # form this replaced was a BroadcastNestedLoopJoin — at 1k
        # centers x ~40 intervals it evaluated 40k predicates per point
        c = centers.limit(1_000).toPandas()
        cs = list(zip(c["query_id"].tolist(), c["q_lat"].tolist(),
                      c["q_lng"].tolist()))
        df = points.withColumn("leaf", S2.s2_cell_udf(30)("lat", "lng"))
        return S2.s2_radius_join(df, cs, max_m=2000.0).count()

    run("s2_radius_join_1k_centers_2km", _s2_radius)

    from geospark.cluster import cluster_nearby

    def _cluster():
        # one aggregation pass validates output INTEGRITY at scale —
        # every point labeled exactly once (duplicate point_id rows
        # were the visible symptom of the zoom>16 region bug) — and
        # returns the cluster count
        r = cluster_nearby(points, 10.0).agg(
            F.count("*").alias("rows"),
            F.count_distinct("point_id").alias("pids"),
            F.count_distinct("cluster_id").alias("clusters"),
        ).collect()[0]
        assert r["rows"] == n_points, (r["rows"], n_points)
        assert r["pids"] == n_points, (r["pids"], n_points)
        return r["clusters"]

    run("cluster_10m", _cluster)

    # vector->raster at scale: 12M segments (points spatially sorted
    # within hash buckets -> realistic short legs + inter-city jumps)
    # rasterized at z12; output-linear explode is the claim under test
    def _supercover():
        from pyspark.sql import Window

        from geospark.cells import segment_tile_cover, with_cell_at_zoom

        w = Window.partitionBy(
            F.pmod(F.hash("point_id"), F.lit(1024))
        ).orderBy("cell", "point_id")
        seg = (
            with_cell_at_zoom(points, 12)
            .withColumn("lat0", F.lag("lat").over(w))
            .withColumn("lng0", F.lag("lng").over(w))
            .filter(F.col("lat0").isNotNull())
            .select("lat0", "lng0", F.col("lat").alias("lat1"),
                    F.col("lng").alias("lng1"))
        )
        return (
            segment_tile_cover(seg, 12)
            .groupBy("tile_x", "tile_y").count().count()
        )

    run("segment_supercover_z12", _supercover)

    # map matching at scale: the full point table becomes the road
    # network (one deterministic <=~450 m link per point, the
    # events_segments recipe) and 1-in-10 points, nudged ~40 m off
    # their link, are the GPS probes. Claim under test: cover volume
    # stays ~5-9 int64 keys per segment and the refine touches only
    # cover-bounded candidates — not probes x segments.
    def _map_match():
        from geospark.joins import match_points_to_segments

        dlat = ((F.col("point_id") * 131) % 800) / 100000.0 - 0.004
        dlng = ((F.col("point_id") * 137) % 800) / 100000.0 - 0.004
        seg = points.select(
            (F.col("point_id") % 1_000_003).alias("line_id"),
            # point_uid is monotonically_increasing (partition<<33 —
            # exceeds int), and ANSI cast would throw on overflow
            F.pmod(F.col("point_id"), F.lit(1 << 31)).cast("int")
            .alias("seg_idx"),
            F.col("lat").alias("f_lat"), F.col("lng").alias("f_lng"),
            (F.col("lat") + dlat).alias("t_lat"),
            F.greatest(F.col("lng") + dlng, F.lit(-180.0)).alias("t_lng"),
        )
        probes = points.filter(F.col("point_id") % 10 == 0).select(
            F.col("point_id"),
            (F.col("lat") + F.lit(0.0003)).alias("lat"),
            (F.col("lng") - F.lit(0.0002)).alias("lng"),
        )
        return match_points_to_segments(probes, seg, 250.0).count()

    run("map_match_probes_vs_network", _map_match)

    # raster->vector at scale: rectangle-decompose the z12 supercover
    # of the 12M-segment trajectory set; claim under test: the two
    # gaps-and-islands windows partition at tile-row granularity (no
    # global sort) and conservation holds (sum n_tiles == input tiles)
    def _vectorize():
        from pyspark.sql import Window

        from geospark.cells import segment_tile_cover, with_cell_at_zoom
        from geospark.raster import vectorize_tiles

        w = Window.partitionBy(
            F.pmod(F.hash("point_id"), F.lit(1024))
        ).orderBy("cell", "point_id")
        seg = (
            with_cell_at_zoom(points, 12)
            .withColumn("lat0", F.lag("lat").over(w))
            .withColumn("lng0", F.lag("lng").over(w))
            .filter(F.col("lat0").isNotNull())
            .select("lat0", "lng0", F.col("lat").alias("lat1"),
                    F.col("lng").alias("lng1"))
        )
        tiles = (
            segment_tile_cover(seg, 12)
            .select(F.lit(1).alias("area_id"), "tile_x", "tile_y")
            .distinct()
        )
        from pyspark import StorageLevel
        tiles = tiles.persist(StorageLevel.MEMORY_AND_DISK)
        n_tiles = tiles.count()
        rects = vectorize_tiles(tiles)
        agg = rects.agg(F.count("*").alias("rects"),
                        F.sum("n_tiles").alias("tiles")).collect()[0]
        tiles.unpersist()
        assert agg["tiles"] == n_tiles, (agg["tiles"], n_tiles)
        return agg["rects"]

    run("tile_vectorize_supercover_z12", _vectorize)

    # polygon rasterization at scale: 100k diamond polygons (~2x2
    # tiles each at z12) + one continental pentagon at z11 — cost must
    # track perimeter+area, not bbox
    def _poly_raster():
        from geospark.cells import with_cell_at_zoom
        from geospark.raster import polygon_tile_cover

        cells = (
            with_cell_at_zoom(points, 8).groupBy("cell")
            .agg(F.avg("lat").alias("clat"), F.avg("lng").alias("clng"))
            .limit(100_000)
        )
        d = 0.2
        ring = F.array(
            F.struct((F.col("clat") + d).alias("lat"),
                     F.col("clng").alias("lng")),
            F.struct(F.col("clat").alias("lat"),
                     (F.col("clng") + d).alias("lng")),
            F.struct((F.col("clat") - d).alias("lat"),
                     F.col("clng").alias("lng")),
            F.struct(F.col("clat").alias("lat"),
                     (F.col("clng") - d).alias("lng")),
        )
        rings = cells.select(F.col("cell").alias("area_id"),
                             ring.alias("ring"))
        small = polygon_tile_cover(rings, 12).count()
        continent = spark.createDataFrame(
            [(1, [(20.1, -20.2), (60.3, -15.4), (65.5, 25.6),
                  (45.7, 30.8), (22.9, 15.1)])],
            "area_id long, ring array<struct<lat: double, lng: double>>",
        )
        big = polygon_tile_cover(continent, 11).count()
        return small + big

    run("polygon_raster_100k_plus_continent", _poly_raster)

    # polygon x polygon overlay at scale: 100k city-skewed diamonds
    # against 20k coarser diamonds — hot-city tiles stress the
    # candidate cover join; refine volume = candidates x 4 edges
    def _poly_overlap():
        from geospark.cells import with_cell_at_zoom
        from geospark.joins import polygon_overlap_join

        def diamonds(zoom, d, limit):
            cells = (
                with_cell_at_zoom(points, zoom).groupBy("cell")
                .agg(F.avg("lat").alias("clat"),
                     F.avg("lng").alias("clng"))
                .limit(limit)
            )
            ring = F.array(
                F.struct((F.col("clat") + d).alias("lat"),
                         F.col("clng").alias("lng")),
                F.struct(F.col("clat").alias("lat"),
                         (F.col("clng") + d).alias("lng")),
                F.struct((F.col("clat") - d).alias("lat"),
                         F.col("clng").alias("lng")),
                F.struct(F.col("clat").alias("lat"),
                         (F.col("clng") - d).alias("lng")),
            )
            return cells.select(F.col("cell").alias("area_id"),
                                ring.alias("ring"))

        a = diamonds(8, 0.2, 100_000)
        b = diamonds(6, 1.0, 20_000)
        return polygon_overlap_join(a, b, zoom=10).count()

    run("polygon_overlap_100k_x_20k", _poly_overlap)

    # DBSCAN labeling at operator scale: same cover-join shape as
    # cluster_10m plus the count/semi-join label stages; integrity
    # assert = every point labeled exactly once
    def _density():
        from geospark.density import density_classify

        r = density_classify(points, 10.0, 3).groupBy("label").agg(
            F.count("*").alias("n")).collect()
        d = {row["label"]: row["n"] for row in r}
        assert sum(d.values()) == n_points, d
        return d.get("core", 0)

    run("density_classify_eps10m_minpts3", _density)

    # geohash encode at operator scale: 6-char flat-interleave encode
    # of the full table + 2-char prefix rollup — claim under test: the
    # encode is one narrow codegen map (no Python, no shuffle before
    # the rollup agg)
    def _geohash():
        from geospark.functions import geohash as GH

        d = GH.with_geohash(points, "lat", "lng", 6, out="gh")
        return (d.groupBy(F.substring("gh", 1, 2).alias("p"))
                .count().count())

    run("geohash_encode6_rollup2", _geohash)

    # HLL distinct-count at operator scale: ~2M distinct synthetic
    # users over 3-char geohash cells, p=12 (4096 registers, ~1.6%
    # std err). Claim under test: the sketch relation caps the second
    # shuffle at cells x 4096 rows no matter the event volume, and the
    # estimate tracks the exact NDV (which rides along)
    def _hll():
        from geospark import sketch as SK
        from geospark.functions import geohash as GH

        ev = GH.with_geohash(points, "lat", "lng", 3, out="gh").select(
            "gh", (F.col("point_id") % 2_000_003).alias("user_id")
        )
        est = SK.hll_sketch(ev, ["gh"], "user_id", p=12)
        r = est.agg(
            F.count("*").alias("cells"),
            F.avg(F.abs(F.col("est_users") - F.col("exact_users"))
                  / F.greatest("exact_users", F.lit(1))).alias("err"),
        ).collect()[0]
        assert r["err"] < 0.05, r["err"]  # ~3 sigma at p=12
        return r["cells"]

    run("hll_users_gh3_p12", _hll)

    # ES weighted sampling at operator scale: top-10k of the full
    # table by the hash-derived ES key — claim under test: the plan is
    # TakeOrderedAndProject (per-partition heaps), so wall time is one
    # narrow scan, not a global sort
    def _wsample():
        from geospark.textops import weighted_sample

        w = points.withColumn(
            "weight", (F.col("point_id") % 997 + 1).cast("long")
        )
        return weighted_sample(
            w, 10_000, id_col="point_id", weight_col="weight"
        ).count()

    run("weighted_sample_top10k", _wsample)

    def _pagerank():
        # 3-out-regular graph on n_points contiguous node ids: per
        # iteration one 3n-row join + dst-sum + node left-join
        from geospark.graph import pagerank

        nodes = spark.range(n_points).select(F.col("id").alias("node"))
        nn = nodes.agg(F.count("*").alias("_n"))
        edges = nodes.crossJoin(F.broadcast(nn)).select(
            F.col("node").alias("src"),
            F.explode(F.array(*[
                (F.col("node") * F.lit(p) + F.lit(j)) % F.col("_n")
                for j, p in [(1, 7919), (2, 104729), (3, 999983)]
            ])).alias("dst"),
        )
        return pagerank(nodes, edges, iters=3).count()

    run("pagerank_3out_3iter", _pagerank)

    def _sssp():
        # nearest-facility assignment at scale: 1000 hubs, 8
        # relaxation rounds over the same 3-out-regular graph with
        # hash-derived BIGINT weights — the frontier grows to
        # millions of nodes, so the per-round frontier x edges join
        # and the full-outer state merge both run at data scale
        from geospark.graph import sssp

        nodes = spark.range(n_points).select(F.col("id").alias("node"))
        nn = nodes.agg(F.count("*").alias("_n"))
        edges = nodes.crossJoin(F.broadcast(nn)).select(
            F.col("node").alias("src"),
            F.explode(F.array(*[
                (F.col("node") * F.lit(p) + F.lit(j)) % F.col("_n")
                for j, p in [(1, 7919), (2, 104729), (3, 999983)]
            ])).alias("dst"),
        ).select(
            "src", "dst",
            (F.lit(1) + (F.col("src") * F.lit(2654435761)
                         + F.col("dst") * F.lit(40503)) % F.lit(1000)
             ).alias("w"),
        )
        return sssp(edges, list(range(1000)), hops=8).count()

    run("sssp_1k_hubs_8hops", _sssp)

    def _colocate():
        # city-skewed points + deterministic 30-day timestamps: the
        # (cell, bucket) equi-join's pair volume is the scale driver
        from geospark.colocate import colocate_pairs

        ev = points.select(
            F.col("point_id").alias("event_id"),
            (F.col("point_id") % 100_000).alias("user_id"),
            F.expr(
                "timestamp_micros(pmod(xxhash64(point_id), "
                "2592000000000))"
            ).alias("ts"),
            "lat", "lng",
        )
        return colocate_pairs(
            ev, 500.0, 15 * 60 * 1_000_000
        ).count()

    run("colocate_500m_15min", _colocate)

    def _traj_events():
        # shared (user, ts) trajectory view: 100k users x ~120 pings,
        # deterministic 30-day timestamps
        return points.select(
            F.col("point_id").alias("event_id"),
            (F.col("point_id") % 100_000).alias("user_id"),
            F.expr(
                "timestamp_micros(pmod(xxhash64(point_id), "
                "2592000000000))"
            ).alias("ts"),
            "lat", "lng",
        )

    def _staypoints():
        from geospark.lines import staypoints

        return staypoints(
            _traj_events(), 2000, 10 * 60 * 1_000_000
        ).count()

    run("staypoints_2km_10min", _staypoints)

    def _hull_area():
        # hull -> ring_shoelace composition: 100k per-user hulls,
        # then exact signed area of every hull ring
        from geospark.hull import convex_hull
        from geospark.lines import ring_shoelace

        hull = convex_hull(points.select(
            (F.col("point_id") % 100_000).alias("user_id"),
            "lat", "lng"))
        areas = ring_shoelace(
            hull.select(
                "user_id", F.col("hull_idx").alias("vtx_idx"),
                (F.col("h_lat7") / 1e7).alias("lat"),
                (F.col("h_lng7") / 1e7).alias("lng")),
            ["user_id"], order="vtx_idx")
        return areas.count()

    run("convex_hull_area_100k_groups", _hull_area)

    def _frechet():
        from geospark.lines import frechet_to_ref

        ref = [(50.0 + 0.02 * i, 8.0 + 0.03 * i) for i in range(40)]
        return frechet_to_ref(_traj_events(), ref).count()

    run("frechet_100k_users_ref40", _frechet)

    def _hausdorff():
        # pure-relational sibling of frechet: n x 40 explode + two
        # partial-aggregatable max-min trees, no Python — the 12M-row
        # evidence that the map-side combine keeps shuffle at n + u*m
        from geospark.lines import hausdorff_to_ref

        ref = [(50.0 + 0.02 * i, 8.0 + 0.03 * i) for i in range(40)]
        return hausdorff_to_ref(_traj_events(), ref).count()

    run("hausdorff_100k_users_ref40", _hausdorff)

    out = {"n_pages": n_pages, "n_points": n_points, "ops": results,
           "cpus": 32, "ts": time.strftime("%Y-%m-%d %H:%M:%S")}
    print(json.dumps(out))

    lines = [
        "",
        f"## Operator scale run {out['ts']} — {n_points:,} points "
        f"(from {n_pages:,} pages), local[32]",
        "",
        "| operator | wall s | rows out | points/sec |",
        "| --- | --- | --- | --- |",
    ]
    for name, r in results.items():
        lines.append(
            f"| {name} | {r['sec']} | {r['rows_out']} | {r['pts_per_sec']} |"
        )
    lines.append("")
    with open(REPO / "BENCH.md", "a") as f:
        f.write("\n".join(lines))
    spark.stop()


if __name__ == "__main__":
    main()
