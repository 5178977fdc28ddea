"""Driver contract for the spark-graft builder (PySpark target).

Spark queries live in geospark/ (SURVEY.md §2 operator inventory);
each entry here pairs a DataFrame plan with a DuckDB oracle that
evaluates the *same formulas* (generated term-by-term by
geospark.geodata) over the same parquet tables. Coordinates are
derived deterministically from event ids with pure integer/rational
arithmetic so both engines see bit-identical doubles.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from geospark import geodata as G
from geospark.cells import tile_rollup, with_cell, with_tile
from geospark.functions import kernels as K
from geospark.joins import box_query, knn_join, pip_join, radius_join

SF0001 = "/root/testdata/sf0.001"

# demo box chosen off the 0.01° event lattice (strict vs non-strict agree)
BOX = (10.005, -20.005, 60.015, 40.015)  # lat_min, lng_min, lat_max, lng_max
RADIUS_M = 750_000.0
KNN_K = 20
TILE_Z = 8
ROLLUP_Z = 5


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: events->points -> PIP join vs 3-area polygon layer ->
    webmercator tile assignment -> per-(area, tile) counts."""
    pts = G.events_points(spark, SF0001)
    hits = pip_join(pts, G.demo_layer())
    tiled = with_tile(hits, TILE_Z)
    return (
        tiled.groupBy("area_id", "tile_x", "tile_y")
        .agg(F.count("*").alias("n_points"))
        .orderBy("area_id", "tile_x", "tile_y")
    )


# ---------------------------------------------------------------------------
# Spark queries
# ---------------------------------------------------------------------------
def _q_tile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = G.events_points(spark, sf_dir)
    return (
        with_tile(pts, TILE_Z)
        .groupBy("tile_x", "tile_y")
        .agg(
            F.count("*").alias("n_points"),
            F.min("event_id").alias("min_event"),
            F.max("event_id").alias("max_event"),
        )
    )


def _q_cell_morton(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = G.events_points(spark, sf_dir)
    return (
        pts.withColumn("cell", K.cell_at_zoom(F.col("lat"), F.col("lng"), TILE_Z))
        .groupBy("cell")
        .agg(F.count("*").alias("n_points"))
    )


def _q_bbox_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = G.events_points(spark, sf_dir)
    return pts.groupBy("event_type").agg(
        F.min("lat").alias("min_lat"),
        F.min("lng").alias("min_lng"),
        F.max("lat").alias("max_lat"),
        F.max("lng").alias("max_lng"),
        F.count("*").alias("n_points"),
    )


def _q_haversine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    qlat, qlng = G.DEMO_CENTERS[0][1], G.DEMO_CENTERS[0][2]
    pts = G.events_points(spark, sf_dir)
    d = K.distance(F.lit(qlat), F.lit(qlng), F.col("lat"), F.col("lng"))
    return (
        pts.withColumn("dist_m", d)
        .orderBy("dist_m", "event_id")
        .limit(200)
        .select("event_id", F.floor("dist_m").alias("dist_floor_m"))
    )


def _q_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = G.events_points(spark, sf_dir).select("event_id", "lat", "lng")
    out = radius_join(pts, G.DEMO_CENTERS, max_m=RADIUS_M)
    return out.select(
        "query_id", "event_id", F.floor("dist_m").alias("dist_floor_m")
    )


def _q_box_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = G.events_points(spark, sf_dir).select("event_id", "lat", "lng")
    return box_query(pts, *BOX)


def _q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = G.events_points(spark, sf_dir).select("event_id", "lat", "lng")
    out = knn_join(pts, G.DEMO_CENTERS, k=KNN_K, id_col="event_id")
    return out.select(
        "query_id", "event_id", F.floor("dist_m").alias("dist_floor_m")
    )


def _q_pip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = G.events_points(spark, sf_dir).select("event_id", "lat", "lng")
    return pip_join(pts, G.demo_layer()).select("area_id", "event_id")


def _q_tile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = G.events_points(spark, sf_dir)
    z8 = (
        with_tile(pts, TILE_Z)
        .groupBy("tile_x", "tile_y")
        .agg(F.count("*").alias("n_points"))
    )
    return tile_rollup(
        z8, [F.sum("n_points").alias("n_points")], to_zoom=ROLLUP_Z, from_zoom=TILE_Z
    ).select("tile_x", "tile_y", "n_points")


def _q_bearing_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = G.events_points(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("event_id")
    seq = pts.withColumn("p_lat", F.lag("lat").over(w)).withColumn(
        "p_lng", F.lag("lng").over(w)
    )
    b = K.bearing(F.col("p_lat"), F.col("p_lng"), F.col("lat"), F.col("lng"))
    return (
        seq.filter(F.col("p_lat").isNotNull())
        .select("event_id", F.round(b, 4).alias("bearing_r"))
    )


def _q_box_buffer(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = G.events_points(spark, sf_dir)
    a, b, c, d = K.box_extend_by_meters(
        F.col("lat"), F.col("lng"), F.col("lat"), F.col("lng"), F.lit(50_000.0)
    )
    return pts.select(
        "event_id",
        F.round(a, 4).alias("bmin_lat"),
        F.round(b, 4).alias("bmin_lng"),
        F.round(c, 4).alias("bmax_lat"),
        F.round(d, 4).alias("bmax_lng"),
    )


def _q_polyline_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1 via the engine's array-expression length operator: build the
    per-user trajectory (deterministic (ts, event_id) order), then
    aggregate-fold haversine segments JVM-side."""
    from geospark import lines as L

    pts = G.events_points(spark, sf_dir)
    traj = (
        pts.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "lat", "lng"))
            ).alias("seq")
        )
        .withColumn(
            "line", F.expr("transform(seq, p -> struct(p.lat AS lat, p.lng AS lng))")
        )
    )
    return traj.select(
        "user_id",
        F.size("line").alias("n_points"),
        F.floor(L.length("line")).alias("len_floor_m"),
    )


def _q_destination_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = G.events_points(spark, sf_dir)
    dist = (F.col("event_id") % 900) * 1000.0 + 500.0
    brg = (F.col("event_id") % 360) + 0.5
    dlat, dlng = K.destination_point(F.col("lat"), F.col("lng"), dist, brg)
    return pts.select(
        "event_id",
        F.round(dlat, 5).alias("dest_lat"),
        F.round(dlng, 5).alias("dest_lng"),
    )


def _q_midpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = G.events_points(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("event_id")
    seq = pts.withColumn("p_lat", F.lag("lat").over(w)).withColumn(
        "p_lng", F.lag("lng").over(w)
    )
    mlat, mlng = K.midpoint(
        F.col("p_lat"), F.col("p_lng"), F.col("lat"), F.col("lng")
    )
    return (
        seq.filter(F.col("p_lat").isNotNull())
        .select(
            "event_id",
            F.round(mlat, 5).alias("mid_lat"),
            F.round(mlng, 5).alias("mid_lng"),
        )
    )


def _q_simplify_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: 21-level DP masks over per-user trajectories."""
    from geospark import lines as L

    pts = G.events_points(spark, sf_dir)
    traj = (
        pts.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "lat", "lng"))
            ).alias("seq")
        )
        .withColumn(
            "line", F.expr("transform(seq, p -> struct(p.lat AS lat, p.lng AS lng))")
        )
        .filter(F.size("line") >= 2)
        .withColumn("mask", L.make_simplify_mask_udf()(F.col("line")))
    )
    z0 = L.apply_simplify_mask_udf(0)(F.col("mask"), F.col("line"))
    z10 = L.apply_simplify_mask_udf(10)(F.col("mask"), F.col("line"))
    return traj.select(
        "user_id",
        F.size("line").alias("n_points"),
        F.size(z0).alias("n_z0"),
        F.size(z10).alias("n_z10"),
        F.length("mask").alias("mask_bytes"),
    )


def _q_polyline_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: Google polyline encode/decode roundtrip stats."""
    from geospark import lines as L

    pts = G.events_points(spark, sf_dir)
    traj = (
        pts.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "lat", "lng"))
            ).alias("seq")
        )
        .withColumn(
            "line", F.expr("transform(seq, p -> struct(p.lat AS lat, p.lng AS lng))")
        )
        .withColumn("enc", L.encode_polyline_udf(5)(F.col("line")))
        .withColumn("dec", L.decode_polyline_udf(5)(F.col("enc")))
    )
    return traj.select(
        "user_id",
        F.length("enc").alias("enc_len"),
        F.size("dec").alias("n_roundtrip"),
        F.size("line").alias("n_points"),
    )


def _q_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: two-stage geo clustering (C1), 100 km threshold."""
    from geospark.cluster import cluster_nearby

    pts = G.events_points(spark, sf_dir).select(
        F.col("event_id").alias("point_id"), "lat", "lng"
    )
    labels = cluster_nearby(pts, 100_000.0)
    return (
        labels.groupBy("cluster_id")
        .agg(F.count("*").alias("n_members"))
        .filter(F.col("n_members") >= 2)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "polyline_length": _q_polyline_length,
        "destination_point": _q_destination_point,
        "midpoint": _q_midpoint,
        "simplify_mask": _q_simplify_mask,
        "polyline_codec": _q_polyline_codec,
        "cluster": _q_cluster,
        "tile_assign": _q_tile_assign,
        "cell_morton": _q_cell_morton,
        "bbox_agg": _q_bbox_agg,
        "haversine_topk": _q_haversine_topk,
        "radius_join": _q_radius_join,
        "box_query": _q_box_query,
        "knn": _q_knn,
        "pip_join": _q_pip_join,
        "tile_rollup": _q_tile_rollup,
        "bearing_seq": _q_bearing_seq,
        "box_buffer": _q_box_buffer,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles (same formulas, generated by geospark.geodata)
# ---------------------------------------------------------------------------
def _centers_values() -> str:
    rows = ", ".join(
        f"({qid}, {repr(lat)}, {repr(lng)})" for qid, lat, lng in G.DEMO_CENTERS
    )
    return f"(VALUES {rows}) AS c(query_id, q_lat, q_lng)"


def oracle_sql() -> dict[str, str]:
    pts = G.EVENTS_POINTS_SQL
    hav = G.haversine_sql("q_lat", "q_lng", "lat", "lng")
    hav0 = G.haversine_sql(
        repr(G.DEMO_CENTERS[0][1]), repr(G.DEMO_CENTERS[0][2]), "lat", "lng"
    )
    tx = G.tile_x_sql("lng", TILE_Z)
    ty = G.tile_y_sql("lat", TILE_Z)
    lat_min, lng_min, lat_max, lng_max = BOX

    pip_union = "\nUNION ALL\n".join(
        f"SELECT {aid} AS area_id, event_id FROM pts WHERE {sql}"
        for aid, sql in G.demo_layer_pip_sql("lat", "lng")
    )

    prev = "PARTITION BY event_type ORDER BY event_id"
    bearing = G.bearing_sql("p_lat", "p_lng", "lat", "lng")
    seg_hav = G.haversine_sql("p_lat", "p_lng", "lat", "lng")
    dest_lat, dest_lng = G.destination_sql(
        "lat", "lng", "(event_id % 900) * 1000.0 + 500.0", "(event_id % 360) + 0.5"
    )
    mid_lat, mid_lng = G.midpoint_sql("p_lat", "p_lng", "lat", "lng")

    return {
        "polyline_length": f"""
            WITH pts AS ({pts}),
            seq AS (
                SELECT user_id, lat, lng,
                       lag(lat) OVER w AS p_lat, lag(lng) OVER w AS p_lng
                FROM pts
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT user_id, count(*) AS n_points,
                   CAST(floor(coalesce(sum(
                       CASE WHEN p_lat IS NULL THEN NULL ELSE {seg_hav} END
                   ), 0.0)) AS BIGINT) AS len_floor_m
            FROM seq GROUP BY user_id
        """,
        "destination_point": f"""
            WITH pts AS ({pts})
            SELECT event_id,
                   round({dest_lat}, 5) AS dest_lat,
                   round({dest_lng}, 5) AS dest_lng
            FROM pts
        """,
        "midpoint": f"""
            WITH pts AS ({pts}),
            seq AS (
                SELECT event_id, lat, lng,
                       lag(lat) OVER ({prev}) AS p_lat,
                       lag(lng) OVER ({prev}) AS p_lng
                FROM pts
            )
            SELECT event_id,
                   round({mid_lat}, 5) AS mid_lat,
                   round({mid_lng}, 5) AS mid_lng
            FROM seq WHERE p_lat IS NOT NULL
        """,
        "tile_assign": f"""
            WITH pts AS ({pts})
            SELECT {tx} AS tile_x, {ty} AS tile_y,
                   count(*) AS n_points,
                   min(event_id) AS min_event, max(event_id) AS max_event
            FROM pts GROUP BY 1, 2
        """,
        "cell_morton": f"""
            WITH pts AS ({pts})
            SELECT {G.cell_sql('lat', 'lng', TILE_Z)} AS cell,
                   count(*) AS n_points
            FROM pts GROUP BY 1
        """,
        "bbox_agg": f"""
            WITH pts AS ({pts})
            SELECT event_type,
                   min(lat) AS min_lat, min(lng) AS min_lng,
                   max(lat) AS max_lat, max(lng) AS max_lng,
                   count(*) AS n_points
            FROM pts GROUP BY event_type
        """,
        "haversine_topk": f"""
            WITH pts AS ({pts})
            SELECT event_id,
                   CAST(floor({hav0}) AS BIGINT) AS dist_floor_m
            FROM pts ORDER BY {hav0}, event_id LIMIT 200
        """,
        "radius_join": f"""
            WITH pts AS ({pts})
            SELECT query_id, event_id,
                   CAST(floor({hav}) AS BIGINT) AS dist_floor_m
            FROM pts CROSS JOIN {_centers_values()}
            WHERE {hav} < {repr(RADIUS_M)} AND {hav} >= 0.0
        """,
        "box_query": f"""
            WITH pts AS ({pts})
            SELECT event_id, lat, lng FROM pts
            WHERE lat > {repr(lat_min)} AND lat < {repr(lat_max)}
              AND lng > {repr(lng_min)} AND lng < {repr(lng_max)}
        """,
        "knn": f"""
            WITH pts AS ({pts}),
            ranked AS (
                SELECT query_id, event_id, {hav} AS dist,
                       row_number() OVER (
                           PARTITION BY query_id ORDER BY {hav}, event_id
                       ) AS rn
                FROM pts CROSS JOIN {_centers_values()}
            )
            SELECT query_id, event_id,
                   CAST(floor(dist) AS BIGINT) AS dist_floor_m
            FROM ranked WHERE rn <= {KNN_K}
        """,
        "pip_join": f"""
            WITH pts AS ({pts})
            {pip_union}
        """,
        "tile_rollup": f"""
            WITH pts AS ({pts}),
            z8 AS (
                SELECT {tx} AS tile_x, {ty} AS tile_y, count(*) AS n_points
                FROM pts GROUP BY 1, 2
            )
            SELECT tile_x >> {TILE_Z - ROLLUP_Z} AS tile_x,
                   tile_y >> {TILE_Z - ROLLUP_Z} AS tile_y,
                   sum(n_points) AS n_points
            FROM z8 GROUP BY 1, 2
        """,
        "bearing_seq": f"""
            WITH pts AS ({pts}),
            seq AS (
                SELECT event_id, lat, lng,
                       lag(lat) OVER ({prev}) AS p_lat,
                       lag(lng) OVER ({prev}) AS p_lng
                FROM pts
            )
            SELECT event_id, round({bearing}, 4) AS bearing_r
            FROM seq WHERE p_lat IS NOT NULL
        """,
        "box_buffer": f"""
            WITH pts AS ({pts})
            SELECT event_id,
                   round(lat - 50000.0 / 111000.0, 4) AS bmin_lat,
                   round(lng - abs(50000.0 / (111200.0 * cos(
                       (lat - 50000.0 / 111000.0) * {repr(K.PI / 180.0)}))), 4
                   ) AS bmin_lng,
                   round(lat + 50000.0 / 111000.0, 4) AS bmax_lat,
                   round(lng + abs(50000.0 / (111200.0 * cos(
                       (lat + 50000.0 / 111000.0) * {repr(K.PI / 180.0)}))), 4
                   ) AS bmax_lng
            FROM pts
        """,
    }
