"""geo_* SQL function family: exact parity with the Column kernels and
plan inlining (no Python, no lambda boundary)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from geospark.functions import kernels as K
from geospark.sql import register_sql_functions


def _pts(spark):
    rows = [
        (0, 49.87, 8.65), (1, 52.52, 13.40), (2, -33.86, 151.20),
        (3, 85.3, 179.99), (4, -85.3, -179.99), (5, 0.0, 0.0),
    ]
    return spark.createDataFrame(rows, "i long, lat double, lng double")


def test_sql_functions_match_column_kernels(spark):
    names = register_sql_functions(spark)
    assert "geo_distance" in names
    df = _pts(spark)
    df.createOrReplaceTempView("sql_pts")

    got = spark.sql(
        "SELECT i, geo_distance(lat, lng, 50.0, 8.0) AS d, "
        "geo_bearing(lat, lng, 50.0, 8.0) AS b, "
        "geo_tile_x(lng, 8) AS tx, geo_tile_y(lat, 8) AS ty, "
        "geo_box_contains(-40.0, -10.0, 60.0, 20.0, lat, lng) AS inb "
        "FROM sql_pts ORDER BY i"
    ).collect()
    exp = df.select(
        "i",
        K.distance(F.col("lat"), F.col("lng"), F.lit(50.0), F.lit(8.0)).alias("d"),
        K.bearing(F.col("lat"), F.col("lng"), F.lit(50.0), F.lit(8.0)).alias("b"),
        K.latlng_to_tile_x(F.col("lng"), 8).alias("tx"),
        K.latlng_to_tile_y(F.col("lat"), 8).alias("ty"),
        K.box_contains_point(
            F.lit(-40.0), F.lit(-10.0), F.lit(60.0), F.lit(20.0),
            F.col("lat"), F.col("lng"),
        ).alias("inb"),
    ).orderBy("i").collect()
    for g, e in zip(got, exp):
        assert g["d"] == e["d"]  # identical formula text -> identical bits
        assert abs(g["b"] - e["b"]) < 1e-9
        assert (g["tx"], g["ty"], g["inb"]) == (e["tx"], e["ty"], e["inb"])


def test_sql_polyline_length_and_inlining(spark):
    from geospark import lines as L

    register_sql_functions(spark)
    df = spark.createDataFrame(
        [(1, [(0.0, 0.0), (0.0, 1.0), (1.0, 1.0)]), (2, [])],
        "id long, line array<struct<lat:double,lng:double>>",
    )
    df.createOrReplaceTempView("sql_lines")
    got = {
        r["id"]: r["len"]
        for r in spark.sql(
            "SELECT id, geo_polyline_length(line) AS len FROM sql_lines"
        ).collect()
    }
    exp = {
        r["id"]: r["len"]
        for r in df.select("id", L.length("line").alias("len")).collect()
    }
    assert got == exp

    # the SQL UDF must INLINE (no PythonUDF / lambda nodes in the plan)
    plan_df = spark.sql(
        "SELECT geo_distance(lat, lng, 0.0, 0.0) FROM sql_pts"
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        plan_df.explain("formatted")
    txt = buf.getvalue()
    assert "BatchEvalPython" not in txt and "PythonUDF" not in txt
    assert "ASIN" in txt.upper()  # the haversine inlined into the plan
