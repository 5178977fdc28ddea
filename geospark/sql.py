"""SQL surface: the kernel family registered as Spark SQL scalar
functions (``CREATE TEMPORARY FUNCTION ... RETURNS ... RETURN expr``).

SQL UDFs INLINE into the plan — ``EXPLAIN`` shows the substituted
expression inside whole-stage codegen, so ``spark.sql("SELECT
geo_distance(...)")`` costs exactly the same as the Column API (no
Python, no lambda boundary). Formulas are the same texts the Column
kernels compile to (geospark.functions.kernels, with reference
citations there); parity is asserted in tests/test_sql_surface.py.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_R = "6371000.0D"  # haversine earth radius (constants.h:6)
_MERC_R = "6378137.0D"  # webmercator radius (webmercator.h:154)


def _hav(lat1: str, lng1: str, lat2: str, lng2: str) -> str:
    dlat = f"(radians(({lat2}) - ({lat1})) / 2.0D)"
    dlng = f"(radians(({lng2}) - ({lng1})) / 2.0D)"
    a = (
        f"(sin({dlat}) * sin({dlat}) + cos(radians({lat1})) * "
        f"cos(radians({lat2})) * sin({dlng}) * sin({dlng}))"
    )
    return f"(2.0D * {_R} * asin(least(1.0D, sqrt({a}))))"


_RES = "((2.0D * pi() * 6378137.0D / 4096.0D) / CAST(shiftleft(1, z) AS DOUBLE))"
_SHIFT = "(pi() * 6378137.0D)"
_MERC_X = f"({_MERC_R} * radians(lng))"
_MERC_Y = (
    f"({_MERC_R} * log((1.0D + sin(radians(greatest(-85.0511287798D, "
    f"least(85.0511287798D, lat))))) / (1.0D - sin(radians(greatest("
    f"-85.0511287798D, least(85.0511287798D, lat)))))) / 2.0D)"
)
# x truncates; y rounds half-away then truncates (webmercator.h:207-219)
_PX = f"CAST(({_MERC_X} + {_SHIFT}) / {_RES} AS BIGINT)"
_PY_V = f"(CAST(4096L AS DOUBLE) * CAST(shiftleft(1, z) AS DOUBLE) - ({_MERC_Y} + {_SHIFT}) / {_RES})"
_PY = (
    f"CAST(CASE WHEN {_PY_V} >= 0.0D THEN floor({_PY_V} + 0.5D) "
    f"ELSE ceil({_PY_V} - 0.5D) END AS BIGINT)"
)

_FUNCTIONS: dict[str, str] = {
    "geo_distance": (
        "(lat1 DOUBLE, lng1 DOUBLE, lat2 DOUBLE, lng2 DOUBLE) "
        "RETURNS DOUBLE RETURN " + _hav("lat1", "lng1", "lat2", "lng2")
    ),
    "geo_bearing": (
        "(lat1 DOUBLE, lng1 DOUBLE, lat2 DOUBLE, lng2 DOUBLE) "
        "RETURNS DOUBLE RETURN "
        "pmod(degrees(atan2("
        "sin(radians(lng2 - lng1)) * cos(radians(lat2)), "
        "cos(radians(lat1)) * sin(radians(lat2)) - "
        "sin(radians(lat1)) * cos(radians(lat2)) * cos(radians(lng2 - lng1))"
        ")), 360.0D)"
    ),
    "geo_lng_scale": (
        "(lat DOUBLE, lng DOUBLE) RETURNS DOUBLE RETURN "
        + _hav("lat", "lng", "lat", "(lng + 1.0D)")
    ),
    "geo_tile_x": (
        f"(lng DOUBLE, z INT) RETURNS BIGINT RETURN "
        f"CAST(floor(CAST({_PX} AS DOUBLE) / 4096.0D) AS BIGINT)"
    ),
    "geo_tile_y": (
        f"(lat DOUBLE, z INT) RETURNS BIGINT RETURN "
        f"CAST(floor(CAST({_PY} AS DOUBLE) / 4096.0D) AS BIGINT)"
    ),
    "geo_box_contains": (
        "(min_lat DOUBLE, min_lng DOUBLE, max_lat DOUBLE, max_lng DOUBLE, "
        "lat DOUBLE, lng DOUBLE) RETURNS BOOLEAN RETURN "
        "lat > min_lat AND lat < max_lat AND lng > min_lng AND lng < max_lng"
    ),
    "geo_polyline_length": (
        "(line ARRAY<STRUCT<lat: DOUBLE, lng: DOUBLE>>) RETURNS DOUBLE RETURN "
        "CASE WHEN size(line) < 2 THEN 0.0D ELSE aggregate("
        "zip_with(slice(line, 1, size(line) - 1), "
        "slice(line, 2, size(line) - 1), "
        "(a, b) -> " + _hav("a.lat", "a.lng", "b.lat", "b.lng") + "), "
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x) END"
    ),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register the geo_* SQL function family on the session; returns
    the registered names. Safe to call repeatedly (OR REPLACE)."""
    for name, body in _FUNCTIONS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{body}")
    return sorted(_FUNCTIONS)
