"""geospark — a PySpark-native spatial-join + tiling engine.

A from-scratch distributed re-expression of the operator surface of
motis-project/geo (reference at /root/reference, C++17 GIS utility
library) as Spark DataFrame plans: haversine / web-mercator / slippy
tile math as pure Column expressions (whole-stage codegen), spatial
joins (radius / kNN / box / point-in-polygon) as cell-keyed
filter-refine join plans, Douglas-Peucker simplification and the
Google polyline codec as Arrow-batched pandas UDFs, and geo
clustering as connected-components + per-group complete-linkage.

Nothing here is a port of the reference's execution machinery (boost
R-trees, mmap storage, tg polygons); the DataFrame layout + Catalyst
*is* the index.
"""

__version__ = "0.1.0"

from geospark.session import get_spark  # noqa: F401
