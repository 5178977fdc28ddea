"""Sources & sinks beyond parquet.

- Osmosis ``.poly`` polygon files (the reference's only file format:
  ``read_poly_file``, src/polygon.cc:15-36 — skips two header lines,
  reads ``lng lat`` per line, terminates on the first line not
  starting with a space). ``read_poly_file`` replicates that
  single-ring behavior exactly; ``read_poly_file_full`` parses the
  complete multi-section Osmosis format (holes prefixed ``!``) into
  a joins.Area.
- normalized polygon tables: Area list <-> exploded DataFrame
  ``(area_id, outer_idx, ring_kind, ring_idx, seq, lat, lng)`` (the
  engine analogue of area_db's mmap ring storage, area_db.h:36-55).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geospark.joins import Area


def read_poly_file(path: str) -> np.ndarray:
    """Reference-exact single-ring parse (src/polygon.cc:15-36):
    skip 2 header lines, read ``lng lat`` while lines start with a
    space. Returns (n, 2) [lat, lng]."""
    pts: list[tuple[float, float]] = []
    with open(path) as fh:
        fh.readline()
        fh.readline()
        for line in fh:
            if not line.startswith(" "):
                break
            parts = line.split()
            if len(parts) < 2:
                break
            lng, lat = float(parts[0]), float(parts[1])
            pts.append((lat, lng))
    return np.asarray(pts, dtype=np.float64)


def read_poly_file_full(path: str, area_id: int = 0) -> Area:
    """Full Osmosis .poly: named sections of ``lng lat`` lines ending
    with END; section names starting with '!' are holes attached to
    the preceding outer ring; file ends with a final END."""
    outers: list[np.ndarray] = []
    inners: list[list[np.ndarray]] = []
    with open(path) as fh:
        fh.readline()  # polygon name header
        current: list[tuple[float, float]] = []
        is_hole = False
        for raw in fh:
            line = raw.strip()
            if not line:
                continue
            if line == "END":
                if current:
                    ring = np.asarray(current, dtype=np.float64)
                    if is_hole:
                        if not inners:
                            raise ValueError("hole before first outer ring")
                        inners[-1].append(ring)
                    else:
                        outers.append(ring)
                        inners.append([])
                    current = []
                    is_hole = False
                continue
            parts = line.split()
            if len(parts) == 1:
                is_hole = parts[0].startswith("!")
                continue
            lng, lat = float(parts[0]), float(parts[1])
            current.append((lat, lng))
    return Area(area_id, outers, inners)


# ---------------------------------------------------------------------------
# normalized polygon table (area_db storage analogue)
# ---------------------------------------------------------------------------
POLYGON_TABLE_SCHEMA = (
    "area_id long, outer_idx int, ring_kind string, ring_idx int, "
    "seq int, lat double, lng double"
)


def areas_to_df(spark: SparkSession, areas: list[Area]) -> DataFrame:
    rows = []
    for a in areas:
        for oi, (outer, holes) in enumerate(zip(a.outers, a.inners)):
            for s, (lat, lng) in enumerate(outer):
                rows.append((a.area_id, oi, "outer", 0, s, float(lat), float(lng)))
            for ri, hole in enumerate(holes):
                for s, (lat, lng) in enumerate(hole):
                    rows.append(
                        (a.area_id, oi, "inner", ri, s, float(lat), float(lng))
                    )
    return spark.createDataFrame(rows, POLYGON_TABLE_SCHEMA)


def df_to_areas(df: DataFrame) -> list[Area]:
    """Rebuild Area objects from the normalized table (driver-side;
    polygon layers are broadcast-sized by design)."""
    pdf = df.toPandas().sort_values(["area_id", "outer_idx", "ring_kind",
                                     "ring_idx", "seq"])
    areas: list[Area] = []
    for aid, g in pdf.groupby("area_id"):
        outers: list[np.ndarray] = []
        inners: list[list[np.ndarray]] = []
        for oi, og in g.groupby("outer_idx"):
            outer = og[og["ring_kind"] == "outer"].sort_values("seq")
            outers.append(outer[["lat", "lng"]].to_numpy())
            holes = []
            inner = og[og["ring_kind"] == "inner"]
            for _, ig in inner.groupby("ring_idx"):
                holes.append(ig.sort_values("seq")[["lat", "lng"]].to_numpy())
            inners.append(holes)
        areas.append(Area(int(aid), outers, inners))
    return areas
