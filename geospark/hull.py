"""Per-group planar convex hull — the footprint summary operator
(per-user activity region, per-cluster coverage outline, bbox's exact
sibling to Q9's axis-aligned aggregate).

Exactness spec: coordinates quantize to x1e7 fixed-point integers
(floor(v * 1e7 + 0.5) — the S14 codec's resolution), and every
orientation test is an INTEGER cross product evaluated in arbitrary-
precision Python ints, so there is no epsilon anywhere: the hull is
exact over the quantized points, collinear interior vertices are
excluded deterministically, and any two correct implementations agree
vertex-for-vertex.  Canonical form: counter-clockwise (lng = x,
lat = y) starting at the lexicographically smallest (lng7, lat7)
vertex; duplicate points collapse.

Plan shape: ONE shuffle on the group key into an Arrow-batched
applyInPandas kernel (Andrew's monotone chain, O(n log n) per group).
Groups are per-user/per-cluster point sets — small by construction;
the cross-group parallelism is the scale axis.  The driver oracle is
a Jarvis march (goldens.convex_hull_jarvis), a genuinely different
algorithm that must reproduce every vertex exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _quant(v: np.ndarray) -> list[int]:
    """x1e7 fixed-point: half-up toward +inf (floor(v*1e7 + 0.5)) —
    the same formula the Jarvis twin uses."""
    return [int(x) for x in np.floor(v * 1e7 + 0.5).astype(np.int64)]


def _cross(o, a, b) -> int:
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def monotone_chain(xy: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Andrew's monotone chain over integer (x, y) pairs: CCW hull
    from the lexicographic minimum, strict turns only (collinear
    interior vertices popped)."""
    pts = sorted(set(xy))
    if len(pts) <= 2:
        return pts
    lower: list[tuple[int, int]] = []
    for p in pts:
        while len(lower) >= 2 and _cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list[tuple[int, int]] = []
    for p in reversed(pts):
        while len(upper) >= 2 and _cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return lower[:-1] + upper[:-1]


def convex_hull(points: DataFrame, group: str = "user_id",
                lat: str = "lat", lng: str = "lng") -> DataFrame:
    """(group, hull_idx, h_lat7, h_lng7): exact quantized hull
    vertices per group in canonical CCW order."""
    gcol, la, ln = group, lat, lng

    def _hull(pdf: pd.DataFrame) -> pd.DataFrame:
        xs = _quant(pdf[ln].to_numpy(np.float64))
        ys = _quant(pdf[la].to_numpy(np.float64))
        hull = monotone_chain(list(zip(xs, ys)))
        return pd.DataFrame({
            gcol: pdf[gcol].iloc[0],
            "hull_idx": np.arange(len(hull), dtype=np.int64),
            "h_lat7": np.array([p[1] for p in hull], np.int64),
            "h_lng7": np.array([p[0] for p in hull], np.int64),
        })

    schema = f"{gcol} long, hull_idx long, h_lat7 long, h_lng7 long"
    return (points.select(gcol, la, ln)
            .groupBy(gcol).applyInPandas(_hull, schema))
