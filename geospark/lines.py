"""Polyline operators (SURVEY §2.3-2.5: L1-L8, M1-M7, G1-G4).

Lines are ``array<struct<lat:double, lng:double>>`` columns. Everything
expressible as array/higher-order Column expressions stays JVM-side
(length, extract, serde, mask application); the iterative
Douglas-Peucker masks and the Google polyline codec run as
Arrow-batched pandas UDFs over numpy (geospark.functions.numpy_kernels
— exact reference semantics incl. the uint64 truncation and llround
quirks). distance_to_polyline is a relational plan: explode to
segments -> exact closest-on-segment Column kernel -> min-struct
aggregate argmin (partial-aggregatable; no window sort).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from geospark.functions import kernels as K
from geospark.functions import numpy_kernels as NK

LINE_TYPE = "array<struct<lat:double,lng:double>>"


def _hav_expr(a_lat: str, a_lng: str, b_lat: str, b_lng: str) -> str:
    """Haversine as a SQL-expression string (S1, src/latlng.cc:29-31)."""
    dlat = f"(radians(({b_lat}) - ({a_lat})) / 2.0D)"
    dlng = f"(radians(({b_lng}) - ({a_lng})) / 2.0D)"
    a = (
        f"(sin({dlat}) * sin({dlat}) + cos(radians({a_lat})) * "
        f"cos(radians({b_lat})) * sin({dlng}) * sin({dlng}))"
    )
    return f"(2.0D * {K.EARTH_RADIUS_M}D * asin(least(1.0D, sqrt({a}))))"


# ---------------------------------------------------------------------------
# L1 length — sum of great-circle segment lengths (src/polyline.cc:12-14)
# Pure higher-order Column expression: zip adjacent points, haversine
# each segment, aggregate-sum. No shuffle, whole-stage codegen.
# ---------------------------------------------------------------------------
def length(line: str) -> Column:
    """``line`` is the column NAME of an array<struct<lat,lng>>."""
    seg = (
        f"zip_with(slice({line}, 1, size({line}) - 1), "
        f"slice({line}, 2, size({line}) - 1), "
        f"(a, b) -> {_hav_expr('a.lat', 'a.lng', 'b.lat', 'b.lng')})"
    )
    # slice(line, 1, -1) is a runtime error for empty arrays — a
    # 0/1-point line has length 0 by definition (polyline.cc:12-14)
    return F.expr(
        f"CASE WHEN size({line}) < 2 THEN 0.0D "
        f"ELSE aggregate({seg}, cast(0.0 as double), (acc, x) -> acc + x) END"
    )


# L4 extract — sub-polyline by index range, reversible (src/polyline.cc:22-30)
def extract(line: str, from_idx, to_idx) -> Column:
    f_, t_ = F.lit(from_idx) if isinstance(from_idx, int) else from_idx, (
        F.lit(to_idx) if isinstance(to_idx, int) else to_idx
    )
    fwd = F.slice(F.col(line), f_ + 1, t_ - f_ + 1)
    bwd = F.reverse(F.slice(F.col(line), t_ + 1, f_ - t_ + 1))
    return F.when(f_ <= t_, fwd).otherwise(bwd)


# L5 serialize / deserialize — line <-> flat [lat0, lng0, lat1, ...]
# (polyline.h:43-66), pure array exprs.
def serialize(line: str) -> Column:
    return F.expr(f"flatten(transform({line}, p -> array(p.lat, p.lng)))")


def deserialize(flat: str) -> Column:
    return F.expr(
        f"transform(sequence(0, size({flat}) div 2 - 1), "
        f"i -> struct({flat}[i * 2] AS lat, {flat}[i * 2 + 1] AS lng))"
    )


# ---------------------------------------------------------------------------
# M3/M5 simplify masks — Arrow-batched UDFs over the numpy DP kernels
# ---------------------------------------------------------------------------
def _line_field(line, field: str):
    """array<struct> field extraction as a JVM expr — the Arrow
    boundary then transfers plain numeric ListArrays. An array<struct>
    crossing into a pandas UDF materializes one Python DICT per point
    (the map-match cover measured 10x on exactly this); every UDF in
    this family therefore takes (lats, lngs) double arrays."""
    c = F.col(line) if isinstance(line, str) else line
    return c.getField(field)


def make_simplify_mask_udf():
    """line -> serialized 21-level keep-mask (simplify_mask.h:112-218,
    exact byte layout: u32 lvls, u32 size, LSB-first bits).
    Factory (pandas_udf needs an active session to parse the type);
    the returned callable takes the array<struct> line column and
    splits it into numeric arrays JVM-side."""

    @pandas_udf("binary")
    def _mask(lats_s: pd.Series, lngs_s: pd.Series) -> pd.Series:
        out = []
        for lats, lngs in zip(lats_s, lngs_s):
            if lats is None or len(lats) == 0:
                out.append(None)
                continue
            masks = NK.make_simplify_mask(
                np.asarray(lats, np.float64), np.asarray(lngs, np.float64))
            out.append(NK.serialize_simplify_mask(masks))
        return pd.Series(out)

    def _call(line):
        return _mask(_line_field(line, "lat"), _line_field(line, "lng"))

    return _call


def apply_simplify_mask_udf(level: int):
    """mask binary + line -> simplified line at `level` (M6/M4).
    The UDF itself returns KEEP INDICES (array<int>, numeric Arrow
    path); the line is re-assembled JVM-side with transform/element_at
    so no struct ever crosses the Python boundary."""

    @pandas_udf("array<int>")
    def _keep_idx(masks: pd.Series) -> pd.Series:
        out = []
        for mask_b in masks:
            if mask_b is None:
                out.append(None)
                continue
            keep = NK.read_simplify_mask(bytes(mask_b), level)
            out.append(np.flatnonzero(keep).astype(np.int32))
        return pd.Series(out)

    def _call(mask, line):
        c = F.col(line) if isinstance(line, str) else line
        idx = _keep_idx(mask if not isinstance(mask, str) else F.col(mask))
        # a NULL line must stay NULL even when the (separately stored)
        # mask is non-null — element_at(NULL, i) would otherwise build
        # an array of null structs
        return F.when(c.isNotNull(),
                      F.transform(idx, lambda i: F.element_at(c, i + 1)))

    return _call


def simplify_udf(max_distance_deg: float):
    """L2 one-shot Douglas-Peucker with a degree tolerance
    (src/polyline.cc:16-20, boost::geometry::simplify semantics).
    Same numeric-arrays-only Arrow boundary as the mask family: the
    UDF takes (lats, lngs) double arrays and returns KEEP INDICES;
    the line is re-assembled JVM-side with transform/element_at, so
    no struct ever crosses the Python boundary."""

    @pandas_udf("array<int>")
    def _keep_idx(lats_s: pd.Series, lngs_s: pd.Series) -> pd.Series:
        out = []
        for lats, lngs in zip(lats_s, lngs_s):
            if lats is None:
                out.append(None)
            elif len(lats) < 2:
                out.append(np.arange(len(lats), dtype=np.int32))
            else:
                keep = NK.simplify_dp_latlng(
                    np.asarray(lats, np.float64),
                    np.asarray(lngs, np.float64), max_distance_deg)
                out.append(np.flatnonzero(keep).astype(np.int32))
        return pd.Series(out)

    def _call(line):
        c = F.col(line) if isinstance(line, str) else line
        idx = _keep_idx(_line_field(c, "lat"), _line_field(c, "lng"))
        return F.when(c.isNotNull(),
                      F.transform(idx, lambda i: F.element_at(c, i + 1)))

    return _call


# ---------------------------------------------------------------------------
# G1-G4 Google polyline codec
# ---------------------------------------------------------------------------
def encode_polyline_udf(precision: int = 5):
    @pandas_udf("string")
    def _enc(lats_s: pd.Series, lngs_s: pd.Series) -> pd.Series:
        out = []
        for lats, lngs in zip(lats_s, lngs_s):
            if lats is None:
                out.append(None)
                continue
            out.append(NK.encode_polyline(list(lats), list(lngs), precision))
        return pd.Series(out)

    def _call(line):
        return _enc(_line_field(line, "lat"), _line_field(line, "lng"))

    return _call


def encode_polyline_nonzero_udf(precision: int = 5, simplification: int = 0):
    """G2 push_nonzero_diff (polyline_format.h:41-58) as a UDF:
    returns struct(enc string, n_kept int) — combine simplification
    with encoding in one pass."""

    @pandas_udf("struct<enc:string,n_kept:int>")
    def _enc(lats_s: pd.Series, lngs_s: pd.Series) -> pd.DataFrame:
        encs, keeps = [], []
        for lats, lngs in zip(lats_s, lngs_s):
            if lats is None:
                encs.append(None)
                keeps.append(None)
                continue
            e, kept = NK.encode_polyline_nonzero(
                list(lats), list(lngs), precision, simplification,
            )
            encs.append(e)
            keeps.append(kept)
        return pd.DataFrame({"enc": encs, "n_kept": keeps})

    def _call(line):
        return _enc(_line_field(line, "lat"), _line_field(line, "lng"))

    return _call


def decode_polyline_udf(precision: int = 5):
    @pandas_udf(LINE_TYPE)
    def _dec(strs: pd.Series) -> pd.Series:
        out = []
        for s in strs:
            if s is None:
                out.append(None)
                continue
            lats, lngs = NK.decode_polyline(s, precision)
            out.append([{"lat": float(a), "lng": float(b)} for a, b in zip(lats, lngs)])
        return pd.Series(out)

    return _dec


# ---------------------------------------------------------------------------
# L6 distance_to_polyline — relational argmin over segments
# (polyline.h:79-96): ties keep the FIRST segment (strict <) — the
# window orders by (dist, seg_idx) so first-wins is preserved.
# ---------------------------------------------------------------------------
def distance_to_polyline(pairs: DataFrame, point_lat: str, point_lng: str,
                         line: str, keys: list[str]) -> DataFrame:
    """``pairs`` has one row per (point, line) pair; ``keys`` identify
    the pair. Returns keys + dist_m + seg_idx + closest lat/lng.

    Plan: posexplode line to segments (narrow) -> exact
    closest_on_segment (S8, pure Column) -> haversine -> window argmin
    partitioned by the pair keys. One shuffle (the window).
    """
    seg = pairs.select(
        *keys,
        F.col(point_lat).alias("_x_lat"),
        F.col(point_lng).alias("_x_lng"),
        F.posexplode(
            F.expr(
                f"zip_with(slice({line}, 1, size({line}) - 1), "
                f"slice({line}, 2, size({line}) - 1), "
                f"(a, b) -> struct(a AS f, b AS t))"
            )
        ).alias("seg_idx", "_seg"),
    )
    # staged twin (identical arithmetic, linear-size expression tree —
    # the one-Column form built a ~58 KB Project; see kernels.py)
    seg = K.with_closest_on_segment(
        seg, "_x_lat", "_x_lng",
        F.col("_seg.f.lat"), F.col("_seg.f.lng"),
        F.col("_seg.t.lat"), F.col("_seg.t.lng"),
        "closest_lat", "closest_lng",
    )
    seg = seg.withColumn(
        "dist_m",
        K.distance(F.col("_x_lat"), F.col("_x_lng"),
                   F.col("closest_lat"), F.col("closest_lng")),
    )
    # argmin as a min-struct AGGREGATE, not a window sort: (dist, seg_idx)
    # is unique per pair, struct ordering is lexicographic, so min() ==
    # first-wins tie-break (polyline.h:88 strict <) — and the plan gets
    # map-side partial aggregation instead of a full window sort.
    best = F.min(
        F.struct("dist_m", "seg_idx", "closest_lat", "closest_lng")
    ).alias("_best")
    return (
        seg.groupBy(*keys).agg(best)
        .select(
            *keys, F.col("_best.dist_m").alias("dist_m"),
            F.col("_best.seg_idx").alias("seg_idx"),
            F.col("_best.closest_lat").alias("closest_lat"),
            F.col("_best.closest_lng").alias("closest_lng"),
        )
    )


# ---------------------------------------------------------------------------
# L7 approx_squared_distance_to_polyline — same argmin plan with the
# S9 equirectangular kernel (polyline.h:98-116). S9 is pure rational
# arithmetic (no transcendentals), so results are bit-identical across
# engines — the DuckDB oracle replicates it exactly.
# ---------------------------------------------------------------------------
def approx_distance_to_polyline(pairs: DataFrame, point_lat: str, point_lng: str,
                                line: str, keys: list[str],
                                scale: str) -> DataFrame:
    """``scale`` = column with the m/deg-lng factor (S4 at the query
    point). Returns keys + approx_sq + seg_idx + closest lat/lng;
    ties keep the FIRST segment (polyline.h:110 strict <)."""
    seg = pairs.select(
        *keys,
        F.col(point_lat).alias("_x_lat"),
        F.col(point_lng).alias("_x_lng"),
        F.col(scale).alias("_scale"),
        F.posexplode(
            F.expr(
                f"zip_with(slice({line}, 1, size({line}) - 1), "
                f"slice({line}, 2, size({line}) - 1), "
                f"(a, b) -> struct(a AS f, b AS t))"
            )
        ).alias("seg_idx", "_seg"),
    )
    c_lat, c_lng, c_sq = K.approx_closest_on_segment(
        F.col("_x_lat"), F.col("_x_lng"),
        F.col("_seg.f.lat"), F.col("_seg.f.lng"),
        F.col("_seg.t.lat"), F.col("_seg.t.lng"),
        F.col("_scale"),
    )
    seg = (
        seg.withColumn("closest_lat", c_lat)
        .withColumn("closest_lng", c_lng)
        .withColumn("approx_sq", c_sq)
    )
    # min-struct argmin (see distance_to_polyline): first-wins tie-break
    # (polyline.h:110 strict <) with partial aggregation, no window sort.
    best = F.min(
        F.struct("approx_sq", "seg_idx", "closest_lat", "closest_lng")
    ).alias("_best")
    return (
        seg.groupBy(*keys).agg(best)
        .select(
            *keys, F.col("_best.approx_sq").alias("approx_sq"),
            F.col("_best.seg_idx").alias("seg_idx"),
            F.col("_best.closest_lat").alias("closest_lat"),
            F.col("_best.closest_lng").alias("closest_lng"),
        )
    )


def resample(points: DataFrame, step_m: float, user: str = "user_id",
             order: tuple[str, ...] = ("ts", "event_id"),
             lat: str = "lat", lng: str = "lng") -> DataFrame:
    """Equal-interval resampling along each user's polyline: emit a
    point every ``step_m`` meters of (centimeter-quantized) arc
    length — the trajectory-normalization primitive (fixed-rate GPS
    from irregular pings; the tile-rendering analogue of the
    reference's simplify family, densifying instead of thinning).

    Determinism spec: per-segment haversine lengths are quantized to
    integer CENTIMETERS before the cumulative sum, so the running arc
    length is exact integer math — immune to float-summation order
    (window aggregates may accumulate pairwise vs sequentially across
    engines). Tick k sits at arc length k*step in [seg_start,
    seg_end) (half-open, so a tick on a boundary belongs to the
    LATER segment); its position is planar interpolation between the
    segment endpoints at f = (k*step - seg_start)/seg_len.

    Plan shape: two window passes over (user, order) — lag + integer
    cumsum, same partitioning so ONE shuffle — then a per-segment
    integer sequence() explode; output is tick-linear, never
    O(points x ticks). No Python anywhere.

    Returns (user, tick_idx, r_lat, r_lng)."""
    from pyspark.sql import Window

    step_cm = int(round(step_m * 100))
    if step_cm <= 0:
        raise ValueError("step_m must be >= 0.01 m")
    w = Window.partitionBy(user).orderBy(*order)
    d = points.select(user, *order, lat, lng)
    d = d.withColumns({
        "_plat": F.lag(lat).over(w),
        "_plng": F.lag(lng).over(w),
    })
    d = d.withColumns({
        "_len_cm": F.when(
            F.col("_plat").isNull(), F.lit(0).cast("long")
        ).otherwise(
            F.floor(
                K.distance(F.col("_plat"), F.col("_plng"),
                           F.col(lat), F.col(lng)) * F.lit(100.0)
            ).cast("long")
        ),
    })
    d = d.withColumns({"_cum_cm": F.sum("_len_cm").over(w)})
    segs = d.filter(F.col("_plat").isNotNull() & (F.col("_len_cm") > 0))
    segs = segs.withColumns({
        "_cum0": F.col("_cum_cm") - F.col("_len_cm"),
    })
    # integer tick range: smallest k with k*step >= cum0 (ceil div) up
    # to largest k with k*step < cum (half-open upper end)
    segs = segs.withColumns({
        "_k_lo": F.expr(f"(_cum0 + {step_cm} - 1) DIV {step_cm}"),
        "_k_hi": F.expr(f"(_cum_cm - 1) DIV {step_cm}"),
    })
    ticks = segs.filter(F.col("_k_lo") <= F.col("_k_hi")).select(
        user, "_plat", "_plng", lat, lng, "_cum0", "_len_cm",
        F.explode(F.sequence("_k_lo", "_k_hi")).alias("tick_idx"),
    )
    f = (
        (F.col("tick_idx") * F.lit(step_cm) - F.col("_cum0"))
        .cast("double") / F.col("_len_cm").cast("double")
    )
    return ticks.select(
        user,
        "tick_idx",
        (F.col("_plat") + f * (F.col(lat) - F.col("_plat")))
        .alias("r_lat"),
        (F.col("_plng") + f * (F.col(lng) - F.col("_plng")))
        .alias("r_lng"),
    )


def staypoints(points: DataFrame, d_max_m: int,
               min_dwell_us: int, user: str = "user_id",
               ts: str = "ts", order_tiebreak: str = "event_id",
               lat: str = "lat", lng: str = "lng") -> DataFrame:
    """Stay-point detection: maximal runs of consecutive pings whose
    STEP distance stays <= ``d_max_m``, kept when the run's dwell is
    >= ``min_dwell_us`` — the movement/pause segmentation that turns
    raw GPS streams into visit records (the spatial analogue of
    sessions.sessionize, and the usual precursor to place-mining over
    the cluster operator's output).

    Determinism spec: the step test compares floor(haversine) in
    INTEGER meters (map_match's quantized-compare trick — an engine
    ulp can only flip membership when a step lands within 1 ulp of an
    exact integer meter), dwell is integer microseconds, and the
    centroid is a floor-divided integer average of the x1e7
    fixed-point coords (S14 codec) — no float summation or rounding
    anywhere, so the DuckDB twin is bit-identical.

    Plan shape (sessionize's): lag + cumsum windows and the segment
    rollup all cluster on ``user``, so the whole operator is ONE
    exchange on the user key; the final per-user stay re-numbering
    reuses the same partitioning.

    Returns (user, sp_idx, n_pts, start_us, end_us, dwell_us,
    c_lat7, c_lng7)."""
    from pyspark.sql import Window

    us = F.unix_micros(F.col(ts).cast("timestamp"))
    d = points.select(
        user, F.col(order_tiebreak), us.alias("_us"),
        F.col(lat).alias("_lat"), F.col(lng).alias("_lng"),
        K.double_to_fix(F.col(lat)).cast("long").alias("_lat7"),
        K.double_to_fix(F.col(lng)).cast("long").alias("_lng7"),
    )
    w = Window.partitionBy(user).orderBy("_us", order_tiebreak)
    d = d.withColumns({
        "_plat": F.lag("_lat").over(w),
        "_plng": F.lag("_lng").over(w),
    })
    step_m = F.floor(K.distance(F.col("_plat"), F.col("_plng"),
                                F.col("_lat"), F.col("_lng")))
    d = d.withColumn(
        "_brk",
        F.when(F.col("_plat").isNull() | (step_m > F.lit(d_max_m)),
               F.lit(1)).otherwise(F.lit(0)),
    )
    d = d.withColumn(
        "seg_id",
        F.sum("_brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    seg = d.groupBy(user, "seg_id").agg(
        F.count("*").alias("n_pts"),
        F.min("_us").alias("start_us"),
        F.max("_us").alias("end_us"),
        F.sum("_lat7").alias("_slat"),
        F.sum("_lng7").alias("_slng"),
    )
    stays = seg.filter(
        (F.col("end_us") - F.col("start_us")) >= F.lit(min_dwell_us)
    )
    w2 = Window.partitionBy(user).orderBy("start_us", "seg_id")
    # floor(bigint / bigint) via double: sums stay < 2^53 (|lat7| <=
    # 1.8e9 x run length), so the division is exact enough for floor
    # and identical in DuckDB (whose / is also float division)
    return stays.select(
        F.col(user),
        (F.row_number().over(w2) - 1).alias("sp_idx"),
        "n_pts", "start_us", "end_us",
        (F.col("end_us") - F.col("start_us")).alias("dwell_us"),
        F.floor(F.col("_slat") / F.col("n_pts")).cast("long")
        .alias("c_lat7"),
        F.floor(F.col("_slng") / F.col("n_pts")).cast("long")
        .alias("c_lng7"),
    )


def ring_shoelace(vertices: DataFrame, keys: list[str],
                  order: str = "vtx_idx", lat: str = "lat",
                  lng: str = "lng", q: int = 100_000) -> DataFrame:
    """Exact signed ring area (shoelace) as pure relational algebra:
    per ring (one key group), twice the enclosed area in quantized
    (1/q degree)^2 units — an exact BIGINT, because vertices quantize
    to integers (floor(v*q + 0.5)) and every cross term
    x_i*y_{i+1} - x_{i+1}*y_i stays within int64 at q = 1e5
    (|x| <= 1.8e7 * 2, products <= ~3.3e14, row budget ~2.7e4 rings
    of 1e3 vertices before the SUM could approach 2^63).  Positive =
    counter-clockwise winding.

    Plan: ONE shuffle on the ring key — the lead/first wraparound
    window and the rollup share the partitioning.

    Returns (keys..., n_vtx, area2_q, winding)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(order)
    d = vertices.select(
        *keys, order,
        F.floor(F.col(lng) * q + F.lit(0.5)).cast("long").alias("_x"),
        F.floor(F.col(lat) * q + F.lit(0.5)).cast("long").alias("_y"),
    )
    d = d.withColumns({
        # wraparound edge: the last vertex pairs with the first
        "_xn": F.coalesce(F.lead("_x").over(w), F.first("_x").over(w)),
        "_yn": F.coalesce(F.lead("_y").over(w), F.first("_y").over(w)),
    })
    a2 = F.sum(F.col("_x") * F.col("_yn") - F.col("_xn") * F.col("_y"))
    return d.groupBy(*keys).agg(
        F.count("*").alias("n_vtx"),
        a2.alias("area2_q"),
    ).select(
        *keys, "n_vtx", "area2_q",
        F.when(F.col("area2_q") > 0, F.lit(1))
        .when(F.col("area2_q") < 0, F.lit(-1))
        .otherwise(F.lit(0)).alias("winding"),
    )


def frechet_to_ref(points: DataFrame, ref: list[tuple[float, float]],
                   user: str = "user_id", ts: str = "ts",
                   order_tiebreak: str = "event_id",
                   lat: str = "lat", lng: str = "lng") -> DataFrame:
    """Discrete Fréchet distance (Eiter & Mannila 1994) between each
    user's (ts, id)-ordered trajectory and a fixed reference path —
    the trajectory-similarity operator (route matching, anomaly
    detection) the simplify/resample family doesn't cover.

    Determinism spec: the point-pair distance matrix is FLOORED to
    integer meters before the DP, so the max/min coupling recursion is
    pure int64 — the oracle twin (goldens.frechet_to_ref_py, a
    recursive-memo implementation vs this iterative one) reproduces
    the result exactly; an engine trig ulp can only matter when a
    distance lands within 1 ulp of an exact integer meter.

    Plan: ONE shuffle on the user key into an Arrow-batched grouped
    kernel, O(n_pts x len(ref)) ints per group.

    Returns (user, n_pts, frechet_m)."""
    import numpy as np
    import pandas as pd

    rla = np.radians(np.array([p[0] for p in ref], np.float64))
    rln = np.radians(np.array([p[1] for p in ref], np.float64))
    if not ref:
        raise ValueError("frechet_to_ref: ref path must be non-empty")
    m = len(ref)
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    d = points.select(
        user, us.alias("_us"),
        F.col(order_tiebreak).alias("_tb"),
        F.col(lat).alias("_la"), F.col(lng).alias("_ln"),
    )
    ucol = user

    def _k(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_us", "_tb"])
        la = np.radians(pdf["_la"].to_numpy(np.float64))[:, None]
        ln = np.radians(pdf["_ln"].to_numpy(np.float64))[:, None]
        sd_la = np.sin((rla[None, :] - la) / 2.0)
        sd_ln = np.sin((rln[None, :] - ln) / 2.0)
        a = sd_la * sd_la + np.cos(la) * np.cos(rla[None, :]) \
            * sd_ln * sd_ln
        dist = 2.0 * 6371000.0 * np.arcsin(np.minimum(1.0, np.sqrt(a)))
        D = np.floor(dist).astype(np.int64)
        n = D.shape[0]
        # the coupling DP is sequential in both axes; Python ints over
        # lists beat numpy scalar indexing ~8x at the typical m<=50
        Dl = D.tolist()
        row = list(Dl[0])
        for j in range(1, m):
            if row[j - 1] > row[j]:
                row[j] = row[j - 1]
        for i in range(1, n):
            di = Dl[i]
            prev = row
            v, p = di[0], prev[0]
            left = p if p > v else v
            row = [left] * m
            for j in range(1, m):
                pj, pj1 = prev[j], prev[j - 1]
                t = pj if pj < pj1 else pj1
                if left < t:
                    t = left
                v = di[j]
                left = t if t > v else v
                row[j] = left
        return pd.DataFrame({
            ucol: [pdf[ucol].iloc[0]],
            "n_pts": np.array([n], np.int64),
            "frechet_m": np.array([row[m - 1]], np.int64),
        })

    utype = d.schema[ucol].dataType.simpleString()  # keep the key's real type
    return d.groupBy(ucol).applyInPandas(
        _k, f"{ucol} {utype}, n_pts long, frechet_m long")


def hausdorff_to_ref(points: DataFrame, ref: list[tuple[float, float]],
                     user: str = "user_id", id_col: str = "event_id",
                     lat: str = "lat", lng: str = "lng") -> DataFrame:
    """Symmetric discrete Hausdorff distance between each user's point
    set and a fixed reference path — the ORDER-INSENSITIVE
    trajectory/footprint similarity complementing frechet_to_ref
    (which pays for visiting order): h(A,B) = max_a min_b d(a, b),
    hausdorff = max(h(traj, ref), h(ref, traj)).

    Determinism spec: every pairwise distance floors to integer meters
    (frechet's quantized-compare trick) before the min/max trees, so
    the whole reduction is BIGINT and the DuckDB twin is
    bit-identical; an engine trig ulp only matters when a distance
    lands within 1 ulp of an exact integer meter.

    Plan: NO join and NO Python — the m reference vertices explode
    from an array literal (n x m narrow codegen rows), then two
    partial-aggregatable reductions: groupBy(user, id) min combines
    map-side to n rows before its exchange, groupBy(user, ref_idx)
    min to <= users x m rows; each per-user max reuses its groupBy's
    user-key clustering.  Shuffle volume is n + u*m however large m.
    The two directed reductions each re-derive the n x m distance rows
    from their own narrow scan (no shared exchange): 2x the codegen'd
    haversine work in exchange for ZERO materialization of the n x m
    relation — the right trade while the distance evaluation is
    cheaper than spooling n*m rows (it is, up to m in the hundreds;
    measured 4.7s for 12M x 40 both directions).

    Returns (user, n_pts, h_traj_ref_m, h_ref_traj_m, hausdorff_m)."""
    from .functions.kernels import distance

    if not ref:
        raise ValueError("hausdorff_to_ref: ref path must be non-empty")

    ref_arr = F.array(*[
        F.struct(F.lit(i).alias("i"),
                 F.lit(float(la)).alias("rla"),
                 F.lit(float(ln)).alias("rln"))
        for i, (la, ln) in enumerate(ref)
    ])
    d = points.select(
        user, F.col(id_col).alias("_id"),
        F.col(lat).alias("_la"), F.col(lng).alias("_ln"),
    ).withColumn("_r", F.explode(ref_arr)).select(
        user, "_id", F.col("_r.i").alias("_ri"),
        F.floor(distance(F.col("_la"), F.col("_ln"),
                         F.col("_r.rla"), F.col("_r.rln")))
        .cast("long").alias("_dm"),
    )
    fwd = d.groupBy(user, "_id").agg(F.min("_dm").alias("_near")) \
        .groupBy(user).agg(F.count("*").alias("n_pts"),
                           F.max("_near").alias("h_traj_ref_m"))
    bwd = d.groupBy(user, "_ri").agg(F.min("_dm").alias("_near")) \
        .groupBy(user).agg(F.max("_near").alias("h_ref_traj_m"))
    return fwd.join(bwd, user).select(
        user, "n_pts", "h_traj_ref_m", "h_ref_traj_m",
        F.greatest("h_traj_ref_m", "h_ref_traj_m").alias("hausdorff_m"))
