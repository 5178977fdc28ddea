"""HMM (Viterbi) map matching — trajectory-aware GPS -> road snapping.

Independent per-point snapping (joins.match_points_to_segments) picks
the NEAREST segment, which zig-zags between parallel roads whenever
GPS noise exceeds the road spacing. The standard fix (Newson & Krumm,
GIS 2009) treats matching as a hidden Markov model: road candidates
are states, GPS distance is the emission cost, and route plausibility
is the transition cost; the Viterbi path through the trellis is the
jointly most plausible road sequence — continuity beats per-point
greed.

This implementation, Spark-first:

- CANDIDATES are a distributed filter-refine join: corridor_join
  (multi-zoom cell cover + exact closest-on-segment refine) keeps
  every line within ``max_m`` of each point with that line's nearest
  segment, then a per-point window keeps the ``k`` nearest lines —
  the trellis never materializes more than k states per observation.
- COSTS are integers (the module's engine-exact discipline):
  emission = floor(snap_dist_m) METERS; transition between
  consecutive observations = |floor(gc(snap_t, snap_t+1)) -
  floor(gc(obs_t, obs_t+1))| meters — the great-circle proxy for the
  Newson-Krumm "route distance vs point distance" penalty (exact
  route distance needs a network shortest path per pair; the proxy
  keeps the operator a pure join + DP and is the documented
  simplification), scaled by ``trans_weight`` in percent. Meter
  granularity is the map_match dist_floor_m convention — coarse
  enough that cross-engine libm ulp differences can't flip a floor.
- The DP runs per trajectory in ONE Arrow-batched applyInPandas
  group: O(len * k^2) integer ops on numpy int64 — the only shuffle
  after the candidate join is the groupBy(user). Ties break on the
  lower line_id at every argmin, so the path is a pure function of
  the data in any engine (the plain-Python twin
  goldens.viterbi_match_py replays it bit-identically).

100-TB shape: candidates are output-linear in (points x k); each
trajectory's trellis is tiny (k small) and trajectories are the
parallelism axis. A degenerate mega-trajectory bounds at
O(len * k^2) inside one task — len-sharding with boundary overlap is
the documented extension, not needed at GPS-trace lengths.

Reference analogue: L6 distance_to_polyline (polyline.h:79-96)
supplies the emission geometry; the reference has no trajectory
matcher — this is the engine extension the training-data pipeline
needs for GPS/trace corpora.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_R = 6371000.0


def _hav_np(la1, ln1, la2, ln2):
    dla = np.radians(la2 - la1) / 2.0
    dln = np.radians(ln2 - ln1) / 2.0
    a = (np.sin(dla) ** 2
         + np.cos(np.radians(la1)) * np.cos(np.radians(la2))
         * np.sin(dln) ** 2)
    return 2.0 * _R * np.arcsin(np.minimum(1.0, np.sqrt(a)))


def viterbi_path(seq: np.ndarray, line: np.ndarray, emit_m: np.ndarray,
                 c_lat: np.ndarray, c_lng: np.ndarray,
                 p_lat: np.ndarray, p_lng: np.ndarray,
                 trans_weight: int) -> np.ndarray:
    """Viterbi over one trajectory's candidate trellis. Inputs are
    parallel arrays over candidate rows (seq = observation index,
    dense from 0, sorted ascending; observations with zero candidates
    were never emitted by the join and simply don't appear). Returns a
    boolean keep-mask selecting the winning candidate per observation.

    Integer cost DP: cost[j] = emit_m[j] + min_i(cost[i] +
    trans_weight * |d_cc - d_pp| // 100), meter-floored distances
    (the map_match dist_floor_m convention — coarse enough that
    cross-engine libm ulp differences can't flip a floor), ties to
    the candidate with
    the LOWER line_id (achieved by stable order: candidates are
    processed sorted by (seq, line)). All arithmetic is int64."""
    n = len(seq)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    # observation boundaries (seq sorted ascending)
    starts = np.flatnonzero(np.r_[True, seq[1:] != seq[:-1]])
    ends = np.r_[starts[1:], n]
    n_obs = len(starts)
    cost = emit_m[starts[0]:ends[0]].astype(np.int64).copy()
    back: list[np.ndarray] = []
    for t in range(1, n_obs):
        a, b = starts[t - 1], ends[t - 1]
        c, d = starts[t], ends[t]
        # great-circle between snapped candidates (k_prev x k_cur)
        d_cc = _hav_np(
            c_lat[a:b, None], c_lng[a:b, None],
            c_lat[None, c:d], c_lng[None, c:d],
        )
        d_pp = _hav_np(p_lat[a], p_lng[a], p_lat[c], p_lng[c])
        trans = (
            np.abs(np.floor(d_cc).astype(np.int64)
                   - np.int64(np.floor(d_pp)))
            * trans_weight // 100
        )
        tot = cost[:, None] + trans  # k_prev x k_cur
        best_i = np.argmin(tot, axis=0)  # first (lowest line) on ties
        cost = tot[best_i, np.arange(d - c)] + emit_m[c:d]
        back.append(best_i)
    # backtrack: ties at the end -> first index (lowest line_id)
    j = int(np.argmin(cost))
    keep[starts[n_obs - 1] + j] = True
    for t in range(n_obs - 2, -1, -1):
        j = int(back[t][j])
        keep[starts[t] + j] = True
    return keep


def viterbi_map_match(points: DataFrame, segments: DataFrame,
                      max_m: float, k: int = 3,
                      trans_weight: int = 100,
                      user_col: str = "user_id",
                      seq_col: str = "seq",
                      point_id: str = "point_id",
                      lat: str = "lat", lng: str = "lng",
                      **corridor_kw) -> DataFrame:
    """HMM map matching: candidates via the distributed corridor join,
    per-trajectory Viterbi in an Arrow-batched grouped kernel.

    ``points`` needs (user_col, seq_col, point_id, lat, lng) — seq
    orders the observations inside a trajectory. Returns
    (user_id, seq, point_id, line_id, seg_idx, dist_m, c_lat, c_lng)
    with exactly one row per observation that had >= 1 candidate.

    ``trans_weight`` is the transition cost in percent of the meter
    gap: 100 weighs 1 m of route-vs-point disagreement like 1 m of
    snap distance.

    REQUIREMENT: ``point_id`` must be GLOBALLY unique across users
    (not merely unique within a trajectory) — the per-point top-k
    candidate window partitions by point_id alone, BEFORE the
    metadata join, so the window prunes the raw candidate relation to
    <= k rows per observation and the join never materializes
    unpruned candidates (the window-after-join variant that relaxes
    the uniqueness requirement measured 1.8x slower at 12M
    observations: the join and its sort then run on every corridor
    candidate instead of k per point). The Viterbi DP itself runs in
    user-hash BUCKETS of ~one-per-core, many trajectories per Arrow
    batch: per-group applyInPandas overhead (~5 ms/group) dominated
    the wall at 1500 single-trajectory groups — bucketing cut the
    stage from ~6 s to <1 s at sf0.1 with identical output."""
    from geospark.joins import corridor_join

    cand = corridor_join(points, segments, max_m,
                         point_id=point_id, lat=lat, lng=lng,
                         **corridor_kw)
    w = Window.partitionBy("point_id").orderBy("dist_m", "line_id")
    cand = (
        cand.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= int(k)).drop("_rk")
    )
    meta = points.select(
        F.col(point_id).alias("point_id"),
        F.col(user_col).alias("_u"),
        F.col(seq_col).alias("_seq"),
        F.col(lat).alias("_p_lat"),
        F.col(lng).alias("_p_lng"),
    )
    tre = cand.join(meta, "point_id")
    tw = int(trans_weight)
    n_buckets = points.sparkSession.sparkContext.defaultParallelism

    out_schema = (
        "user_id long, seq long, point_id long, line_id long, "
        "seg_idx int, dist_m double, c_lat double, c_lng double"
    )

    def _match(key, pdf):
        # one BUCKET of trajectories per call: sort by (user, seq,
        # line) once, run the per-trajectory DP on numpy slices at the
        # user boundaries — same output as per-user grouping, ~50x
        # fewer Python invocations
        pdf = pdf.sort_values(["_u", "_seq", "line_id"], kind="mergesort")
        u = pdf["_u"].to_numpy(np.int64)
        seq_raw = pdf["_seq"].to_numpy(np.int64)
        line = pdf["line_id"].to_numpy(np.int64)
        dist_i = np.floor(pdf["dist_m"].to_numpy(np.float64)).astype(np.int64)
        cla = pdf["c_lat"].to_numpy(np.float64)
        cln = pdf["c_lng"].to_numpy(np.float64)
        pla = pdf["_p_lat"].to_numpy(np.float64)
        pln = pdf["_p_lng"].to_numpy(np.float64)
        keep = np.zeros(len(u), dtype=bool)
        starts = np.r_[0, np.flatnonzero(u[1:] != u[:-1]) + 1, len(u)]
        for s, e in zip(starts[:-1], starts[1:]):
            sr = seq_raw[s:e]
            # densify seq (observations with no candidates collapse)
            seq = np.cumsum(np.r_[0, sr[1:] != sr[:-1]])
            keep[s:e] = viterbi_path(
                seq, line[s:e], dist_i[s:e], cla[s:e], cln[s:e],
                pla[s:e], pln[s:e], tw,
            )
        sel = pdf[keep]
        return pd.DataFrame({
            "user_id": sel["_u"].to_numpy(np.int64),
            "seq": sel["_seq"].to_numpy(np.int64),
            "point_id": sel["point_id"].to_numpy(np.int64),
            "line_id": sel["line_id"].to_numpy(np.int64),
            "seg_idx": sel["seg_idx"].to_numpy(np.int32),
            "dist_m": sel["dist_m"].to_numpy(np.float64),
            "c_lat": sel["c_lat"].to_numpy(np.float64),
            "c_lng": sel["c_lng"].to_numpy(np.float64),
        })

    return (
        tre.withColumn("_bk", F.pmod(F.xxhash64("_u"), F.lit(n_buckets)))
        .groupBy("_bk").applyInPandas(_match, out_schema)
    )
