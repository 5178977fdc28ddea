"""Distributed geo clustering (SURVEY §2.7 C1, src/cluster_nearby.cc).

Reference semantics: (1) single-linkage pass — any two points within
``max_dist`` (float32 haversine, bbox prefilter) belong to one SL
cluster; (2) per-SL-cluster complete-linkage agglomerative refinement;
SL groups < 3 short-circuit.

Distributed re-expression:
  stage 1 = connected components over the "pairs within max_dist"
  graph. Edges come from a cell self-join (each point joined to the
  3x3 cell neighborhood at a zoom sized to max_dist) — no O(n²) pass.
  Components via GRAPH CONTRACTION: exact union-find per coarse
  spatial region in ``applyInPandas`` (edges are short, so locality
  is inherent), then the small cross-region contracted graph is
  finished with driver-side union-find (bounded by a budget guard —
  it scales with region borders, not data volume).

  stage 2 = per-component refinement in ``applyInPandas`` running the
  exact reference algorithm (vectorized numpy float32 twin); groups
  above ``max_refine_size`` keep their single-linkage label (the
  reference's quadratic refinement is undefined-behavior territory on
  percolated giant components).

Labels are canonicalized to the minimum member id per cluster, which
equals the reference's labeling up to relabeling (tests canonicalize
both sides).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geospark.functions import numpy_kernels as NK


def _zoom_for_dist(max_dist_m: float) -> int:
    """Zoom whose EQUATORIAL cell edge is ~max_dist. NOTE mercator
    cells shrink in ground meters as cos(lat) on BOTH axes, so a fixed
    3x3 neighborhood under-covers at high latitude (a measured missed-
    edge bug at lat 60) — the edge build therefore uses the latitude-
    aware buffered-bbox COVER below, which enumerates however many
    cells the disk needs at the point's latitude. The zoom cap is 22
    (grids finer than z16 are plain uniform grids, not quadkey levels)
    so metre-scale radii in dense cities don't quadratically blow up
    inside coarse cells."""
    earth = 40075016.686
    z = 0
    while z < 22 and earth / (1 << (z + 1)) >= max_dist_m:
        z += 1
    return z


def _neighbor_cells_expr(zoom: int, max_dist_m: float):
    """For each point emit the cell COVER of its max_dist disk (for the
    edge self-join). Fully vectorized (numpy broadcast + Arrow
    ListArray, no per-row Python).

    The cover only needs to contain the REFERENCE's own f32 prefilter
    box (compute_bounding_box_f, src/cluster_nearby.cc:42-56): the edge
    predicate is exactly (a in f32-box of b) AND f32-dist <= max, so a
    pair outside that box is not an edge upstream either. The bbox here
    therefore DOMINATES it analytically instead of paying a whole pad
    ring of cells (measured 52s -> edges at 12M points, ~16 cells/point
    at z21 with pad=1 vs ~4-9 without):
      - lat: 1/111000 deg/m > the reference's 1/111194.9 (180/pi/R);
      - lng: 1/(111194·min(cos(lat±d))) >= 1/(111194.9·cos(lat)), the
        min-cos side covering both box edges at once;
      - ±2e-5 deg absolute slack (~2.2 m) covers float32 COORDINATE
        quantization of both endpoints (~0.33 m each at |lat| 50) plus
        f32 arithmetic rounding of the box itself.
    Cell-boundary safety needs no pad: cell_tile_of_latlng is monotone
    in lat/lng, so every cell intersecting the bbox rectangle is
    enumerated inclusively from its corners."""
    from pyspark.sql.functions import pandas_udf

    from geospark.joins import cover_cells_series

    @pandas_udf("array<long>")
    def _neigh(lat: pd.Series, lng: pd.Series) -> pd.Series:
        la = lat.to_numpy(np.float64)
        ln = lng.to_numpy(np.float64)
        slack = 2e-5
        d_lat = max_dist_m / 111000.0 + slack
        lat_lo, lat_hi = la - d_lat, la + d_lat
        coslat = np.maximum(
            np.minimum(np.cos(np.radians(lat_lo)), np.cos(np.radians(lat_hi))),
            1e-9,
        )
        d_lng = np.abs(max_dist_m / (111194.0 * coslat)) + slack / coslat
        return cover_cells_series(
            lat_lo, ln - d_lng, lat_hi, ln + d_lng, zoom, pad=0
        )

    return _neigh


def cluster_nearby(points: DataFrame, max_dist_m: float,
                   id_col: str = "point_id", lat: str = "lat",
                   lng: str = "lng", max_refine_size: int = 1000,
                   contract_budget: int = 2_000_000,
                   second_round_threshold: int = 100_000,
                   python_buckets: int = 128,
                   verbose: bool = False) -> DataFrame:
    """Returns ``(id_col, cluster_id)`` with cluster_id = min member id.

    Two-stage plan as described in the module docstring. The label
    propagation loop runs driver-side but only moves (id, label) pairs
    through joins — never collects data rows.
    """
    from geospark.functions import kernels as K

    from geospark.cells import with_linear_cell_at_zoom

    zoom = _zoom_for_dist(max_dist_m)
    pts = with_linear_cell_at_zoom(
        points.select(
            F.col(id_col).alias("pid"), F.col(lat).alias("plat"),
            F.col(lng).alias("plng"),
        ),
        zoom, lat="plat", lng="plng", col="cell",
    )

    # region = linear cell id at a 16x-coarser zoom, computed as a pure
    # Column expr on BOTH edge endpoints up front (no node-table joins)
    region_zoom = max(zoom - 4, 0)
    shift = zoom - region_zoom

    def _region_of(cell_col):
        tx = F.pmod(cell_col, F.lit(1 << zoom))
        ty = (cell_col - tx) / F.lit(1 << zoom)
        return (
            F.shiftleft(F.shiftright(ty.cast("long"), shift), region_zoom)
            + F.shiftright(tx.cast("long"), shift)
        )

    # edges: a in cell c, b covering a's max_dist disk; region_b MUST be
    # derived from q's own FINE cell via the same shift `_region_of`
    # uses on the p side. Projecting directly at region_zoom is NOT
    # equivalent for zoom > 16: pixel-y ROUNDS at each projection zoom,
    # so shifts don't compose across independently-projected zooms
    # (~1/32 of points land in a different region at z17). A mismatched
    # region_b misclassifies internal edges, handing one pid to two
    # union-find buckets → conflicting roots → duplicate output rows.
    neigh = with_linear_cell_at_zoom(
        points, zoom, lat=lat, lng=lng, col="_qcell"
    ).select(
        F.col(id_col).alias("qid"), F.col(lat).alias("qlat"),
        F.col(lng).alias("qlng"),
        _region_of(F.col("_qcell")).alias("region_b"),
        F.explode(
            _neighbor_cells_expr(zoom, max_dist_m)(F.col(lat), F.col(lng))
        ).alias("cell"),
    )

    # float32 haversine parity: refine with float64 expr then confirm
    # with the float32 kernel; the float64 prefilter slack must cover
    # the float32 COORDINATE quantization error (~1-2 m at mid/high
    # latitude), not just the arithmetic rounding — edges the reference
    # accepts at d32 <= max_dist must survive to the exact f32 check.
    slack = max_dist_m * (1.0 + 1e-4) + 5.0
    edges = (
        pts.join(neigh, "cell")
        .filter(F.col("pid") < F.col("qid"))
        .withColumn("d", K.distance(F.col("plat"), F.col("plng"),
                                    F.col("qlat"), F.col("qlng")))
        .filter(F.col("d") <= slack)
        .select("pid", "qid", "plat", "plng", "qlat", "qlng",
                _region_of(F.col("cell")).alias("region_a"), "region_b")
    )
    # exact float32 edge predicate (gc_distance_f, cluster_nearby.cc:32-40)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def _f32_within(alat: pd.Series, alng: pd.Series, blat: pd.Series,
                    blng: pd.Series) -> pd.Series:
        # replicate the SL loop exactly (cluster_nearby.cc:66-81):
        # bbox around the LATER point (b = higher id) prefilters the
        # earlier candidate a, then float32 haversine decides.
        a_lat = alat.to_numpy(np.float32)
        a_lng = alng.to_numpy(np.float32)
        b_lat = blat.to_numpy(np.float32)
        b_lng = blng.to_numpy(np.float32)
        lat_max, lat_min, lng_max, lng_min = NK.compute_bounding_box_f(
            b_lat, b_lng, np.float32(max_dist_m)
        )
        in_box = (
            (a_lat >= lat_min) & (a_lat <= lat_max)
            & (a_lng >= lng_min) & (a_lng <= lng_max)
        )
        d = NK.gc_distance_f(b_lat, b_lng, a_lat, a_lng)
        return pd.Series(in_box & (np.asarray(d) <= np.float32(max_dist_m)))

    # no distinct needed: q's cover list holds unique cells, so each
    # (pid, qid) pair joins exactly once (p's single cell matches at
    # most one entry of q's cover)
    edges = edges.filter(_f32_within(F.col("plat"), F.col("plng"),
                                     F.col("qlat"), F.col("qlng"))) \
                 .select("pid", "qid", "region_a", "region_b")

    # ---- stage 1b: connected components by GRAPH CONTRACTION --------------
    # Flat label propagation needs O(component diameter) rounds — measured
    # oscillating and exploding past ~20 rounds at sf0.1 density. Instead:
    #   (a) group nodes + intra-region edges by a coarse spatial region
    #       (edges are <= max_dist long, so locality is inherent) and run
    #       an exact union-find per region in applyInPandas;
    #   (b) contract: map the few cross-region edges through the local
    #       roots — the contracted graph holds only border components, a
    #       tiny fraction of the input;
    #   (c) if the contracted graph is still large, run a SECOND
    #       distributed round: group its edges by a 16x-coarser region
    #       of the root and reduce each group to its union-find spanning
    #       pairs (same connectivity, ~#nodes instead of #edges rows);
    #   (d) driver union-find on the (doubly) contracted remainder,
    #       then compose final labels.
    # At 1000x data the region zoom grows with density so per-region
    # union-find groups stay bounded; the driver collect is two
    # contraction levels removed from data volume.
    import time as _time

    from geospark.spool import spool

    _t_edges = _time.time()
    edges = spool(edges, "cluster_edges")
    if verbose:
        print(f"cluster_nearby: edges materialized in "
              f"{_time.time() - _t_edges:.1f}s")
    internal = edges.filter(F.col("region_a") == F.col("region_b")).select(
        "region_a", "pid", "qid"
    )
    # cross edges keep the p-side region: root_a stays inside it (the
    # local root is the min pid of a within-region component), so the
    # second contraction round can re-key by region WITHOUT a join
    cross = edges.filter(F.col("region_a") != F.col("region_b")).select(
        "pid", "qid", "region_a"
    )

    # (a) union-find over internal EDGES only, batched by hashed-region
    # BUCKETS. Two measured pathologies avoided: (1) isolated points
    # (the overwhelming majority at sub-percolation thresholds) never
    # enter Python — applyInPandas pays ~1-5 ms per GROUP, so feeding
    # every occupied region cost 20x the edge work itself; points
    # without an internal edge are their own root, handled relationally
    # by the left-join + coalesce in (b)/(d); (2) one group per region
    # still meant thousands of Arrow round trips, so regions are hashed
    # into ``python_buckets`` groups and union-find runs per bucket —
    # valid because a pid's internal edges all live in its own region
    # (bucket-internal cross-region merges are real merges; the
    # contraction phases accept any partial merge).
    def _local_cc(pdf: pd.DataFrame) -> pd.DataFrame:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        pids = pdf["pid"].to_numpy()
        qids = pdf["qid"].to_numpy()
        for p, q in zip(pids, qids):
            ra, rb = find(int(p)), find(int(q))
            if ra != rb:
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        nodes = np.unique(np.concatenate([pids, qids])).astype(np.int64)
        return pd.DataFrame({
            "pid": nodes,
            "root": np.array([find(int(p)) for p in nodes], dtype=np.int64),
        })

    _t_local = _time.time()
    local = (
        internal.withColumn(
            "_b", F.pmod(F.hash("region_a"), F.lit(python_buckets))
        )
        .groupBy("_b")
        .applyInPandas(_local_cc, "pid long, root long")
    )
    local = spool(local, "cluster_local_cc")
    if verbose:
        print(f"cluster_nearby: local CC in {_time.time() - _t_local:.1f}s")

    # (b) contracted graph: cross edges through local roots (left join:
    # endpoints with no internal edge are their own root)
    contracted = (
        cross.alias("c")
        .join(local.alias("la"), F.col("c.pid") == F.col("la.pid"), "left")
        .join(local.alias("lb"), F.col("c.qid") == F.col("lb.pid"), "left")
        .select(
            F.coalesce(F.col("la.root"), F.col("c.pid")).alias("root_a"),
            F.coalesce(F.col("lb.root"), F.col("c.qid")).alias("root_b"),
            F.col("c.region_a").alias("region_a"),
        )
        .filter(F.col("root_a") != F.col("root_b"))
        .distinct()
    )
    contracted = spool(contracted, "cluster_contracted")
    n_contracted = contracted.count()
    if verbose:
        print(f"cluster_nearby: edges+local CC in {_time.time() - _t_edges:.1f}s; "
              f"contracted edges={n_contracted}")

    # (c) ADAPTIVE contraction: while the border graph is still big,
    # group contracted edges by the root's region at a 16x-coarser
    # zoom and reduce each group to its union-find spanning pairs —
    # connectivity-preserving, but ~#distinct-nodes rows instead of
    # #edges. Loops until the graph fits the driver budget or the
    # region grid collapses to a single cell (at which point one last
    # reduce has already shrunk the graph to a spanning forest — the
    # minimum representation of its connectivity).
    def _reduce_edges(pdf: pd.DataFrame) -> pd.DataFrame:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        for a, b in zip(pdf["root_a"].to_numpy(), pdf["root_b"].to_numpy()):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        nodes = np.unique(
            np.concatenate([pdf["root_a"].to_numpy(), pdf["root_b"].to_numpy()])
        ).astype(np.int64)
        roots = np.array([find(int(x)) for x in nodes], dtype=np.int64)
        m = nodes != roots
        return pd.DataFrame({
            "region": np.full(int(m.sum()), int(pdf["region"].iloc[0]),
                              dtype=np.int64),
            "root_a": nodes[m],
            "root_b": roots[m],
        })

    cur_zoom = region_zoom
    contracted = contracted.withColumnRenamed("region_a", "region")
    threshold = max(second_round_threshold, 1)
    while n_contracted > threshold and cur_zoom > 0:
        rz2 = max(cur_zoom - 4, 0)
        shift2 = cur_zoom - rz2

        # root_a lives in the cross edge's own region (carried on the
        # contracted rows) — re-key by column expr, no join
        tx = F.pmod(F.col("region"), F.lit(1 << cur_zoom))
        ty = (F.col("region") - tx) / F.lit(1 << cur_zoom)
        region2 = (
            F.shiftleft(F.shiftright(ty.cast("long"), shift2), rz2)
            + F.shiftright(tx.cast("long"), shift2)
        )
        e2 = contracted.select(
            region2.alias("region"), "root_a", "root_b"
        )
        contracted = spool(
            e2.groupBy("region").applyInPandas(
                _reduce_edges, "region long, root_a long, root_b long"
            ),
            "cluster_contracted",
        )
        prev, n_contracted = n_contracted, contracted.count()
        cur_zoom = rz2
        if verbose:
            print(f"cluster_nearby: contraction round at rz{rz2}: "
                  f"{prev} -> {n_contracted} edges")
        if n_contracted >= prev:
            break  # spanning forest reached — coarsening can't shrink it

    # (d) finish the contracted remainder with driver-side union-find.
    # Contraction shrinks the graph to cross-region border components
    # only — scales with region perimeters, not area; each round (c)
    # takes the collect another level away from data volume. The budget
    # guard is the honest backstop for a graph whose spanning forest
    # itself exceeds driver memory.
    spark = points.sparkSession
    c_rows = contracted.select("root_a", "root_b").limit(
        contract_budget + 1
    ).collect()
    if len(c_rows) > contract_budget:
        raise RuntimeError(
            f"cluster_nearby: contracted graph exceeds budget "
            f"({contract_budget}) even after contracting to region zoom "
            f"{cur_zoom}; the spanning forest itself is that large — "
            f"raise contract_budget"
        )
    parent: dict[int, int] = {}

    def _find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for row in c_rows:
        ra, rb = _find(int(row["root_a"])), _find(int(row["root_b"]))
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    mapping = [(n, _find(n)) for n in list(parent)]
    if verbose:
        print(f"cluster_nearby: driver union-find on {len(c_rows)} contracted "
              f"edges -> {len(mapping)} remapped roots")

    # (d) compose: pid -> local root (own pid if edge-free) ->
    # contracted component label
    base = (
        pts.select("pid").alias("b")
        .join(local.alias("l"), F.col("b.pid") == F.col("l.pid"), "left")
        .select(
            F.col("b.pid").alias("pid"),
            F.coalesce(F.col("l.root"), F.col("b.pid")).alias("root"),
        )
    )
    if mapping:
        remap = spark.createDataFrame(mapping, "root_j long, label long")
        labels = (
            base.join(F.broadcast(remap), F.col("root") == F.col("root_j"), "left")
            .select(
                "pid",
                F.coalesce(F.col("label"), F.col("root")).alias("label"),
            )
        )
    else:
        labels = base.select("pid", F.col("root").alias("label"))

    # stage 2: complete-linkage refinement per SL component.
    # Most components are singletons/pairs — those short-circuit in the
    # reference (cluster_nearby.cc:203-207) to "one cluster", which for
    # min-canonical labels is just the SL label itself. Route them
    # RELATIONALLY (a window count, no Python): per-group applyInPandas
    # overhead on ~10^5 tiny groups was ~1 ms/group == minutes.
    from pyspark.sql import Window

    _t_member = _time.time()
    member = points.select(
        F.col(id_col).alias("pid"), F.col(lat).alias("plat"),
        F.col(lng).alias("plng"),
    ).join(labels, "pid")
    w = Window.partitionBy("label")
    # materialize once: the small/big branches below would otherwise
    # each replay the label-composition joins + the window count
    member = spool(
        member.withColumn("_n", F.count("*").over(w)), "cluster_member"
    )
    if verbose:
        print(f"cluster_nearby: member labels in {_time.time() - _t_member:.1f}s")

    small = member.filter(F.col("_n") < 3).select(
        "pid", F.col("label").alias("cluster_id")
    )
    big = member.filter(F.col("_n") >= 3).drop("_n")

    # batch SL components per Python call (hash-bucketed labels), and
    # work on RAW numpy segments: a pandas groupby + DataFrame per
    # component costs ~0.3-1 ms — at 60M points the refine stage holds
    # millions of 3-point components and that overhead alone was ~370s
    # of a 566s run. Segments come from one sort + boundary scan;
    # 3-point components (the dominant class) skip per-component
    # python entirely via the closed-form table below.
    def refine_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["label", "pid"])
        lab = pdf["label"].to_numpy(np.int64)
        pid = pdf["pid"].to_numpy(np.int64)
        la = pdf["plat"].to_numpy(np.float32)
        ln = pdf["plng"].to_numpy(np.float32)
        n_rows = lab.size
        out = np.empty(n_rows, np.int64)
        if n_rows == 0:
            return pd.DataFrame({"pid": pid, "cluster_id": out})
        starts = np.flatnonzero(np.r_[True, lab[1:] != lab[:-1]])
        ends = np.r_[starts[1:], n_rows]
        sizes = ends - starts
        # components of size 3..16 (the overwhelming majority) run
        # BATCHED: padded (m, K, K) tensors, no per-component python.
        # Components above max_refine_size keep SL labels (handled by
        # the loop's shortcut), so they must NOT enter the batch.
        K = 16
        mb = sizes <= min(K, max_refine_size)
        sb, szb = starts[mb], sizes[mb]
        if sb.size:
            idx = sb[:, None] + np.arange(K)[None, :]
            idx = np.minimum(idx, (sb + szb - 1)[:, None])  # clamp padding
            cl = NK.make_complete_linkage_clusters_batch(
                la[idx], ln[idx], szb, max_dist_m
            )
            # canonical min-pid label: pids are sorted within the
            # segment, so it's the pid at the FIRST position sharing
            # the cluster index (argmax of the first True)
            fp = (cl[:, None, :] == cl[:, :, None]).argmax(axis=2)
            outb = pid[idx][np.arange(sb.size)[:, None], fp]
            pos = np.arange(K)[None, :] < szb[:, None]
            out[idx[pos]] = outb[pos]
        for s, e in zip(starts[~mb], ends[~mb]):
            n = int(e - s)
            if n > max_refine_size:
                # the reference's complete-linkage is O(n²·rounds) —
                # intractable for percolated giant components; keep the
                # single-linkage label (documented deviation, only
                # reachable when max_dist percolates).
                out[s:e] = pid[s:e].min()
                continue
            cl = NK.make_complete_linkage_clusters(la[s:e], ln[s:e], max_dist_m)
            p = pid[s:e]
            seg = out[s:e]
            for c in np.unique(cl):
                msk = cl == c
                seg[msk] = p[msk].min()
        return pd.DataFrame({"pid": pid, "cluster_id": out})

    # explicit repartition count: AQE otherwise coalesces this tiny
    # shuffle to ~3 tasks and serializes the Python work
    fanout = max(points.sparkSession.sparkContext.defaultParallelism, 8)
    refined = (
        big.withColumn("_b", F.pmod(F.hash("label"), F.lit(python_buckets)))
        .repartition(fanout, "_b")
        .groupBy("_b")
        .applyInPandas(refine_bucket, "pid long, cluster_id long")
    )
    result = small.unionByName(refined.select("pid", "cluster_id"))
    return result.select(F.col("pid").alias(id_col), "cluster_id")
