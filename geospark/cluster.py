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
from geospark.joins import cell_tile_of_latlng, lin_id


def _zoom_for_dist(max_dist_m: float) -> int:
    """Finest zoom where a 3x3 cell neighborhood is guaranteed to
    contain every point within max_dist. Cell height at the equator is
    ~40075 km / 2^z; mercator cells only get shorter (in ground m)
    toward the poles in y... x-width in ground meters SHRINKS with
    latitude, so neighbor coverage in x holds everywhere; y coverage
    uses the equatorial minimum. Conservative: require cell edge ≥
    max_dist at the equator."""
    earth = 40075016.686
    z = 0
    while z < 15 and earth / (1 << (z + 1)) >= max_dist_m:
        z += 1
    return z


def _neighbor_cells_expr(zoom: int):
    """For each point emit its 3x3 neighbor cell ids (for the edge
    self-join): vectorized in a pandas UDF returning array<long>."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def _neigh(lat: pd.Series, lng: pd.Series) -> pd.Series:
        tx, ty = cell_tile_of_latlng(lat.to_numpy(), lng.to_numpy(), zoom)
        n = 1 << zoom
        out = []
        txv, tyv = np.asarray(tx), np.asarray(ty)
        for x, y in zip(txv, tyv):
            cells = set()
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    xx, yy = (int(x) + dx) % n, int(y) + dy
                    if 0 <= yy < n:
                        cells.add(lin_id(xx, yy, zoom))
            out.append(sorted(cells))
        return pd.Series(out)

    return _neigh


def cluster_nearby(points: DataFrame, max_dist_m: float,
                   id_col: str = "point_id", lat: str = "lat",
                   lng: str = "lng", max_refine_size: int = 1000,
                   contract_budget: int = 2_000_000,
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

    # edges: a in cell c, b in any of a's 3x3 neighborhood
    neigh = points.select(
        F.col(id_col).alias("qid"), F.col(lat).alias("qlat"),
        F.col(lng).alias("qlng"),
        F.explode(_neighbor_cells_expr(zoom)(F.col(lat), F.col(lng))).alias("cell"),
    )

    # float32 haversine parity: refine with float64 expr then confirm
    # with the float32 kernel only in the per-group stage; for edge
    # building use a slightly slack float64 threshold (float32 error
    # is ~1e-7 relative) — stage 2 re-evaluates distances exactly.
    slack = max_dist_m * (1.0 + 1e-5) + 1e-3
    edges = (
        pts.join(neigh, "cell")
        .filter(F.col("pid") < F.col("qid"))
        .withColumn("d", K.distance(F.col("plat"), F.col("plng"),
                                    F.col("qlat"), F.col("qlng")))
        .filter(F.col("d") <= slack)
        .select("pid", "qid", "plat", "plng", "qlat", "qlng")
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

    edges = edges.filter(_f32_within(F.col("plat"), F.col("plng"),
                                     F.col("qlat"), F.col("qlng"))) \
                 .select("pid", "qid").distinct()

    # ---- stage 1b: connected components by GRAPH CONTRACTION --------------
    # Flat label propagation needs O(component diameter) rounds — measured
    # oscillating and exploding past ~20 rounds at sf0.1 density. Instead:
    #   (a) group nodes + intra-region edges by a coarse spatial region
    #       (edges are <= max_dist long, so locality is inherent) and run
    #       an exact union-find per region in applyInPandas;
    #   (b) contract: map the few cross-region edges through the local
    #       roots — the contracted graph holds only border components, a
    #       tiny fraction of the input;
    #   (c) run min-label propagation on the CONTRACTED graph (cheap
    #       rounds, small diameter after contraction);
    #   (d) compose final labels.
    # At 1000x data the region zoom grows with density so per-region
    # union-find groups stay bounded; the contracted graph scales with
    # region-border point counts, not total points.
    import time as _time

    _t_edges = _time.time()
    edges = edges.localCheckpoint(eager=True)
    region_zoom = max(zoom - 4, 0)
    shift = zoom - region_zoom

    def _region_of(cell_col):
        tx = F.pmod(cell_col, F.lit(1 << zoom))
        ty = (cell_col - tx) / F.lit(1 << zoom)
        return (
            F.shiftleft(F.shiftright(ty.cast("long"), shift), region_zoom)
            + F.shiftright(tx.cast("long"), shift)
        )

    # lineage break: nodes shares ancestry with edges (both from pts);
    # checkpoint gives it fresh attribute ids so the double join below
    # is not an ambiguous self-join
    nodes = pts.select(
        "pid", _region_of(F.col("cell")).alias("region")
    ).localCheckpoint(eager=True)
    e_reg = (
        edges.alias("e")
        .join(nodes.alias("na"), F.col("e.pid") == F.col("na.pid"))
        .join(nodes.alias("nb"), F.col("e.qid") == F.col("nb.pid"))
        .select(
            F.col("e.pid").alias("pid"), F.col("e.qid").alias("qid"),
            F.col("na.region").alias("region_a"),
            F.col("nb.region").alias("region_b"),
        )
    )
    internal = e_reg.filter(F.col("region_a") == F.col("region_b")).select(
        "region_a", "pid", "qid"
    )
    cross = e_reg.filter(F.col("region_a") != F.col("region_b")).select(
        "pid", "qid"
    )

    # (a) per-region exact union-find over nodes + internal edges
    members = nodes.select("region", "pid", F.lit(None).cast("long").alias("qid"))
    payload = members.union(
        internal.select(F.col("region_a").alias("region"), "pid", "qid")
    )

    def _local_cc(pdf: pd.DataFrame) -> pd.DataFrame:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        def union(a: int, b: int) -> None:
            ra, rb = find(a), find(b)
            if ra != rb:
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb

        pids = pdf["pid"].to_numpy()
        qids = pdf["qid"].to_numpy()
        for p, q in zip(pids, qids):
            if q is None or (isinstance(q, float) and np.isnan(q)) or q < 0:
                parent.setdefault(int(p), int(p))
            else:
                union(int(p), int(q))
        uniq = np.unique(pids)
        return pd.DataFrame({
            "pid": uniq.astype(np.int64),
            "root": np.array([find(int(p)) for p in uniq], dtype=np.int64),
        })

    local = payload.groupBy("region").applyInPandas(
        _local_cc, "pid long, root long"
    ).localCheckpoint(eager=True)

    # (b) contracted graph: cross edges through local roots
    contracted = (
        cross.alias("c")
        .join(local.alias("la"), F.col("c.pid") == F.col("la.pid"))
        .join(local.alias("lb"), F.col("c.qid") == F.col("lb.pid"))
        .select(
            F.col("la.root").alias("root_a"), F.col("lb.root").alias("root_b")
        )
        .filter(F.col("root_a") != F.col("root_b"))
        .distinct()
    )
    if verbose:
        print(f"cluster_nearby: edges+local CC in {_time.time() - _t_edges:.1f}s; "
              f"contracted edges={contracted.count()}")

    # (c) finish the CONTRACTED graph with driver-side union-find.
    # Contraction shrinks the graph to cross-region border components
    # only — provably small relative to the input (scales with region
    # perimeters, not area). Collecting it is the standard finish for
    # graph contraction; the budget guard + coarser-region retry keep
    # the collect bounded at any input scale.
    spark = points.sparkSession
    c_rows = contracted.limit(contract_budget + 1).collect()
    if len(c_rows) > contract_budget:
        raise RuntimeError(
            f"cluster_nearby: contracted graph exceeds budget "
            f"({contract_budget}); re-run with a coarser region "
            f"(larger max_dist regions) or raise contract_budget"
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

    # (d) compose: pid -> local root -> contracted component label
    if mapping:
        remap = spark.createDataFrame(mapping, "root_j long, label long")
        labels = (
            local.alias("l")
            .join(F.broadcast(remap), F.col("l.root") == F.col("root_j"), "left")
            .select(
                F.col("l.pid").alias("pid"),
                F.coalesce(F.col("label"), F.col("l.root")).alias("label"),
            )
        )
    else:
        labels = local.select("pid", F.col("root").alias("label"))

    # stage 2: complete-linkage refinement per SL component.
    # Most components are singletons/pairs — those short-circuit in the
    # reference (cluster_nearby.cc:203-207) to "one cluster", which for
    # min-canonical labels is just the SL label itself. Route them
    # RELATIONALLY (a window count, no Python): per-group applyInPandas
    # overhead on ~10^5 tiny groups was ~1 ms/group == minutes.
    from pyspark.sql import Window

    member = points.select(
        F.col(id_col).alias("pid"), F.col(lat).alias("plat"),
        F.col(lng).alias("plng"),
    ).join(labels, "pid")
    w = Window.partitionBy("label")
    member = member.withColumn("_n", F.count("*").over(w))

    small = member.filter(F.col("_n") < 3).select(
        "pid", F.col("label").alias("cluster_id")
    )
    big = member.filter(F.col("_n") >= 3).drop("_n")

    def refine(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("pid").reset_index(drop=True)
        n = len(pdf)
        if n > max_refine_size:
            # the reference's complete-linkage is O(n²·rounds) —
            # intractable for percolated giant components; keep the
            # single-linkage label (documented deviation, only
            # reachable when max_dist percolates).
            return pd.DataFrame({
                "pid": pdf["pid"],
                "cluster_id": np.full(n, int(pdf["pid"].min()), dtype=np.int64),
            })
        cl = NK.make_complete_linkage_clusters(
            pdf["plat"].to_numpy(np.float32), pdf["plng"].to_numpy(np.float32),
            max_dist_m,
        )
        # canonicalize: min pid per refined cluster
        pid = pdf["pid"].to_numpy(np.int64)
        out = np.empty(n, dtype=np.int64)
        for c in np.unique(cl):
            m = cl == c
            out[m] = pid[m].min()
        return pd.DataFrame({"pid": pid, "cluster_id": out})

    refined = big.groupBy("label").applyInPandas(
        refine, "pid long, cluster_id long"
    )
    result = small.unionByName(refined.select("pid", "cluster_id"))
    return result.select(F.col("pid").alias(id_col), "cluster_id")
