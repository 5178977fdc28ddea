"""Distributed geo clustering (SURVEY §2.7 C1, src/cluster_nearby.cc).

Reference semantics: (1) single-linkage pass — any two points within
``max_dist`` (float32 haversine, bbox prefilter) belong to one SL
cluster; (2) per-SL-cluster complete-linkage agglomerative refinement;
SL groups < 3 short-circuit.

Distributed re-expression:
  stage 1 = connected components over the "pairs within max_dist"
  graph. Edges come from a cell self-join (each point joined to the
  3x3 cell neighborhood at a zoom sized to max_dist) — no O(n²) pass.
  Components via iterative min-label propagation (a handful of
  join+agg rounds, converges in O(log(diameter))).

  stage 2 = per-component refinement in ``applyInPandas`` running the
  exact reference algorithm (numpy float32 twin) — groups are small by
  construction (SL chains at city scale), so the quadratic inner loop
  is bounded.

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
                   lng: str = "lng", max_rounds: int = 20) -> DataFrame:
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

    # undirected adjacency, materialized once (the loop must not
    # re-run the pandas-UDF edge discovery every round)
    adj = edges.union(
        edges.select(F.col("qid").alias("pid"), F.col("pid").alias("qid"))
    ).localCheckpoint(eager=True)
    ids = points.select(F.col(id_col).alias("pid")).distinct()
    labels = ids.withColumn("label", F.col("pid")).localCheckpoint(eager=True)

    # min-label propagation with pointer jumping: each round takes the
    # min over {own label, neighbors' labels, label-of-label} — the
    # doubling hop makes convergence O(log diameter) rounds.
    converged = False
    for _ in range(max_rounds):
        prop = (
            adj.join(labels, adj["qid"] == labels["pid"], "inner")
            .select(adj["pid"].alias("pid"), "label")
        )
        hop = (
            labels.alias("a")
            .join(labels.alias("b"), F.col("a.label") == F.col("b.pid"), "inner")
            .select(F.col("a.pid").alias("pid"), F.col("b.label").alias("label"))
        )
        new_labels = (
            labels.select("pid", "label").union(prop).union(hop)
            .groupBy("pid").agg(F.min("label").alias("label"))
        ).localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "pid")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1).count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"cluster_nearby: label propagation did not converge in "
            f"{max_rounds} rounds (pointer jumping needs O(log diameter); "
            f"raise max_rounds)"
        )

    # stage 2: complete-linkage refinement per SL component
    member = points.select(
        F.col(id_col).alias("pid"), F.col(lat).alias("plat"),
        F.col(lng).alias("plng"),
    ).join(labels, "pid")

    def refine(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("pid").reset_index(drop=True)
        n = len(pdf)
        if n < 3:
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

    result = member.groupBy("label").applyInPandas(
        refine, "pid long, cluster_id long"
    )
    return result.select(F.col("pid").alias(id_col), "cluster_id")
