"""Fine-radius (zoom > 16) clustering, adaptive contraction, and the
pluggable spool backends.

The zoom > 16 path had a measured region-assignment bug: region_b was
projected directly at region_zoom while region_a shifted down from the
fine cell, and pixel-y rounding doesn't compose across independently
projected zooms (~1/32 of points mismatched at z17). A mismatch hands
one pid to two union-find buckets -> conflicting roots -> duplicate
output rows and silently split clusters. These tests pin the fix with
brute-force parity against the reference twin (numpy_kernels
cluster_nearby, ported from src/cluster_nearby.cc).
"""

import numpy as np
import pytest

from geospark.functions import numpy_kernels as NK


def _canon(labels: dict[int, int]) -> dict[int, int]:
    groups: dict[int, list[int]] = {}
    for pid, c in labels.items():
        groups.setdefault(c, []).append(pid)
    return {pid: min(g) for g in groups.values() for pid in g}


def _run_parity(spark, lats, lngs, max_dist, **kw):
    from geospark.cluster import cluster_nearby

    n = len(lats)
    df = spark.createDataFrame(
        [(i, float(lats[i]), float(lngs[i])) for i in range(n)],
        "point_id long, lat double, lng double",
    )
    rows = cluster_nearby(df, max_dist, **kw).collect()
    # duplicate point_id rows were the bug's visible symptom
    assert len(rows) == n, f"expected {n} rows, got {len(rows)}"
    got = {r["point_id"]: r["cluster_id"] for r in rows}
    assert len(got) == n
    ref = NK.cluster_nearby(
        np.asarray(lats, dtype=np.float64), np.asarray(lngs, dtype=np.float64),
        max_dist,
    )
    assert _canon(got) == _canon({i: int(ref[i]) for i in range(n)})


def test_cluster_fine_radius_region_parity(spark):
    """max_dist=50m -> zoom 19 (> 16, the direct-projection grid).
    Dense random points across several region rows at mid latitude:
    with the old region_b derivation ~1/32 of points straddled
    conflicting regions."""
    from geospark.cluster import _zoom_for_dist

    assert _zoom_for_dist(50.0) > 16
    rng = np.random.RandomState(23)
    n = 400
    lats = 50.0 + rng.uniform(0.0, 0.02, n)   # ~2.2 km tall
    lngs = 8.0 + rng.uniform(0.0, 0.02, n)    # ~1.4 km wide
    _run_parity(spark, lats, lngs, 50.0)


def test_cluster_fine_radius_region_row_boundary(spark):
    """Pairs deliberately straddling a region-row boundary at zoom 21
    (max_dist=10m): each pair must merge, every pid appears once."""
    from geospark.cells import CELL_ZOOM  # noqa: F401  (doc pointer)
    from geospark.cluster import _zoom_for_dist, cluster_nearby

    z = _zoom_for_dist(10.0)
    assert z > 16
    region_zoom = z - 4
    # latitude of a region-row boundary: pick region row index at lat
    # ~50 and invert the mercator projection for its edge
    import math

    def lat_of_pixel_y(py, zoom):
        # inverse of merc_to_pixel_y at tile_size=1
        size = 1 << zoom
        merc_max = 20037508.342789244
        y = merc_max - (py / size) * (2 * merc_max)
        return math.degrees(2 * math.atan(math.exp(y / 6378137.0)) - math.pi / 2)

    # a boundary row near lat 50
    py = int((1 << region_zoom) * 0.35)
    lat_edge = lat_of_pixel_y(py, region_zoom)
    dlat = 4.0 / 111000.0  # 4 m
    rows, expected = [], []
    pid = 0
    for j in range(8):
        lng = 8.0 + j * 0.01
        rows.append((pid, lat_edge - dlat, lng))
        rows.append((pid + 1, lat_edge + dlat, lng))
        expected.append((pid, pid + 1))
        pid += 2
    df = spark.createDataFrame(rows, "point_id long, lat double, lng double")
    out_rows = cluster_nearby(df, 10.0).collect()
    assert len(out_rows) == pid
    out = {r["point_id"]: r["cluster_id"] for r in out_rows}
    for a, b in expected:
        assert out[a] == out[b], (a, b)
    assert len(set(out.values())) == len(expected)


def test_cluster_adaptive_contraction_parity(spark):
    """A chain component spanning many regions with the contraction
    loop forced on every round (second_round_threshold=0): labels must
    stay brute-force-correct with no manual budget tuning, and the
    loop must terminate (spanning forest floor)."""
    lats, lngs = [], []
    # one long chain: 60 points spaced ~700 m straight north — its
    # component crosses many z10-ish regions
    for j in range(60):
        lats.append(40.0 + j * 0.0063)
        lngs.append(7.0)
    # plus separated blobs
    rng = np.random.RandomState(5)
    for blat, blng in [(48.1, 11.5), (-33.9, 151.2)]:
        lats.extend(blat + rng.uniform(-0.002, 0.002, 4))
        lngs.extend(blng + rng.uniform(-0.002, 0.002, 4))
    _run_parity(spark, lats, lngs, 1000.0, second_round_threshold=0)


def test_cluster_budget_exceeded_names_forest(spark):
    """When even the spanning forest exceeds the budget the error is
    explicit (no silent truncation)."""
    from geospark.cluster import cluster_nearby

    lats = [40.0 + j * 0.0063 for j in range(40)]
    lngs = [7.0] * 40
    df = spark.createDataFrame(
        [(i, lats[i], lngs[i]) for i in range(40)],
        "point_id long, lat double, lng double",
    )
    with pytest.raises(RuntimeError, match="spanning forest"):
        cluster_nearby(df, 1000.0, second_round_threshold=0,
                       contract_budget=1).collect()


@pytest.mark.parametrize("backend", ["reliable", "table"])
def test_cluster_durable_spool_backends(spark, tmp_path, backend):
    """cluster_nearby end-to-end with the durable spool backends: same
    labels as the default local backend."""
    rng = np.random.RandomState(31)
    lats, lngs = [], []
    for blat, blng in [(49.87, 8.65), (52.52, 13.40)]:
        lats.extend(blat + rng.uniform(-0.003, 0.003, 6))
        lngs.extend(blng + rng.uniform(-0.003, 0.003, 6))
    spark.conf.set("spark.geospark.spool", backend)
    spark.conf.set("spark.geospark.spool.dir", str(tmp_path / backend))
    try:
        _run_parity(spark, lats, lngs, 1000.0)
    finally:
        spark.conf.set("spark.geospark.spool", "local")


def test_spool_table_backend_materializes(spark, tmp_path):
    from geospark.spool import spool

    spark.conf.set("spark.geospark.spool", "table")
    spark.conf.set("spark.geospark.spool.dir", str(tmp_path / "sp"))
    try:
        df = spool(spark.range(10).withColumnRenamed("id", "x"), "t")
        assert df.count() == 10
        assert df.columns == ["x"]
        import os

        assert any("t-" in d for d in os.listdir(tmp_path / "sp"))
    finally:
        spark.conf.set("spark.geospark.spool", "local")


def test_batched_cl_matches_reference_kernel():
    """The batched padded-tensor complete-linkage (sizes 3..16) must
    reproduce the per-component kernel bit-for-bit, including with
    poisoned padding (padding coords duplicating real points must not
    merge)."""
    rng = np.random.RandomState(41)
    T = 1000.0
    K = 16
    comps = []
    for _ in range(1500):
        n = int(rng.randint(3, K + 1))
        lat0 = rng.uniform(-80, 80)
        lng0 = rng.uniform(-179, 179)
        r = rng.uniform(0.1, 2.5, n) * T
        th = rng.uniform(0, 2 * np.pi, n)
        la = (lat0 + r * np.cos(th) / 111000.0).astype(np.float32)
        ln = (lng0 + r * np.sin(th)
              / (111200.0 * np.cos(np.radians(lat0)))).astype(np.float32)
        comps.append((la, ln))
    m = len(comps)
    sizes = np.array([c[0].size for c in comps], np.int64)
    laB = np.zeros((m, K), np.float32)
    lnB = np.zeros((m, K), np.float32)
    for i, (la, ln) in enumerate(comps):
        laB[i, :la.size] = la
        lnB[i, :la.size] = ln
        laB[i, la.size:] = la[0]   # poison: duplicate of point 0
        lnB[i, la.size:] = ln[0]
    cl = NK.make_complete_linkage_clusters_batch(laB, lnB, sizes, T)
    outcomes = set()
    for i, (la, ln) in enumerate(comps):
        want = NK.make_complete_linkage_clusters(la, ln, T)
        got = cl[i, :la.size]
        assert (got == want).all(), (i, got, want)
        outcomes.add(len(np.unique(want)))
    assert len(outcomes) >= 3, outcomes  # merged / split / singleton mixes
