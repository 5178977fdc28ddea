"""Connected components (large-star/small-star) and keep-one dedup.

Brute-force parity: every graph shape that breaks naive approaches —
deep chains (defeat O(diameter) label propagation assumptions),
cliques (the LSH near-dup shape), stars, crossing components, and
random Erdős–Rényi graphs — checked against a plain union-find.
"""

import numpy as np
import pytest

from geospark.graph import connected_components, neardup_dedup


def _brute_cc(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {n for e in edges for n in e}
    return {n: find(n) for n in nodes}


def _check(spark, edges: list[tuple[int, int]], max_rounds: int = 50):
    df = spark.createDataFrame(edges, "a long, b long")
    got_rows = connected_components(df, max_rounds=max_rounds).collect()
    got = {r["node"]: r["component"] for r in got_rows}
    assert len(got) == len(got_rows), "duplicate node rows"
    want = _brute_cc(edges)
    assert got == want


def test_cc_chain_deep(spark):
    # a 120-node path: diameter 119 >> the O(log n) round budget —
    # converging inside max_rounds proves the star-contraction is
    # doing exponential (not linear) progress
    _check(spark, [(i, i + 1) for i in range(120)], max_rounds=14)


def test_cc_cliques_and_bridges(spark):
    edges = []
    # three 6-cliques, two bridged
    for base in (0, 100, 200):
        edges += [(base + i, base + j) for i in range(6) for j in range(i + 1, 6)]
    edges += [(5, 100), (104, 205)]  # one component of all three
    # plus an isolated pair and a reversed-order edge
    edges += [(9999, 9000), (501, 500)]
    _check(spark, edges)


def test_cc_star_already_converged(spark):
    _check(spark, [(0, i) for i in range(1, 30)])


def test_cc_random_graphs(spark):
    rng = np.random.RandomState(7)
    for trial in range(3):
        n = 300
        m = [60, 300, 900][trial]
        a = rng.randint(0, n, m)
        b = rng.randint(0, n, m)
        edges = [(int(x), int(y)) for x, y in zip(a, b) if x != y]
        _check(spark, edges)


def test_cc_self_loops_and_dupes_ignored(spark):
    _check(spark, [(1, 1), (1, 2), (2, 1), (1, 2), (3, 3), (3, 4)])


def test_neardup_dedup_keep_one(spark):
    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 3), (3, 5), (7, 8)], "doc_id_a long, doc_id_b long"
    )
    out = {r["doc_id"]: (r["canonical_id"], r["is_dup"])
           for r in neardup_dedup(docs, pairs).collect()}
    assert out == {
        0: (0, 0), 1: (1, 0), 2: (2, 0), 3: (1, 1), 4: (4, 0),
        5: (1, 1), 6: (6, 0), 7: (7, 0), 8: (7, 1), 9: (9, 0),
    }
    kept = sorted(d for d, (_, dup) in out.items() if not dup)
    assert kept == [0, 1, 2, 4, 6, 7, 9]


def test_cc_round_budget_error(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(40)], "a long, b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_rounds=1).collect()


def test_cc_single_edge_both_orientations(spark):
    """Regression: a graph that is ALREADY a star forest as given must
    still be min-rooted. The single edge (1, 100) used to be accepted
    as a pointer 1 -> 100 and labeled the component 100 (max) — caught
    by polygon_dissolve's oracle; the high->low input orientation
    fixes it for both input orders."""
    _check(spark, [(1, 100)])
    _check(spark, [(100, 1)])


def test_cc_disjoint_pair_edges(spark):
    """Many 2-node components given as (small, large) pairs — the
    LSH-pair shape (doc_id_a < doc_id_b) with isolated dup pairs."""
    _check(spark, [(2 * i, 2 * i + 1) for i in range(20)])
    # mixed: pre-converged pairs + one multi-edge component
    _check(spark, [(0, 9), (9, 13), (20, 21), (30, 31)])


def _tri_brute(edges):
    """Brute-force per-node triangle counts via all-triples."""
    from itertools import combinations

    es = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = sorted({n for e in es for n in e})
    cnt: dict[int, int] = {}
    for x, y, z in combinations(nodes, 3):
        if ((x, y) in es and (x, z) in es and (y, z) in es):
            for n in (x, y, z):
                cnt[n] = cnt.get(n, 0) + 1
    return cnt


def test_triangle_count_matches_brute_force(spark):
    """Degree-oriented wedge counting == all-triples brute force on
    K4 + pendant path + self-loops + duplicate/reversed edges."""
    from geospark.graph import triangle_count

    edges = (
        # K4 on 0..3 -> 4 triangles, every vertex in 3
        [(a, b) for a in range(4) for b in range(a + 1, 4)]
        # pendant path (no triangles) + a 5-cycle chord triangle
        + [(3, 10), (10, 11), (20, 21), (21, 22), (20, 22)]
        # noise: self-loop, duplicate, reversed duplicate
        + [(5, 5), (0, 1), (1, 0)]
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["n_tri"]
           for r in triangle_count(df).collect()}
    assert got == _tri_brute(edges)
    assert got[0] == 3 and got[20] == 1 and 10 not in got

    # random graphs: p=0.25 G(n=18) x 3 seeds
    import random
    for seed in (1, 2, 3):
        rng = random.Random(seed)
        es = [(a, b) for a in range(18) for b in range(a + 1, 18)
              if rng.random() < 0.25]
        df = spark.createDataFrame(es, "src long, dst long")
        got = {r["node"]: r["n_tri"]
               for r in triangle_count(df).collect()}
        assert got == _tri_brute(es), f"seed {seed}"


# --------------------------------------------------------------------
# Multi-source shortest paths (graph.sssp) — Bellman-Ford <= R hops,
# nearest-hub labels, ties to the smaller hub id.
# --------------------------------------------------------------------

def _bf_py(edges, sources, hops):
    """Independent plain-Python Bellman-Ford golden: (node -> (dist,
    hub)), ties to the smaller hub, paths of <= hops edges."""
    dist = {s: (0, s) for s in sources}
    for _ in range(hops):
        nxt = dict(dist)
        for (u, v, w) in edges:
            if u in dist:
                cand = (dist[u][0] + w, dist[u][1])
                if v not in nxt or cand < nxt[v]:
                    nxt[v] = cand
        dist = nxt
    return dist


def _rand_wgraph(seed, n=40, m=140, wmax=9):
    rng = np.random.default_rng(seed)
    return [(int(rng.integers(0, n)), int(rng.integers(0, n)),
             int(rng.integers(1, wmax + 1))) for _ in range(m)]


@pytest.mark.parametrize("seed", [7, 19])
def test_sssp_matches_bellman_ford_golden(spark, seed):
    from geospark.graph import sssp

    edges = _rand_wgraph(seed)
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    out = {r["node"]: (r["dist"], r["hub"])
           for r in sssp(df, [0, 1, 2], hops=4).collect()}
    assert out == _bf_py(edges, [0, 1, 2], 4)


def test_sssp_tie_breaks_to_smaller_hub(spark):
    from geospark.graph import sssp

    # hubs 0 and 3 both reach node 9 at distance 5
    edges = [(0, 9, 5), (3, 9, 5), (3, 8, 2)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    out = {r["node"]: (r["dist"], r["hub"])
           for r in sssp(df, [0, 3], hops=3).collect()}
    assert out[9] == (5, 0)
    assert out[8] == (2, 3)


def test_sssp_frontier_early_exit_is_converged(spark):
    """hops far beyond the diameter: early exit on an empty frontier
    must still equal full-convergence shortest paths."""
    from geospark.graph import sssp

    edges = _rand_wgraph(23, n=25, m=80)
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    out = {r["node"]: (r["dist"], r["hub"])
           for r in sssp(df, [0], hops=30).collect()}
    assert out == _bf_py(edges, [0], 30)
    # a longer budget changes nothing (converged)
    out2 = {r["node"]: (r["dist"], r["hub"])
            for r in sssp(df, [0], hops=40).collect()}
    assert out == out2
