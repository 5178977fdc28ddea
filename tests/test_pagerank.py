"""Integer PageRank (graph.pagerank) structural properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from geospark.graph import pagerank

SCALE = 10 ** 15


def _g(spark, edges, n):
    nodes = spark.range(n).select(F.col("id").alias("node"))
    e = spark.createDataFrame(edges, "src long, dst long")
    return nodes, e


def test_pagerank_uniform_on_cycle(spark):
    n = 8
    nodes, e = _g(spark, [(i, (i + 1) % n) for i in range(n)], n)
    out = pagerank(nodes, e, iters=4).collect()
    ranks = {r["rank_i"] for r in out}
    assert len(out) == n
    assert len(ranks) == 1  # symmetric graph -> identical ranks
    # total mass ~ scale (floor-division leakage only)
    assert abs(sum(r["rank_i"] for r in out) - SCALE) < n * 200


def test_pagerank_star_hub_dominates(spark):
    # 0..6 all point at 7; 7 points back at 0
    n = 8
    edges = [(i, 7) for i in range(7)] + [(7, 0)]
    nodes, e = _g(spark, edges, n)
    out = {r["node"]: r["rank_i"] for r in
           pagerank(nodes, e, iters=6).collect()}
    # hub and its sole successor hold all the circulating mass (it
    # sloshes 7 -> 0 -> 7 each iteration); leaves keep base rank only
    assert {min(out, key=out.get)} <= set(range(1, 7))
    assert sorted(out, key=out.get)[-2:] in ([0, 7], [7, 0])
    assert out[7] > 3 * out[1] and out[0] > 3 * out[1]
    leaf = {out[i] for i in range(1, 7)}
    assert len(leaf) == 1  # symmetric leaves tie exactly


def test_pagerank_spool_toggle_identical(spark):
    n = 30
    edges = [(i, (i * 7 + j) % n) for i in range(n) for j in (1, 2)]
    nodes, e = _g(spark, edges, n)
    a = sorted(map(tuple, pagerank(nodes, e, iters=3,
                                   use_spool=True).collect()))
    b = sorted(map(tuple, pagerank(nodes, e, iters=3,
                                   use_spool=False).collect()))
    assert a == b
