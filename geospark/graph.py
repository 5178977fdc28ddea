"""Distributed connected components — the graph closure behind
keep-one near-dup deduplication.

The dedup family (minhash LSH, simhash, embedding near-dup) emits
*pairs*; an actual training-data pipeline needs the transitive
closure: one canonical document per duplicate CLUSTER, not per pair
(A~B and B~C must collapse A,B,C together even when A~C was never
emitted). The reference's analogue is the single-linkage stage of
``cluster_nearby`` (/root/reference/src/cluster_nearby.cc:58-95) —
connected components over the "within max_dist" graph; here the edge
relation is arbitrary (text/embedding similarity), so the spatial
region trick used by geospark.cluster does not apply.

Algorithm: alternating **large-star / small-star** (Kiveris,
Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected Components in
MapReduce and Beyond", SoCC'14). Each half-round is one shuffle
(groupBy-min + re-emit); the edge set provably converges to a union
of min-rooted stars in O(log n) rounds (O(log² n) worst case), with
NO driver-side collect and NO per-row Python — every step is a
Catalyst join/aggregate, so AQE handles skew (a viral duplicate
cluster is one hot root) and the plan survives a 1000-executor
deployment unchanged. Flat min-label propagation was rejected for
the same reason it was rejected for spatial clustering in round 1:
it needs O(component diameter) rounds and duplicate chains (shingle
drift across near-identical boilerplate) make deep path graphs.

Convergence detection is exact, not heuristic: a star graph is
reached iff every source node points at exactly one target and no
target is itself a source (two cheap aggregates per round) — no
checksum-equality gamble.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geospark.spool import spool


def _large_star(edges: DataFrame) -> DataFrame:
    """(u,v) undirected -> for each node u attach all strictly-larger
    neighbors to min(Γ(u) ∪ {u}). Keeps every component connected and
    strictly reduces large-neighbor depth."""
    n = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    m = n.groupBy("a").agg(F.min("b").alias("_mn"))
    m = m.select("a", F.least("_mn", F.col("a")).alias("m"))
    return (
        n.join(m, "a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient each edge high->low; for each high node u attach u and
    all its smaller neighbors to their minimum."""
    o = edges.select(
        F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
    ).filter(F.col("a") != F.col("b"))
    m = o.groupBy("a").agg(F.min("b").alias("m"))
    leaf = o.join(m, "a").select(F.col("b").alias("a"), F.col("m").alias("b"))
    center = m.select(F.col("a"), F.col("m").alias("b"))
    return (
        leaf.union(center)
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _is_star_forest(edges: DataFrame) -> bool:
    """Exact terminal test: every source has exactly one target and no
    target is also a source (then edges are (leaf -> component root)).

    ONE partial-aggregatable job: each edge contributes (a, b) as a
    source occurrence and (b, NULL) as a target occurrence; per node,
    >=2 distinct targets shows up as min(b) != max(b) and
    source-AND-target as count(b) < count(*). The convergence test
    runs every round, so halving its job count (the old version ran a
    groupBy job THEN a self-join job) is a per-round win for every CC
    caller (dedup closure, polygon dissolve, graph_cc)."""
    b_t = edges.schema["b"].dataType.simpleString()
    st = edges.select(F.col("a").alias("n"), F.col("b")).unionByName(
        edges.select(
            F.col("b").alias("n"),
            F.expr(f"CAST(NULL AS {b_t})").alias("b"),
        )
    )
    bad = (
        st.groupBy("n")
        .agg(F.count("b").alias("ns"), F.count("*").alias("ct"),
             F.min("b").alias("lo"), F.max("b").alias("hi"))
        .filter(
            (F.col("lo") != F.col("hi"))
            | ((F.col("ns") > 0) & (F.col("ct") > F.col("ns")))
        )
        .limit(1).count()
    )
    return bad == 0


def connected_components(edges: DataFrame, src: str = "a", dst: str = "b",
                         max_rounds: int = 50) -> DataFrame:
    """``(node, component)`` for every node that appears in ``edges``;
    ``component`` is the minimum node id of the connected component
    (the same min-canonical labeling cluster_nearby ships, so dedup
    keeps the lowest doc_id of each duplicate cluster).

    Isolated nodes never enter ``edges`` and are absent from the
    output — callers left-join and ``coalesce(component, node)``.
    """
    # orient high->low up front: _small_star output always points at a
    # strictly smaller id, so the star-forest terminal test may assume
    # pointer graphs are min-rooted — but the INPUT arrives in
    # arbitrary orientation, and a graph that is already a star forest
    # as given (e.g. the single edge (1, 100)) would otherwise be
    # accepted with a max-rooted star and mislabel the component
    e = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("a"),
            F.least(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    e = spool(e, "cc_edges")
    for _ in range(max_rounds):
        if _is_star_forest(e):
            break
        e = spool(_small_star(_large_star(e)), "cc_round")
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} "
            f"large/small-star rounds (theory: O(log^2 n))"
        )
    leaves = e.select(F.col("a").alias("node"), F.col("b").alias("component"))
    roots = e.select(F.col("b").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return leaves.unionByName(roots)


def neardup_dedup(docs: DataFrame, pairs: DataFrame,
                  id_col: str = "doc_id") -> DataFrame:
    """Keep-one dedup over a near-dup PAIR relation: transitive
    closure of the pairs, canonical id = min doc id of each duplicate
    cluster. Returns every input doc with ``(id, canonical_id,
    is_dup)`` — filter ``~is_dup`` to materialize the deduplicated
    corpus. ``pairs`` must expose ``{id_col}_a`` / ``{id_col}_b``
    (the shape minhash_neardup_pairs / simhash_pairs /
    embedding_neardup_pairs all emit)."""
    comp = connected_components(pairs, f"{id_col}_a", f"{id_col}_b")
    return (
        docs.select(F.col(id_col))
        .join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("canonical_id"),
        )
        .withColumn(
            "is_dup", (F.col("canonical_id") != F.col(id_col)).cast("int")
        )
    )


def pagerank(nodes: DataFrame, edges: DataFrame, iters: int = 5,
             scale: int = 10 ** 15, damp_num: int = 85,
             damp_den: int = 100, node: str = "node",
             src: str = "src", dst: str = "dst",
             use_spool: bool = True) -> DataFrame:
    """Integer-exact PageRank — crawl/link-authority scoring whose
    fixed-point arithmetic is engine-reproducible BY CONSTRUCTION:

      r_0        = scale DIV N
      contrib(e) = r(src) DIV out_deg(src)           (integer floor)
      r_{i+1}(v) = (scale * (den-num) DIV den) DIV N
                   + (num * sum contrib) DIV den

    All operations are BIGINT floor divisions and sums, so there is no
    float-summation-order hazard anywhere — a DuckDB oracle (or any
    engine) reproduces every rank bit-for-bit.  Floor division leaks
    <= 1 unit of mass per edge per iteration (a ~1e-10 relative
    quantization at the default scale) — the documented price of
    exactness; ordering is preserved to that quantization.

    Contract: every node has >= 1 out-edge (rank of dangling mass is
    not redistributed).  Plan per iteration: join ranks with the
    degree-annotated edge relation on ``src`` (one shuffle), sum
    contributions on ``dst`` (second shuffle), left-join back to the
    node relation so rank-sinks keep their base rank.  This is the
    standard distributed PageRank shape — E-row shuffles per
    iteration, no driver data; ranks spool between iterations to keep
    the plan shallow.

    Returns (node, rank_i) with rank_i ~ scale * pagerank."""
    base_lit = f"(CAST({scale} AS BIGINT) * {damp_den - damp_num} " \
               f"DIV {damp_den})"
    deg = edges.groupBy(src).agg(F.count("*").alias("_d"))
    ed = edges.join(deg, src)
    if use_spool:
        ed = spool(ed.select(src, dst, "_d"), "pagerank_edges")
    nn = nodes.agg(F.count("*").alias("_n"))
    nb = nodes.crossJoin(F.broadcast(nn)).select(
        node,
        F.expr(f"CAST({scale} AS BIGINT) DIV _n").alias("_r0"),
        F.expr(f"{base_lit} DIV _n").alias("_base"),
    )
    if use_spool:
        nb = spool(nb, "pagerank_nodes")
    r = nb.select(node, F.col("_r0").alias("rank_i"))
    for i in range(iters):
        contrib = (
            r.join(ed, F.col(node) == F.col(src))
            .select(F.col(dst).alias("_to"),
                    F.expr("rank_i DIV _d").alias("_c"))
            .groupBy("_to")
            .agg(F.sum("_c").alias("_s"))
        )
        r = nb.join(contrib, F.col(node) == F.col("_to"), "left").select(
            node,
            (F.col("_base")
             + F.expr(f"{damp_num} * coalesce(_s, CAST(0 AS BIGINT)) "
                      f"DIV {damp_den}")).alias("rank_i"),
        )
        if use_spool:
            r = spool(r, f"pagerank_iter_{i}")
    return r


def triangle_count(edges: DataFrame, src: str = "src",
                   dst: str = "dst") -> DataFrame:
    """Per-node triangle counts over an undirected graph — the
    clustering-coefficient / spam-farm signal for a crawl link graph.

    Degree-ordered orientation (Suri & Vassilvitskii, WWW'11): each
    undirected edge is directed from its lower-(degree, id) endpoint
    to the higher one, so every triangle has exactly ONE apex (its
    rank-minimum vertex) and is generated exactly once as a wedge at
    that apex. Out-degrees under this orientation are O(sqrt(m)) on
    any graph, which kills the "last reducer" hot-vertex blowup a
    plain adjacency self-join has on power-law web graphs: the wedge
    relation is sum-of-C(out_deg,2) bounded, never celebrity-squared.

    Plan: canonicalize + distinct (one shuffle), degree count (one),
    two degree joins to orient, wedge self-join on the apex (one
    shuffle of the oriented relation), close each wedge with a
    semi-join against the canonical edge set, then explode the 3
    corners and count per node. All joins/aggs partial-aggregatable;
    AQE skew handling applies to the apex join. Self-loops dropped,
    multi-edges collapse via the distinct.

    Returns (node, n_tri) for every node in >= 1 triangle."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    e = spool(e, "tri_edges")
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n").agg(F.count("*").alias("d"))
    )
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("db"))
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    dire = (
        e.join(da, "a").join(db, "b")
        .select(
            F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
    )
    dire = spool(dire, "tri_oriented")
    x, y = dire.alias("x"), dire.alias("y")
    wedges = x.join(y, on=F.col("x.u") == F.col("y.u")).filter(
        F.col("x.v") < F.col("y.v")
    ).select(
        F.col("x.u").alias("w0"),
        F.col("x.v").alias("w1"),
        F.col("y.v").alias("w2"),
    )
    tris = wedges.join(
        e,
        (F.col("w1") == F.col("a")) & (F.col("w2") == F.col("b")),
        "left_semi",
    )
    return (
        tris.select(F.explode(F.array("w0", "w1", "w2")).alias("node"))
        .groupBy("node").agg(F.count("*").alias("n_tri"))
    )


def sssp(edges: DataFrame, sources: list[int], hops: int = 6,
         src: str = "src", dst: str = "dst", w: str = "w",
         use_spool: bool = True) -> DataFrame:
    """Multi-source shortest paths — the routing primitive under
    nearest-hub assignment, isochrones, and network distance joins
    (the reference library feeds the MOTIS router; this is the
    distributed form of its distance queries over a weighted graph).

    Semantics: Bellman-Ford limited to ``hops`` relaxation rounds —
    exact shortest distances over paths of <= ``hops`` edges, with
    each reached node labeled by its nearest source (``hub``; ties
    broken toward the smaller hub id).  Bounded rounds make the
    result a pure function of (edges, sources, hops), so an engine
    with no recursion (or a SQL oracle with unrolled CTEs) reproduces
    it bit-for-bit: distances and the tie-break ride in ONE BIGINT
    key = dist * hub_mod + hub, merged with plain ``min``.

    Scale shape: the classic frontier-pruned relaxation. Per round,
    only nodes whose key IMPROVED last round join the edge relation
    (frontier x edges shuffle, pre-combined with a map-side min on
    dst), then a full-outer merge against the running state keyed on
    node.  On converging graphs the frontier collapses after
    ~diameter rounds and the loop exits early; state stays
    O(reached nodes) and spools between rounds (pluggable durable
    backend) to keep plans shallow.  No driver-side data beyond the
    empty-frontier check.

    Weights must be non-negative BIGINTs.  Returns (node, dist, hub)
    for nodes reachable within ``hops`` edges of any source.

    Sources are remapped to DENSE hub indices internally (ADVICE r03):
    the packed key is dist * len(sources) + hub_idx, so 64-bit-hashed
    source ids cannot overflow the BIGINT key — only
    max_dist * len(sources) >= 2^63 can, which the docstring bound
    below states and real weight/hop budgets never approach.  The
    dense indices follow sorted(source id), so min-merge tie-breaks
    still resolve toward the smaller ORIGINAL hub id.
    """
    spark = edges.sparkSession
    if not sources:
        raise ValueError("sssp: sources must be non-empty")
    srcs = sorted({int(s) for s in sources})
    hub_mod = len(srcs)
    ed = edges.select(src, dst, w)
    if use_spool:
        ed = spool(ed, "sssp_edges")
    state = spark.createDataFrame(
        [(s, i) for i, s in enumerate(srcs)], "node long, key long"
    )
    frontier = state
    for i in range(hops):
        cand = (
            frontier.join(ed, F.col("node") == F.col(src))
            .select(
                F.col(dst).alias("node"),
                (F.expr(f"key DIV {hub_mod}") * hub_mod
                 + F.col(w) * hub_mod + F.col("key") % hub_mod
                 ).alias("_ck"),
            )
            .groupBy("node").agg(F.min("_ck").alias("_ck"))
        )
        merged = state.join(cand, "node", "full").select(
            "node",
            F.least("key", "_ck").alias("_new"),  # least skips NULLs
            F.col("key").alias("_old"),
        )
        state = merged.select("node", F.col("_new").alias("key"))
        frontier = merged.filter(
            F.col("_old").isNull() | (F.col("_new") < F.col("_old"))
        ).select("node", F.col("_new").alias("key"))
        if use_spool:
            state = spool(state, f"sssp_state_{i}")
            frontier = spool(frontier, f"sssp_frontier_{i}")
        if frontier.isEmpty():
            break
    hub_ids = "array(" + ", ".join(f"{s}L" for s in srcs) + ")"
    return state.select(
        "node",
        F.expr(f"key DIV {hub_mod}").alias("dist"),
        F.expr(f"element_at({hub_ids}, CAST(key % {hub_mod} AS INT) + 1)")
        .alias("hub"),
    )
