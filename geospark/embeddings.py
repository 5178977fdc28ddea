"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: the exactness baseline — dot products as
  JVM higher-order array expressions (zip_with + aggregate), broadcast
  of the query set, window top-k. No Python in the hot path.
- LSH-bucketed ANN: deterministic random-hyperplane signs -> bucket
  key -> hash join on bucket -> exact re-rank inside the bucket. The
  scale path: candidate set shrinks ~2^n_planes-fold; multiple
  probe tables (sign flips) trade recall for cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)
_NORM = (
    "sqrt(aggregate({a}, CAST(0.0 AS DOUBLE), "
    "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
)


def dot(a: str, b: str):
    return F.expr(_DOT.format(a=a, b=b))


def norm(a: str):
    return F.expr(_NORM.format(a=a))


def cosine_topk(emb: DataFrame, query_ids: list[int], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k per query vector: (query_id, vec_id, cos_sim).

    Plan: broadcast the query vectors, one narrow pass computes all
    similarities (codegen'd array fold), window top-k per query. Ties
    break on vec_id. Self-matches excluded."""
    queries = (
        emb.filter(F.col(id_col).isin([int(q) for q in query_ids]))
        .select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
    )
    joined = emb.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v_vec")
    ).crossJoin(F.broadcast(queries)).filter(F.col("vec_id") != F.col("query_id"))
    sim = joined.withColumn(
        "cos_sim",
        dot("q_vec", "v_vec") / (norm("q_vec") * norm("v_vec")),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        sim.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"))
    )


def _plane_weights(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: w[h][i] derives from a
    fixed LCG-style formula — reproducible across engines/runs."""
    m = 1_000_003
    planes = []
    for h in range(n_planes):
        a = 48271 * (h + 1) + 12345
        planes.append([((a * (i + 1) * 2654435761) % m) / m - 0.5 for i in range(dim)])
    return planes


def lsh_bucket(emb: DataFrame, n_planes: int = 8, dim: int = 64,
               vec_col: str = "embedding"):
    """Append a sign-bucket column: bit h = sign(dot(plane_h, vec))."""
    planes = _plane_weights(n_planes, dim)
    bucket = None
    for h, w in enumerate(planes):
        arr = "array(" + ", ".join(repr(x) for x in w) + ")"
        d = F.expr(_DOT.format(a=arr, b=vec_col))
        bit = F.when(d > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, h)
        bucket = term if bucket is None else bucket.bitwiseOR(term)
    return emb.withColumn("bucket", bucket)


def ann_topk(emb: DataFrame, query_ids: list[int], k: int = 10,
             n_planes: int = 8, dim: int = 64,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: hash join on the sign bucket, exact cosine
    re-rank within the bucket. Candidates ~ n/2^n_planes per query.
    Returns (query_id, vec_id, cos_sim); recall measured in tests
    against cosine_topk."""
    bucketed = lsh_bucket(emb, n_planes, dim, vec_col).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v_vec"), "bucket"
    )
    queries = bucketed.filter(
        F.col("vec_id").isin([int(q) for q in query_ids])
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("v_vec").alias("q_vec"),
        F.col("bucket").alias("q_bucket"),
    )
    cand = bucketed.join(
        F.broadcast(queries), F.col("bucket") == F.col("q_bucket")
    ).filter(F.col("vec_id") != F.col("query_id"))
    sim = cand.withColumn(
        "cos_sim", dot("q_vec", "v_vec") / (norm("q_vec") * norm("v_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        sim.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"))
    )


def embedding_neardup_pairs(emb: DataFrame, threshold: float = 0.95,
                            n_planes: int = 8, dim: int = 64,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-dup: bucket self-join (filter) -> exact
    cosine (refine) -> pairs above threshold."""
    bucketed = lsh_bucket(emb, n_planes, dim, vec_col).select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"), "bucket"
    )
    pairs = (
        bucketed.alias("a")
        .join(bucketed.alias("b"), "bucket")
        .filter(F.col("a.vid") < F.col("b.vid"))
        .select(
            F.col("a.vid").alias("vec_id_a"),
            F.col("b.vid").alias("vec_id_b"),
            F.col("a.vec").alias("va"),
            F.col("b.vec").alias("vb"),
        )
    )
    sim = pairs.withColumn(
        "cos_sim", dot("va", "vb") / (norm("va") * norm("vb"))
    )
    return sim.filter(F.col("cos_sim") >= threshold).select(
        "vec_id_a", "vec_id_b", F.round("cos_sim", 6).alias("cos_sim")
    )
