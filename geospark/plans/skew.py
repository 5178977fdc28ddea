"""Explicit skew handling for hot cells (SURVEY §4 item 1).

City-skewed page corpora concentrate points in a few cells (the
synthetic pages table reproduces this with a Zipf city distribution).
AQE's skew-join splitting is enabled as a backstop in
geospark.session; this module is the PRIMARY mechanism the north rule
asks for: a frequency sketch of the key column finds hot keys, the
fact side gets a salt column on those keys, and the dimension side is
exploded ×n_salt for hot keys only — turning one hot partition into
n_salt even ones at the cost of duplicating a handful of small rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_keys(df: DataFrame, key: str, threshold_ratio: float = 0.01,
             max_keys: int = 1000) -> list:
    """Keys holding more than ``threshold_ratio`` of all rows.
    One aggregation; the result is bounded (≤ 1/threshold_ratio keys,
    capped) so collecting it is safe at any scale."""
    total = df.count()
    if total == 0:
        return []
    thresh = max(1, int(total * threshold_ratio))
    rows = (
        df.groupBy(key)
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") >= thresh)
        .orderBy(F.desc("_n"))
        .limit(max_keys)
        .collect()
    )
    return [r[key] for r in rows]


def with_salt(df: DataFrame, key: str, hot: list, n_salt: int,
              salt_col: str = "_salt", entropy_col: str | None = None) -> DataFrame:
    """Fact side: salt ∈ [0, n_salt) on hot keys, 0 elsewhere.
    Salt derives from a hash of ``entropy_col`` (or all columns) so it
    is deterministic and spreads uniformly."""
    ent = F.xxhash64(*([entropy_col] if entropy_col else df.columns))
    return df.withColumn(
        salt_col,
        F.when(F.col(key).isin(hot), F.pmod(ent, F.lit(n_salt))).otherwise(F.lit(0)),
    )


def explode_salt(df: DataFrame, key: str, hot: list, n_salt: int,
                 salt_col: str = "_salt") -> DataFrame:
    """Dimension side: replicate hot-key rows ×n_salt (salt 0..n-1),
    cold rows once (salt 0)."""
    return df.withColumn(
        salt_col,
        F.explode(
            F.when(
                F.col(key).isin(hot), F.expr(f"sequence(0, {n_salt - 1})")
            ).otherwise(F.array(F.lit(0)))
        ),
    )


def salted_join(fact: DataFrame, dim: DataFrame, key: str,
                n_salt: int = 8, threshold_ratio: float = 0.01,
                entropy_col: str | None = None, how: str = "inner") -> DataFrame:
    """Equi-join on ``key`` with hot keys salted on both sides.
    Plan: one frequency agg (cheap, map-side partial), then the join
    shuffles on (key, salt) — the hot key's rows land in n_salt
    partitions instead of one.

    Only fact-preserving join types are legal: the dim side is
    replicated n_salt-fold, so right/full-outer would null-extend the
    replicas whose salt value no fact row hashed to — phantom rows the
    unsalted join doesn't produce."""
    safe = {"inner", "left", "leftouter", "left_outer", "semi",
            "leftsemi", "left_semi", "anti", "leftanti", "left_anti",
            "cross"}
    if how.lower().replace("_", "") not in {s.replace("_", "") for s in safe}:
        raise ValueError(
            f"salted_join: how={how!r} is not fact-preserving — the "
            f"exploded dim replicas would emit phantom null-extended "
            f"rows; salt the other side or use an unsalted join")
    hot = hot_keys(fact, key, threshold_ratio)
    if not hot:
        return fact.join(dim, key, how)
    f = with_salt(fact, key, hot, n_salt, entropy_col=entropy_col)
    d = explode_salt(dim, key, hot, n_salt)
    return f.join(d, [key, "_salt"], how).drop("_salt")
