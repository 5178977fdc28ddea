"""HyperLogLog distinct-count sketch as pure relational algebra.

The 100-TB operation the reference's tile layer can't answer cheaply:
"distinct users per map tile" across a petabyte of events.  An exact
count-distinct shuffles every (tile, user) pair; a HyperLogLog register
relation is ~m rows per tile, MERGEABLE across partitions, files,
days and zoom levels (register max is associative/commutative), so
rollups reuse sketches instead of rescanning raw data.

This implementation is deliberately engine-neutral and DETERMINISTIC —
no Spark-internal `approx_count_distinct` (whose xxhash layout a DuckDB
oracle can't reproduce).  Every step is exact integer/float-pow2 math,
identical in Spark Column ops and ANSI SQL (Flajolet et al. 2007,
"HyperLogLog: the analysis of a near-optimal cardinality estimation
algorithm"; small-range linear-counting correction from the same
paper):

  h     = md5-60(item)                         (engine-neutral hash)
  reg   = h >> (60 - p)                        (top p bits, m = 2^p)
  w     = h & (2^(60-p) - 1)                   (remaining 60-p bits)
  rho   = (60-p) - floor(log2 w) = (60-p)+1 - length(bin(w)), w=0 -> 60-p+1
  M_reg = max(rho)                             (the mergeable state)
  Z     = sum(2^-M_reg) + (m - regs_hit)
  E     = alpha_m * m^2 / Z
  if E <= 2.5m and V = m - regs_hit > 0:  E = m * ln(m / V)

Determinism detail: sum(2^-M_reg) is accumulated as the EXACT integer
sum(2^(S - M_reg)) with S = (60-p)+1, so no float-summation order
dependence can leak between engines — the worst case is
2^p * 2^(60-p) = 2^60 < 2^63, in-range for BIGINT at every valid p;
one deterministic long->double cast and a division by 2^S recovers Z.
The only non-exact scalar op left is the single `ln` in the
linear-counting branch (<= 1 ulp in both engines; estimates are
rounded to 3 dp).

Plan shape (hll_sketch): one distinct on (keys, item), then two
narrowing aggregations — no joins, no Python.  Because item -> reg is
a pure function, per-register distinct-item counts sum to the exact
per-key NDV, so the exact count rides along for free (it is the
ground-truth column the driver oracle checks the estimate against).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_BITS = 60  # md5-60, the engine-neutral hash of the dedup family


def hll_alpha(m: int) -> float:
    """Bias-correction constant (Flajolet et al. 2007, fig. 3)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _md5_60(item: Column) -> Column:
    return F.conv(F.substring(F.md5(item.cast("string")), 1, 15), 16, 10) \
        .cast("long")


def hll_register(item: Column, p: int) -> tuple[Column, Column]:
    """(register, rho) of one item under 2^p registers."""
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    tail = HASH_BITS - p
    h = _md5_60(item)
    reg = F.shiftright(h, tail)
    w = h.bitwiseAND(F.lit((1 << tail) - 1))
    rho = F.when(w == 0, F.lit(tail + 1)) \
        .otherwise(F.lit(tail + 1) - F.length(F.bin(w)))
    return reg, rho


def hll_registers(df: DataFrame, keys: list[str], item: str,
                  p: int = 6) -> DataFrame:
    """The MERGEABLE sketch relation: (keys..., reg, m_rho, n_items).
    ``n_items`` is the exact distinct-item count of the register (rides
    along because item -> reg is a function; sums to the exact NDV).

    This is the state you persist per partition/day/tile: merging two
    register relations is groupBy(keys, reg).max(m_rho) — associative,
    no raw-data rescan."""
    tail = HASH_BITS - p
    d = df.select(*keys, item).distinct()
    # staged through real columns (md5 evaluated once per row; the
    # multiply-referenced h/w aliases stay un-inlined — see
    # functions/geohash.py on CollapseProject)
    d = d.withColumns({"_hll_h": _md5_60(F.col(item))})
    d = d.withColumns({
        "reg": F.shiftright(F.col("_hll_h"), tail),
        "_hll_w": F.col("_hll_h").bitwiseAND(F.lit((1 << tail) - 1)),
    })
    d = d.withColumns({
        "rho": F.when(F.col("_hll_w") == 0, F.lit(tail + 1))
        .otherwise(F.lit(tail + 1) - F.length(F.bin(F.col("_hll_w")))),
    })
    return (
        d.groupBy(*keys, "reg")
        .agg(F.max("rho").alias("m_rho"), F.count("*").alias("n_items"))
    )


def hll_merge(regs: DataFrame, keys: list[str]) -> DataFrame:
    """Merge register relations down to coarser keys (e.g. child tiles
    -> parent tile, daily -> monthly): max is the sketch union.
    ``n_items`` does NOT survive a merge (children share items), so the
    merged relation carries registers only."""
    return regs.groupBy(*keys, "reg").agg(F.max("m_rho").alias("m_rho"))


def hll_estimate(regs: DataFrame, keys: list[str], p: int = 6,
                 exact: bool = True) -> DataFrame:
    """Fold a register relation into per-key estimates.  Emits
    (keys..., regs_hit, est_users [, exact_users])."""
    m = 1 << p
    s = HASH_BITS - p + 1  # scale: max m_rho, so every term is >= 1
    alpha = hll_alpha(m)
    aggs = [
        F.count("*").alias("regs_hit"),
        # SQL form: the ShiftLeft expression takes a column shift
        # amount, which the classic-API wrapper doesn't expose
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {s} - m_rho)"))
        .alias("z_int"),
    ]
    if exact:
        aggs.append(F.sum("n_items").alias("exact_users"))
    sk = regs.groupBy(*keys).agg(*aggs)
    z = (F.col("z_int").cast("double") / F.lit(float(1 << s))
         + (F.lit(m) - F.col("regs_hit")).cast("double"))
    e_raw = F.lit(alpha * m * m) / z
    v = F.lit(m) - F.col("regs_hit")
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(e_raw)
    cols = [*keys, "regs_hit", F.round(est, 3).alias("est_users")]
    if exact:
        cols.append("exact_users")
    return sk.select(*cols)


def hll_sketch(df: DataFrame, keys: list[str], item: str,
               p: int = 6, exact: bool = True) -> DataFrame:
    """End-to-end: per-key HLL distinct estimate (+ exact ground truth).
    Standard error is ~1.04/sqrt(2^p)."""
    return hll_estimate(hll_registers(df, keys, item, p), keys, p, exact)


# ---------------------------------------------------------------------------
# DuckDB-dialect SQL twins (oracle side; formula-identical)
# ---------------------------------------------------------------------------
def hll_register_sql(item: str, p: int) -> tuple[str, str]:
    """(reg_expr, rho_expr) over the DuckDB md5-60 of ``item``."""
    tail = HASH_BITS - p
    h = f"('0x' || substr(md5(CAST({item} AS VARCHAR)), 1, 15))::BIGINT"
    reg = f"(({h}) >> {tail})"
    w = f"(({h}) & {(1 << tail) - 1})"
    rho = (f"(CASE WHEN {w} = 0 THEN {tail + 1} "
           f"ELSE {tail + 1} - length(bin({w})) END)")
    return reg, rho


def hll_zint_sql(p: int) -> str:
    """Aggregate expr for the exact integer Z accumulator over a
    register relation with column m_rho."""
    s = HASH_BITS - p + 1
    return f"sum((1::BIGINT << ({s} - m_rho)))"


def hll_estimate_sql(p: int) -> tuple[str, str]:
    """(z_expr, est_expr) templates over columns named
    regs_hit / z_int (see the driver oracle for usage)."""
    m = 1 << p
    s = HASH_BITS - p + 1
    alpha = hll_alpha(m)
    z = (f"(CAST(z_int AS DOUBLE) / {float(1 << s)!r}"
         f" + CAST({m} - regs_hit AS DOUBLE))")
    # single precomputed double literal, exactly like the Spark side's
    # F.lit(alpha * m * m) (and DECIMAL-parse-safe in DuckDB)
    e_raw = f"({alpha * m * m!r} / {z})"
    v = f"({m} - regs_hit)"
    est = (f"(CASE WHEN {e_raw} <= {2.5 * m!r} AND {v} > 0 "
           f"THEN {float(m)!r} * ln({float(m)!r} / CAST({v} AS DOUBLE)) "
           f"ELSE {e_raw} END)")
    return z, est


def hll_std_error(p: int) -> float:
    return 1.04 / math.sqrt(1 << p)
