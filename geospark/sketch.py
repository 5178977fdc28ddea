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


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005, "An improved data
# stream summary: the count-min sketch and its applications")
# ---------------------------------------------------------------------------
# The 100-TB frequency problem: "how often does this token/host/url
# appear across the corpus" without keeping one counter per distinct
# item.  The sketch is a d x w counter grid; its relational form is a
# (row, bucket, cnt) table of AT MOST d*w rows per key-group no matter
# how large the stream — mergeable by plain sum, so per-partition /
# per-day sketches roll up without rescanning raw data.  Guarantees:
# est >= true always (no false negatives above a heavy-hitter
# threshold), est <= true + (e/w)*N with probability 1 - e^-d.
#
# Plan shape: explode each occurrence into d (row, bucket) cells, then
# ONE groupBy(row, bucket) whose map-side partial aggregation
# compresses every task's contribution to <= d*w cells before the
# shuffle — the shuffle moves O(d*w*tasks) rows, not O(stream).
# Lookups broadcast the tiny sketch.  Hashing is the same
# engine-neutral md5-60 as the rest of the dedup family, salted with
# the row index, so the DuckDB oracle reproduces estimates bit-for-bit
# (all remaining math is integer sum/min).

def cms_bucket(item: Column, row: int, w: int) -> Column:
    """Bucket of ``item`` in sketch row ``row``: md5-60 of the
    row-salted string, mod w.  md5-60 is non-negative (< 2^60) so
    `pmod` == `%` in every engine."""
    return F.pmod(_md5_60(F.concat(F.lit(f"{row}:"), item.cast("string"))),
                  F.lit(w))


def cms_table(df: DataFrame, keys: list[str], item: str,
              d: int = 4, w: int = 1024, weight: str | None = None,
              ) -> DataFrame:
    """The MERGEABLE sketch relation (keys..., row, bucket, cnt):
    <= d*w rows per key-group regardless of stream size.  ``weight``
    counts each input row ``weight`` times (default 1)."""
    wcol = F.col(weight) if weight else F.lit(1)
    e = df.select(
        *keys,
        wcol.alias("_w"),
        F.posexplode(F.array(*[
            cms_bucket(F.col(item), r, w) for r in range(d)
        ])).alias("row", "bucket"),
    )
    return (e.groupBy(*keys, "row", "bucket")
            .agg(F.sum("_w").alias("cnt")))


def cms_merge(sketches: DataFrame, keys: list[str]) -> DataFrame:
    """Merge sketch relations (days/partitions/files -> corpus, or
    fine keys -> coarse): counter-wise sum is the sketch union."""
    return (sketches.groupBy(*keys, "row", "bucket")
            .agg(F.sum("cnt").alias("cnt")))


def cms_lookup(sketch: DataFrame, probes: DataFrame, keys: list[str],
               item: str, d: int = 4, w: int = 1024) -> DataFrame:
    """Point-query a sketch relation: per probe (keys..., item) the
    CMS estimate min over d rows (missing cell = 0).  The sketch side
    is <= d*w rows per key-group -> broadcast; the only shuffle is the
    per-item min."""
    pe = probes.select(
        *keys, item,
        F.posexplode(F.array(*[
            cms_bucket(F.col(item), r, w) for r in range(d)
        ])).alias("row", "bucket"),
    )
    joined = pe.join(F.broadcast(sketch), [*keys, "row", "bucket"], "left")
    return (joined.groupBy(*keys, item)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .alias("est_cnt")))


def cms_bucket_sql(item: str, row_expr: str, w: int) -> str:
    """DuckDB twin of cms_bucket; ``row_expr`` may be a column."""
    salted = f"(CAST({row_expr} AS VARCHAR) || ':' || " \
             f"CAST({item} AS VARCHAR))"
    h = f"('0x' || substr(md5({salted}), 1, 15))::BIGINT"
    return f"(({h}) % {w})"


def cms_error_bound(w: int, n: int) -> float:
    """Additive overestimate bound e*N/w (holds per row w.p. 1-1/e)."""
    return math.e * n / w


# ---------------------------------------------------------------------------
# Bloom filter — relational form
# ---------------------------------------------------------------------------
# The crawl-frontier membership problem: "have we already ingested
# this URL/content hash" against a multi-billion-row seen-set, without
# joining the raw set every batch.  State = the DISTINCT set of lit
# bit positions (<= mbits rows, one long each) — mergeable by union,
# broadcastable at any realistic mbits, and rebuildable incrementally
# (new batch's bits union in).  Guarantee: a present item is ALWAYS
# maybe (no false negatives); absent items are maybe with
# p ~ (1 - e^(-k*n/m))^k.

def bloom_bit(item: Column, j: int, mbits: int) -> Column:
    """Bit position of hash function j — row-salted md5-60 mod mbits,
    same construction as cms_bucket."""
    return F.pmod(_md5_60(F.concat(F.lit(f"{j}:"), item.cast("string"))),
                  F.lit(mbits))


def bloom_bits(df: DataFrame, item: str, k: int = 7,
               mbits: int = 1 << 14) -> DataFrame:
    """Build the filter: the distinct (bit) relation of all k salted
    hashes of every item.  One explode + one distinct capped at mbits
    rows out."""
    return df.select(
        F.explode(F.array(*[
            bloom_bit(F.col(item), j, mbits) for j in range(k)
        ])).alias("bit")
    ).distinct()


def bloom_probe(bits: DataFrame, probes: DataFrame, item: str,
                k: int = 7, mbits: int = 1 << 14) -> DataFrame:
    """Membership test: per distinct probe item, maybe = every one of
    its k bits is lit.  The bits relation (<= mbits rows) broadcasts;
    the only shuffle is the per-item fold."""
    pe = probes.select(item).distinct().select(
        item,
        F.explode(F.array(*[
            bloom_bit(F.col(item), j, mbits) for j in range(k)
        ])).alias("bit"),
    )
    marked = bits.withColumn("_lit", F.lit(1))
    joined = pe.join(F.broadcast(marked), "bit", "left")
    return (joined.groupBy(item)
            .agg(F.min(F.coalesce(F.col("_lit"), F.lit(0)))
                 .alias("bloom_maybe")))


def bloom_bit_sql(item: str, j_expr: str, mbits: int) -> str:
    """DuckDB twin of bloom_bit; ``j_expr`` may be a column."""
    salted = f"(CAST({j_expr} AS VARCHAR) || ':' || " \
             f"CAST({item} AS VARCHAR))"
    h = f"('0x' || substr(md5({salted}), 1, 15))::BIGINT"
    return f"(({h}) % {mbits})"


def bloom_fpr(k: int, mbits: int, n: int) -> float:
    """Expected false-positive rate after inserting n items."""
    return (1.0 - math.exp(-k * n / mbits)) ** k
