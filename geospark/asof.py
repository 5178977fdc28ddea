"""Temporal joins: as-of (nearest-key) and interval overlap.

The training-data pipeline shape: attribute each fact row (purchase,
label, page snapshot) to the most recent dimension row at-or-before
its timestamp (``direction="backward"``), or the earliest one
at-or-after (``"forward"``). Spark has no built-in as-of join; the
classic distributed re-expression is the UNION + WINDOW trick:

    union(left, right) sorted by (key, ts, side) →
    last(right_value, ignorenulls) over rows-unbounded-preceding

so the whole operator is ONE shuffle on the join key plus a window
sort — the same plan shape as sessionization, no per-row Python, no
range self-join blowup. At 100 TB both inputs shuffle once on ``by``;
a hot key (viral user) serializes only its own partition's sort, and
the window is rows-based so it streams without buffering the frame.

Determinism: several right rows can share (by, ts). They are reduced
first to the lexicographically greatest struct of the carried value
columns (one partial-aggregatable groupBy on the same shuffle key),
so the match is a pure function of the data, never of task order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, by: str | list[str],
              left_ts: str = "ts", right_ts: str = "ts",
              right_cols: list[str] | None = None, suffix: str = "_r",
              direction: str = "backward", strict: bool = False,
              tolerance_s: int | None = None) -> DataFrame:
    """Match each ``left`` row to the nearest ``right`` row of the same
    ``by`` key at-or-before (``backward``) / at-or-after (``forward``)
    its timestamp; ``strict=True`` excludes equal timestamps. Returns
    every left row (left-outer semantics) with the matched right value
    columns appended as ``<col><suffix>`` plus ``<right_ts><suffix>``
    (all null when no right row qualifies). ``tolerance_s`` voids
    matches farther than that many seconds."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by_list = [by] if isinstance(by, str) else list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns
                      if c not in by_list and c != right_ts]

    # working-column names must not shadow user columns (a left column
    # literally named "_ts" would be silently overwritten and then
    # re-selected into the output) — grow a prefix until it's free
    p = "_asof"
    taken = set(left.columns) | set(right.columns)
    while any(c.startswith(p) for c in taken):
        p += "_"
    c_ts, c_k, c_isl, c_v, c_m = (
        f"{p}ts", f"{p}k", f"{p}isl", f"{p}v", f"{p}m")

    # ties among right rows at one (by, ts): keep the max value struct
    # (deterministic; partial-aggregatable map-side)
    r = right.groupBy(*by_list, F.col(right_ts).alias(c_ts)).agg(
        F.max(F.struct(*[F.col(c) for c in right_cols])).alias(c_v)
    )
    # side ordering encodes the inclusive/strict boundary rule: the
    # right row at an equal timestamp must sort inside the left row's
    # window frame iff the match is inclusive
    kind_r = int(strict ^ (direction == "forward"))
    r = r.withColumn(c_k, F.lit(kind_r)).withColumn(c_isl, F.lit(False))
    l = (
        left.withColumn(c_ts, F.col(left_ts))
        .withColumn(c_k, F.lit(1 - kind_r))
        .withColumn(c_isl, F.lit(True))
    )
    u = l.unionByName(r, allowMissingColumns=True)

    w = Window.partitionBy(*by_list).orderBy(c_ts, c_k)
    # the probe struct is null on LEFT rows (ignorenulls then skips
    # them), and carries (right ts, value struct) on right rows;
    # struct FIELD names live inside c_m, so they cannot collide with
    # user columns
    probe = F.when(~F.col(c_isl), F.struct(
        F.col(c_ts).alias("_rts"), F.col(c_v).alias("_v")
    ))
    if direction == "backward":
        frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        matched = F.last(probe, ignorenulls=True).over(frame)
    else:
        frame = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        matched = F.first(probe, ignorenulls=True).over(frame)

    out = u.withColumn(c_m, matched).filter(F.col(c_isl))
    if tolerance_s is not None:
        # unix_micros via a plain-timestamp cast: works for both
        # TIMESTAMP and TIMESTAMP_NTZ inputs (NTZ has no direct long cast)
        gap = F.abs(
            F.unix_micros(F.col(c_ts).cast("timestamp"))
            - F.unix_micros(F.col(f"{c_m}._rts").cast("timestamp"))
        ) / 1_000_000.0
        out = out.withColumn(
            c_m, F.when(gap <= F.lit(int(tolerance_s)), F.col(c_m))
        )
    sel = [F.col(c) for c in left.columns]
    sel.append(F.col(f"{c_m}._rts").alias(f"{right_ts}{suffix}"))
    sel += [F.col(f"{c_m}._v.{c}").alias(f"{c}{suffix}") for c in right_cols]
    return out.select(*sel)


def interval_join(left: DataFrame, right: DataFrame, bucket_us: int,
                  l_start: str = "start_us", l_end: str = "end_us",
                  r_start: str = "start_us", r_end: str = "end_us",
                  l_prefix: str = "l_", r_prefix: str = "r_") -> DataFrame:
    """Interval x interval OVERLAP join: every (left, right) pair
    whose CLOSED integer intervals intersect — max(starts) <=
    min(ends). The temporal-range join Spark lacks natively (its
    range-condition joins degenerate to broadcast-nested-loop); the
    classic distributed re-expression is time-bucket chunking:

      each side explodes its interval into the width-``bucket_us``
      buckets it touches (sequence(), cost linear in interval length /
      bucket width) -> hash equi-join on bucket -> every overlapping
      pair shares the bucket containing max(l_start, r_start) and is
      KEPT ONLY THERE (bucket == floor(greatest(starts)/W) rides in
      the join condition) — so no distinct pass, each qualifying pair
      emitted exactly once -> exact closed-overlap refine.

    At scale the bucket width trades replication (long intervals x
    fine buckets) against join selectivity (coarse buckets collide
    unrelated intervals); both sides shuffle once on the bucket key.
    All arithmetic is integer microseconds — engine-exact: bucket ids
    use true integer floor division ((a - pmod(a, w)) DIV w), never a
    float quotient, so the operator is exact over the full BIGINT
    timestamp range and for negative epochs (a double floor(a/w)
    breaks past 2^53 and at ulp-adjacent quotients).

    Output: all left columns prefixed ``l_prefix`` + all right
    columns prefixed ``r_prefix`` + ``overlap_us`` (the closed
    intersection length, >= 0). Callers add equi-keys (user, tile) by
    pre-concatenating them into the bucket key or post-filtering.
    Reference analogue: Q8 box::overlaps (box.h:77-88) on the time
    axis, as a JOIN."""
    w = int(bucket_us)

    def fdiv(expr: str):
        # exact integer floor division (Spark DIV truncates toward
        # zero; pmod makes the numerator exactly divisible)
        e = f"CAST({expr} AS BIGINT)"
        return F.expr(f"({e} - pmod({e}, {w})) DIV {w}")

    lb = left.select(
        *[F.col(c).alias(l_prefix + c) for c in left.columns],
        F.explode(F.sequence(fdiv(l_start), fdiv(l_end))).alias("_ib"),
    )
    rb = right.select(
        *[F.col(c).alias(r_prefix + c) for c in right.columns],
        F.explode(F.sequence(fdiv(r_start), fdiv(r_end))).alias("_jb"),
    )
    ls, le = F.col(l_prefix + l_start), F.col(l_prefix + l_end)
    rs, re_ = F.col(r_prefix + r_start), F.col(r_prefix + r_end)
    pairs = lb.join(
        rb,
        (F.col("_ib") == F.col("_jb"))
        & (F.col("_ib")
           == fdiv(f"greatest({l_prefix}{l_start}, {r_prefix}{r_start})"))
        & (F.greatest(ls, rs) <= F.least(le, re_)),
        "inner",
    )
    return pairs.drop("_ib", "_jb").withColumn(
        "overlap_us", F.least(le, re_) - F.greatest(ls, rs)
    )
