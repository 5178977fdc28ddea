"""Gap-based event sessionization — the webtext-pipeline staple
(crawl/user activity -> dwell-time sessions) as a ONE-SHUFFLE plan.

Scale shape: the lag/flag/cumsum windows and the per-session aggregate
all cluster on user_id, and Spark's EnsureRequirements recognizes that
HashPartitioning(user_id) satisfies ClusteredDistribution(user_id,
session_idx) (partition keys are a subset of the grouping keys), so
the whole operator is scan -> ONE exchange on user_id -> sort ->
windows -> partial+final hash aggregate. No second shuffle for the
session rollup — test_sessions asserts exactly one Exchange.

Engine-exact by construction: all arithmetic is integer microseconds
(unix_micros / epoch_us) and integer cents, so the DuckDB oracle twin
matches bit-for-bit — no float summation-order hazards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_GAP_US = 30 * 60 * 1_000_000  # 30 min


def sessionize(events: DataFrame, gap_us: int = DEFAULT_GAP_US,
               user_col: str = "user_id", ts_col: str = "ts",
               order_tiebreak: str = "event_id",
               value_col: str | None = "value") -> DataFrame:
    """Per-user sessions with a ``gap_us`` inactivity timeout.

    Returns one row per (user, session_idx): event count, start/end in
    epoch microseconds, dwell, and (optionally) the value sum in
    integer cents. ``order_tiebreak`` makes the window order total, so
    session boundaries are deterministic under equal timestamps.
    """
    # the testdata ships TIMESTAMP_NTZ; the session timezone is pinned
    # to UTC (session.py DEFAULTS), so the cast interprets the naive
    # value exactly as DuckDB's epoch_us does
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    # order by the integer micros (monotone in ts) + tiebreak: total,
    # deterministic, and the projection below can drop the raw ts
    w = Window.partitionBy(user_col).orderBy("_us", order_tiebreak)
    cols = [F.col(user_col), F.col(order_tiebreak), us.alias("_us")]
    if value_col is not None:
        # integer cents: associative, engine-exact (a double SUM's
        # order differs between engines in the last ulp)
        cols.append(F.round(F.col(value_col) * 100).cast("long")
                    .alias("_cents"))
    df = events.select(*cols)
    df = df.withColumn("_prev", F.lag("_us").over(w))
    df = df.withColumn(
        "_new",
        F.when(F.col("_prev").isNull()
               | ((F.col("_us") - F.col("_prev")) > F.lit(gap_us)),
               F.lit(1)).otherwise(F.lit(0)),
    )
    df = df.withColumn(
        "session_idx",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    aggs = [
        F.count("*").alias("n_events"),
        F.min("_us").alias("start_us"),
        F.max("_us").alias("end_us"),
        (F.max("_us") - F.min("_us")).alias("dwell_us"),
    ]
    if value_col is not None:
        aggs.append(F.sum("_cents").alias("value_cents"))
    return df.groupBy(user_col, "session_idx").agg(*aggs)


def sessionize_sql(gap_us: int = DEFAULT_GAP_US,
                   table: str = "events") -> str:
    """Literal DuckDB twin of :func:`sessionize` (same integer
    arithmetic, same total order, BIGINT casts where DuckDB widens)."""
    return f"""
WITH flagged AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CAST(round(value * 100) AS BIGINT) AS cents,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
              OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap_us}
              THEN 1 ELSE 0 END AS new_s
  FROM {table}
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, us, cents,
         CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_idx
  FROM flagged
)
SELECT user_id, session_idx,
       COUNT(*) AS n_events,
       MIN(us) AS start_us,
       MAX(us) AS end_us,
       MAX(us) - MIN(us) AS dwell_us,
       CAST(SUM(cents) AS BIGINT) AS value_cents
FROM sess
GROUP BY user_id, session_idx
"""
