"""Spatiotemporal co-location join: which users were within ``d``
meters of each other within ``t`` of each other in time — the
contact / co-occurrence operator (encounter mining, exposure
notification, co-visitation features).

The naive formulation is a range self-join (|dt| <= t AND dist <= d)
— quadratic at 100 TB.  The scalable shape is double bucketing:

  RIGHT side (the LATER event of each pair): its exact mercator cell
  at a zoom whose equatorial edge ~ d, and its time bucket
  tb = us DIV t.
  LEFT side (the EARLIER event): the latitude-aware buffered-bbox
  COVER of its d-disk (the same cover the cluster operator uses —
  a fixed 3x3 under-covers at high latitude) x time replicas
  (tb, tb+1) — because 0 <= dt <= t pins the later event's bucket to
  one of those two.

One hash equi-join on (cell, tb), then an exact refine:
floor(haversine) <= d (integer-meter quantized compare — an engine
ulp only flips membership when a distance lands within 1 ulp of an
exact integer), 0 < dt' <= t with the (us, event_id) total order
breaking ties, different users.  Each qualifying pair matches on
EXACTLY ONE (cell, tb) key — the right side's cell and bucket are
unique and the left side's cover/replica lists are deduplicated — so
no distinct pass is needed.

The per-pair rollup shuffles once more on the normalized
(user_lo, user_hi) key.  Everything after the one Arrow-batched cover
UDF is JVM Column math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geospark.cells import with_linear_cell_at_zoom
from geospark.cluster import _neighbor_cells_expr, _zoom_for_dist
from geospark.functions import kernels as K


def colocate_pairs(points: DataFrame, d_max_m: float, t_max_us: int,
                   user: str = "user_id", id_col: str = "event_id",
                   ts: str = "ts", lat: str = "lat",
                   lng: str = "lng") -> DataFrame:
    """(user_lo, user_hi, n_encounters, sum_step_m): encounter counts
    per unordered user pair; ``sum_step_m`` is the integer sum of the
    floored encounter distances (an oracle-checkable checksum over
    every qualifying pair's geometry)."""
    zoom = _zoom_for_dist(d_max_m)
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    base = points.select(
        F.col(user).alias("u"), F.col(id_col).alias("eid"),
        us.alias("us"), F.col(lat).alias("la"), F.col(lng).alias("ln"),
    ).withColumn("tb", F.col("us") - F.pmod("us", F.lit(t_max_us)))

    right = with_linear_cell_at_zoom(
        base, zoom, lat="la", lng="ln", col="cell"
    ).select(
        F.col("u").alias("u_r"), F.col("eid").alias("eid_r"),
        F.col("us").alias("us_r"), F.col("la").alias("la_r"),
        F.col("ln").alias("ln_r"), F.col("tb").alias("tb_r"), "cell",
    )

    cover = _neighbor_cells_expr(zoom, d_max_m)
    left = base.select(
        F.col("u").alias("u_l"), F.col("eid").alias("eid_l"),
        F.col("us").alias("us_l"), F.col("la").alias("la_l"),
        F.col("ln").alias("ln_l"),
        F.explode(cover("la", "ln")).alias("cell"),
        F.col("tb").alias("_tb0"),
    ).select(
        "*",
        F.explode(F.array(F.col("_tb0"),
                          F.col("_tb0") + F.lit(t_max_us)))
        .alias("tb_r"),
    ).drop("_tb0")

    step_m = F.floor(K.distance(F.col("la_l"), F.col("ln_l"),
                                F.col("la_r"), F.col("ln_r")))
    pairs = (
        left.join(right, ["cell", "tb_r"])
        .filter(
            (F.col("u_l") != F.col("u_r"))
            # (us, event_id) total order: left is strictly earlier
            & ((F.col("us_l") < F.col("us_r"))
               | ((F.col("us_l") == F.col("us_r"))
                  & (F.col("eid_l") < F.col("eid_r"))))
            & (F.col("us_r") - F.col("us_l") <= F.lit(t_max_us))
        )
        .withColumn("step_m", step_m)
        .filter(F.col("step_m") <= F.lit(float(d_max_m)))
    )
    return (
        pairs.groupBy(
            F.least("u_l", "u_r").alias("user_lo"),
            F.greatest("u_l", "u_r").alias("user_hi"),
        )
        .agg(
            F.count("*").alias("n_encounters"),
            F.sum(F.col("step_m").cast("long")).alias("sum_step_m"),
        )
    )
