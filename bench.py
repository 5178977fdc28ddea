"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Also measures the north-rule pipeline (synthetic pages -> geo-entity
extract -> cell/tile assign -> PIP join -> tile aggregation) and
reports pages/sec. Scaling evidence (N vs 4N cores) lives in
scripts/scaling_bench.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

N_PIPELINE_PAGES = int(os.environ.get("GEOSPARK_BENCH_PAGES", "200000"))


def run_pipeline(spark, n_pages: int) -> tuple[float, int]:
    """The flagship pages pipeline; returns (seconds, rows_out)."""
    from pyspark.sql import functions as F

    from geospark import geodata as G
    from geospark.cells import with_tile
    from geospark.extract import extract_points
    from geospark.joins import pip_join
    from geospark.pages import synth_pages

    t0 = time.time()
    pages = synth_pages(spark, n_pages)
    pts = extract_points(pages)
    hits = pip_join(pts, G.demo_layer())
    tiles = (
        with_tile(hits, 8)
        .groupBy("area_id", "tile_x", "tile_y")
        .agg(F.count("*").alias("n_points"))
    )
    n = tiles.count()
    return time.time() - t0, n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import __spark_entry__ as E
    from geospark.session import get_spark

    spark = get_spark(
        "geospark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    for name, fn in E.queries().items():
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    pipe_sec, _ = run_pipeline(spark, N_PIPELINE_PAGES)
    timings["pages_pipeline"] = round(pipe_sec, 3)

    sf = sf_dir.rstrip("/").split("sf")[-1]
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
                "pipeline_pages": N_PIPELINE_PAGES,
                "pages_per_sec": round(N_PIPELINE_PAGES / pipe_sec, 1),
                "cpus": int(cpus),
            }
        )
    )


if __name__ == "__main__":
    main()
