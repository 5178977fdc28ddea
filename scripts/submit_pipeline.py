"""spark-submit entrypoint for the flagship pipeline with
checkpoint/resume (north rule: `spark-submit --py-files geospark.zip
scripts/submit_pipeline.py --pages <table> --out <root>`).

Stages (each committed as a snapshot; rerun resumes after the last
committed stage):
  extract  pages -> points (Arrow-batched mention extraction)
  pip      PIP join against the configured polygon layer
  tiles    tile-key assignment + per-(area, tile) aggregation

On a cluster: package the lib with
  zip -r geospark.zip geospark/
  spark-submit --py-files geospark.zip scripts/submit_pipeline.py \
      --pages s3://bucket/pages --out s3://bucket/geo_out --zoom 8
Locally the defaults run against the synthetic pages table.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", default=None,
                    help="pages parquet path (default: synthesize)")
    ap.add_argument("--n-pages", type=int, default=100_000,
                    help="synthetic page count when --pages not given")
    ap.add_argument("--out", required=True, help="pipeline snapshot root")
    ap.add_argument("--zoom", type=int, default=8)
    ap.add_argument("--run-id", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from geospark import geodata as G
    from geospark.cells import with_tile
    from geospark.extract import extract_points
    from geospark.joins import pip_join
    from geospark.pages import synth_pages
    from geospark.runtime import Pipeline, Stage
    from geospark.session import get_spark

    spark = get_spark("geospark-pipeline")
    spark.sparkContext.setLogLevel("WARN")

    if args.pages:
        pages = spark.read.parquet(args.pages)
    else:
        pages = synth_pages(spark, args.n_pages)

    layer = G.demo_layer()
    zoom = args.zoom

    pipe = Pipeline(spark, args.out, run_id=args.run_id)
    t0 = time.time()
    result = pipe.run(
        pages,
        [
            Stage("extract", extract_points),
            Stage("pip", lambda df: pip_join(df, layer)),
            Stage(
                "tiles",
                lambda df: (
                    with_tile(df, zoom)
                    .groupBy("area_id", "tile_x", "tile_y")
                    .agg(F.count("*").alias("n_points"))
                ),
            ),
        ],
    )
    rows = result.count()
    print(json.dumps({
        "run_id": pipe.run_id,
        "rows_out": rows,
        "wall_s": round(time.time() - t0, 1),
        "lineage_rows": pipe.lineage().count(),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
