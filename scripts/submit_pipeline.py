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
    ap.add_argument("--spool", default=None,
                    choices=["local", "reliable", "table"],
                    help="spool backend (default: master-aware — local "
                         "masters localCheckpoint, cluster masters "
                         "'reliable' when a checkpoint dir is set)")
    ap.add_argument("--spool-dir", default=None,
                    help="durable dir for the reliable/table backends "
                         "(HDFS/S3/DFS on a cluster); defaults to "
                         "<out>/_spool so cluster runs are durable "
                         "out of the box")
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

    # spool durability: the snapshot root is by construction a durable
    # filesystem (the pipeline commits there), so default the spool dir
    # under it — on a cluster master geospark.spool.choose_backend then
    # resolves to 'reliable' with no extra flags
    from geospark.spool import SPOOL_CONF, SPOOL_DIR_CONF

    spark.conf.set(SPOOL_DIR_CONF, args.spool_dir or f"{args.out}/_spool")
    if args.spool:
        spark.conf.set(SPOOL_CONF, args.spool)

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
