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

# 2M pages: large enough that the timed pass measures steady-state
# throughput (the 200k default was fixed-overhead-dominated — 164k
# pages/sec reported vs 3.5M pages/sec measured at 60M pages; see
# BENCH.md scaling runs), small enough to keep bench wall bounded.
N_PIPELINE_PAGES = int(os.environ.get("GEOSPARK_BENCH_PAGES", "2000000"))


def _pages_parquet(spark, n_pages: int) -> str:
    """Materialize the synthetic pages table once (bench setup — the
    north-rule pipeline reads pages from a TABLE; synthesis is not
    part of the measured path)."""
    from geospark.pages import synth_pages

    path = f"/tmp/geospark_bench_pages_{n_pages}"
    if not os.path.exists(f"{path}/_SUCCESS"):
        synth_pages(spark, n_pages).write.mode("overwrite").parquet(path)
    return path


def _pipeline_df(spark, path: str):
    from pyspark.sql import functions as F

    from geospark import geodata as G
    from geospark.cells import with_tile
    from geospark.extract import extract_points
    from geospark.joins import pip_join

    pages = spark.read.parquet(path)
    pts = extract_points(pages)
    hits = pip_join(pts, G.demo_layer())
    return (
        with_tile(hits, 8)
        .groupBy("area_id", "tile_x", "tile_y")
        .agg(F.count("*").alias("n_points"))
    )


def run_pipeline(spark, n_pages: int, warm: bool = True) -> tuple[float, int]:
    """The flagship pages pipeline (read -> extract -> PIP join ->
    tile agg); returns (seconds, rows_out). ``warm=True`` runs the
    pipeline once untimed first so every executor thread's Python
    worker is already spawned — the steady-state throughput a long job
    sees (worker startup is a per-executor one-off at 100 TB scale)."""
    path = _pages_parquet(spark, n_pages)
    if warm:
        _pipeline_df(spark, path).count()
    t0 = time.time()
    n = _pipeline_df(spark, path).count()
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

    # spawn every executor thread's Python worker once before timing
    # (steady-state measurement — same rationale as run_pipeline's warm
    # pass; worker startup is a per-executor one-off on a real cluster)
    from pyspark.sql import functions as F
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    _warm = pandas_udf(lambda x: x, "double", PandasUDFType.SCALAR)
    spark.range(0, int(cpus) * 4, numPartitions=int(cpus)).select(
        _warm(F.col("id").cast("double"))
    ).count()

    # TWO full passes over the registry, report the per-query MIN:
    # a query's wall depends strongly on its POSITION in a fresh
    # session (JVM JIT + janino codegen + page cache warm over the
    # first ~50 queries: the same query measures 0.8s deep in a warm
    # 127-query session and 8s first — reproduced on two code
    # versions, BENCH.md round 5), so a single pass benchmarks the
    # registry ORDER, not the plans. Pass 2 is the steady state a
    # long-running job sees; min-of-2 also shields single-query host
    # jitter (the round-4 doc_* false regressions).
    timings: dict[str, float] = {}
    n_passes = int(os.environ.get("GEOSPARK_BENCH_PASSES", "2"))
    for p in range(n_passes):
        for name, fn in E.queries().items():
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            sec = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, sec), sec)
            print(f"  bench[{p}] {name}: {sec}s", file=sys.stderr)

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
