"""Operator-scale evidence for URL canonicalization: normalize a
synthetic crawl's urls (clean + deterministic messy variants, so every
normalization rule fires) at tens of millions of rows and report
urls/sec, plus the canonical-key dedup ratio. Appends a BENCH.md
section.

Usage: python scripts/url_stress.py [n_pages]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000_000

    from pyspark.sql import functions as F

    from geospark.pages import synth_pages
    from geospark.session import get_spark
    from geospark.urls import messy_variant, url_normalize

    spark = get_spark(
        "url-stress", master="local[32]", shuffle_partitions=64,
        extra_conf={"spark.ui.enabled": "false",
                    "spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # clean urls + one messy variant each: 2x n_pages input rows,
    # every branch of the messifier exercised round-robin
    pages = synth_pages(spark, n_pages, partitions=64).select("url")
    pid = F.regexp_extract("url", r"/page/(\d+)$", 1).cast("long")
    raw = pages.unionByName(
        pages.select(messy_variant(F.col("url"), pid).alias("url"))
    )
    n_raw = 2 * n_pages

    # warm (spawns workers, compiles codegen) on a small slice, untimed
    pages.limit(10_000).select(
        url_normalize("url").alias("u")).agg(F.count("*")).collect()

    t0 = time.time()
    stats = raw.select(url_normalize("url").alias("u")).agg(
        F.count("*").alias("n"),
        F.approx_count_distinct("u", 0.005).alias("n_canon"),
    ).collect()[0]
    secs = time.time() - t0

    res = {
        "n_raw_urls": n_raw,
        "sec": round(secs, 1),
        "urls_per_sec": round(n_raw / secs),
        "n_canonical_approx": int(stats.n_canon),
        "collapse_ratio": round(n_raw / stats.n_canon, 3),
    }
    print(json.dumps(res))

    bench = REPO / "BENCH.md"
    with bench.open("a") as f:
        f.write(
            f"\n## URL canonicalization at operator scale "
            f"({time.strftime('%Y-%m-%d %H:%M')}, local[32])\n\n"
            f"| input urls | wall s | urls/sec | approx canonical keys | collapse |\n"
            f"| --- | --- | --- | --- | --- |\n"
            f"| {n_raw:,} (clean + messy variant each) | {res['sec']} "
            f"| {res['urls_per_sec']:,} | {res['n_canonical_approx']:,} "
            f"| {res['collapse_ratio']}x |\n\n"
            f"Pure codegen map stage (urls.url_normalize): the wall is one "
            f"pass over the synthesized input, no shuffle before the "
            f"count/NDV aggregate. Branch 5 of the messifier (scheme "
            f"downgrade) is the non-collapsing control, so the expected "
            f"collapse is ~2x minus that slice.\n"
        )
    spark.stop()


if __name__ == "__main__":
    main()
