"""Driver-contract smoke: entry() runs, queries()/oracle_sql() agree."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as E


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"area_id", "tile_x", "tile_y", "n_points"}


def test_queries_have_oracles():
    qs = E.queries()
    oracles = E.oracle_sql()
    assert len(qs) >= 10
    missing = set(oracles) - set(qs)
    assert not missing, f"oracles without queries: {missing}"


def test_tile_range_relation(spark):
    from geospark.cells import tile_range

    rows = tile_range(spark, 2, 1, 4, 2, 5).collect()
    # row-major y-then-x (src/tile.cc:44-52)
    assert [(r["tile_x"], r["tile_y"]) for r in rows] == [
        (2, 1), (3, 1), (4, 1), (2, 2), (3, 2), (4, 2),
    ]
    assert all(r["zoom"] == 5 for r in rows)


def test_tile_pyramid_counts(spark):
    from pyspark.sql import functions as F

    from geospark.cells import tile_pyramid

    got = tile_pyramid(spark, 3).groupBy("zoom").count().orderBy("zoom").collect()
    assert [(r["zoom"], r["count"]) for r in got] == [
        (0, 1), (1, 4), (2, 16), (3, 64),
    ]
