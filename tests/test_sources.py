"""Osmosis .poly parsing (reference-exact + full format) and the
normalized polygon table roundtrip."""

from __future__ import annotations

import numpy as np

from geospark.joins import Area, area_contains
from geospark.sources import (
    areas_to_df,
    df_to_areas,
    read_poly_file,
    read_poly_file_full,
)

SIMPLE_POLY = """australia_v
first_area
   0.1446763E+03   -0.3826869E+01
   0.1446693E+03   -0.3829355E+01
   0.1446627E+03   -0.3832233E+01
END
END
"""

FULL_POLY = """test_poly
outer1
   10.0   0.0
   10.0   10.0
   0.0   10.0
   0.0   0.0
END
!hole1
   6.0   4.0
   6.0   6.0
   4.0   6.0
   4.0   4.0
END
END
"""


def test_read_poly_file_reference_exact(tmp_path):
    p = tmp_path / "a.poly"
    p.write_text(SIMPLE_POLY)
    ring = read_poly_file(str(p))
    # reference: skip 2 header lines, (lng, lat) per line -> latlng
    assert ring.shape == (3, 2)
    assert abs(ring[0, 0] - (-3.826869)) < 1e-6  # lat
    assert abs(ring[0, 1] - 144.6763) < 1e-4     # lng


def test_read_poly_file_full_with_hole(tmp_path):
    p = tmp_path / "b.poly"
    p.write_text(FULL_POLY)
    area = read_poly_file_full(str(p), area_id=9)
    assert len(area.outers) == 1 and len(area.inners[0]) == 1
    got = area_contains(area, np.array([5.0, 2.0]), np.array([5.0, 2.0]))
    assert got.tolist() == [False, True]  # hole excluded, interior included


def test_polygon_table_roundtrip(spark):
    outer = np.array([(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0)])
    hole = np.array([(4.0, 4.0), (4.0, 6.0), (6.0, 6.0), (6.0, 4.0)])
    areas = [Area(1, [outer], [[hole]]), Area(2, [outer + 20.0])]
    df = areas_to_df(spark, areas)
    assert df.count() == 12
    back = df_to_areas(df)
    assert len(back) == 2
    assert np.array_equal(back[0].outers[0], outer)
    assert np.array_equal(back[0].inners[0][0], hole)
    assert np.array_equal(back[1].outers[0], outer + 20.0)
