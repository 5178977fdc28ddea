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


def test_committed_poly_fixtures_parse():
    """The driver-query fixtures (fixtures/*.poly) parse with BOTH
    readers: the full Osmosis parse sees every ring; the
    reference-exact single-ring reader (src/polygon.cc:15-36) stops
    at the first ring's END."""
    import os

    base = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "fixtures")
    band = read_poly_file_full(os.path.join(base, "area_band.poly"), 1)
    assert len(band.outers) == 1 and len(band.inners[0]) == 1
    assert band.outers[0].shape == (5, 2) and band.inners[0][0].shape == (3, 2)
    north = read_poly_file_full(os.path.join(base, "area_north.poly"), 2)
    assert len(north.outers) == 1 and north.inners[0] == []
    assert north.outers[0].shape == (6, 2)
    # single-ring reader: first ring only, [lat, lng] order
    r1 = read_poly_file(os.path.join(base, "area_band.poly"))
    assert r1.shape == (5, 2)
    assert np.array_equal(r1, band.outers[0])
