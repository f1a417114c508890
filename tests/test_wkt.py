"""WKT inbound parser (geom/wkt.py): same contract as the WKB path —
identical lon/lat must produce bit-identical prepared zones."""

import numpy as np
import pytest

from libgeodesk_spark.geom.wkb import (
    _merc_rings_to_lonlat,
    prepare_zone_from_wkb,
    rings_to_wkb,
)
from libgeodesk_spark.geom.wkt import prepare_zone_from_wkt, wkt_to_rings


def _poly_wkt(lonlat_rings):
    ring_txt = lambda r: "(" + ", ".join(  # noqa: E731
        f"{lon!r} {lat!r}" for lon, lat in r) + ")"
    return "POLYGON (" + ", ".join(ring_txt(r) for r in lonlat_rings) + ")"


Z = 1 << 22


def _square(s=4 * Z, off=0):
    return np.array([[off, off], [off + s, off], [off + s, off + s],
                     [off, off + s], [off, off]], dtype=np.int64)


class TestWktParse:
    def test_polygon_with_hole_bit_identical_to_wkb(self):
        rings = [_square(), _square(s=Z, off=Z)]
        lonlat = _merc_rings_to_lonlat(rings)
        wkt = _poly_wkt(lonlat)
        a = prepare_zone_from_wkt("z", wkt)
        b = prepare_zone_from_wkb("z", rings_to_wkb(rings, merc=True))
        np.testing.assert_array_equal(a.edges, b.edges)
        assert a.cover == b.cover and a.bbox == b.bbox and a.zoom == b.zoom

    def test_multipolygon(self):
        r1, r2 = _square(), _square(off=8 * Z)
        lonlat = _merc_rings_to_lonlat([r1, r2])
        def ring_txt(r):
            return ", ".join(f"{lo!r} {la!r}" for lo, la in r)
        wkt = (f"MULTIPOLYGON ((({ring_txt(lonlat[0])})), "
               f"(({ring_txt(lonlat[1])})))")
        got = wkt_to_rings(wkt)
        assert len(got) == 2
        np.testing.assert_array_equal(got[0], r1)
        np.testing.assert_array_equal(got[1], r2)

    def test_point_and_linestring(self):
        pt = wkt_to_rings("POINT (10 20)")
        assert len(pt) == 1 and pt[0].shape == (1, 2)
        ls = wkt_to_rings("LINESTRING (0 0, 10 10, 20 0)")
        assert len(ls) == 1 and ls[0].shape == (3, 2)
        # open input stays open (linestring), polygons are closed
        pg = wkt_to_rings("POLYGON ((0 0, 1 0, 1 1))")
        assert (pg[0][0] == pg[0][-1]).all() and len(pg[0]) == 4

    def test_leading_decimal_and_malformed_numbers(self):
        """'.5' must parse as 0.5 (review finding r4: a digit-required
        regex split it into '5' — zones at wildly wrong coordinates);
        partial-parse junk must raise, not half-parse."""
        from libgeodesk_spark.mercator import x_from_lon, y_from_lat
        got = wkt_to_rings("POINT (.5 -.25)")[0]
        assert got[0, 0] == int(x_from_lon(0.5))
        assert got[0, 1] == int(y_from_lat(-0.25))
        got2 = wkt_to_rings("POINT (5. 2e1)")[0]
        assert got2[0, 0] == int(x_from_lon(5.0))
        assert got2[0, 1] == int(y_from_lat(20.0))
        with pytest.raises(ValueError, match="coordinate pair"):
            wkt_to_rings("POINT (1.2.3 4)")
        with pytest.raises(ValueError, match="coordinate pair"):
            wkt_to_rings("POINT (abc 4)")

    def test_rejects_and_empty(self):
        assert wkt_to_rings("POLYGON EMPTY") == []
        with pytest.raises(ValueError, match="planar"):
            wkt_to_rings("POINT Z (1 2 3)")
        with pytest.raises(ValueError, match="planar"):
            wkt_to_rings("POLYGON ((0 0 5, 1 0 5, 1 1 5, 0 0 5))")
        with pytest.raises(ValueError, match="unbalanced"):
            wkt_to_rings("POLYGON ((0 0, 1 0, 1 1)")
        with pytest.raises(ValueError, match="unsupported"):
            wkt_to_rings("GEOMETRYCOLLECTION (POINT (0 0))")
        with pytest.raises(ValueError, match="unparseable"):
            wkt_to_rings("nonsense")
