"""WKB zone-input tests (J10/J11): hand-built standard WKB, both byte
orders, polygon with hole, multipolygon; bbox-as-polygon ring."""

import struct

import numpy as np

from libgeodesk_spark import mercator as M
from libgeodesk_spark.geom import kernel
from libgeodesk_spark.geom.wkb import (
    bbox_to_ring,
    prepare_zone_from_wkb,
    wkb_to_rings,
)
from libgeodesk_spark.geom.zones import rings_to_edges


def wkb_polygon(rings, bo="<"):
    tag = 1 if bo == "<" else 0
    out = struct.pack("B", tag) + struct.pack(bo + "I", 3) \
        + struct.pack(bo + "I", len(rings))
    for ring in rings:
        out += struct.pack(bo + "I", len(ring))
        for lon, lat in ring:
            out += struct.pack(bo + "dd", lon, lat)
    return out


def wkb_multipolygon(polys, bo="<"):
    tag = 1 if bo == "<" else 0
    out = struct.pack("B", tag) + struct.pack(bo + "I", 6) \
        + struct.pack(bo + "I", len(polys))
    for p in polys:
        out += wkb_polygon(p, bo)
    return out


SQUARE = [(8.0, 47.0), (9.0, 47.0), (9.0, 48.0), (8.0, 48.0), (8.0, 47.0)]
HOLE = [(8.4, 47.4), (8.6, 47.4), (8.6, 47.6), (8.4, 47.6), (8.4, 47.4)]


def test_polygon_roundtrip_both_orders():
    for bo in ("<", ">"):
        rings = wkb_to_rings(wkb_polygon([SQUARE], bo))
        assert len(rings) == 1 and rings[0].shape == (5, 2)
        assert rings[0][0, 0] == M.x_from_lon(8.0)
        assert rings[0][0, 1] == M.y_from_lat(47.0)


def test_polygon_with_hole_locate():
    z = prepare_zone_from_wkb("holed", wkb_polygon([SQUARE, HOLE]))
    inside = (M.x_from_lon(8.2), M.y_from_lat(47.2))
    in_hole = (M.x_from_lon(8.5), M.y_from_lat(47.5))
    outside = (M.x_from_lon(7.0), M.y_from_lat(47.5))
    loc = kernel.locate_points(
        [inside[0], in_hole[0], outside[0]],
        [inside[1], in_hole[1], outside[1]], z.edges)
    assert list(loc) == [1, -1, -1]


def test_multipolygon():
    far = [(10.0, 47.0), (10.5, 47.0), (10.5, 47.5), (10.0, 47.5), (10.0, 47.0)]
    rings = wkb_to_rings(wkb_multipolygon([[SQUARE], [far]]))
    assert len(rings) == 2
    edges = rings_to_edges(rings)
    p1 = (M.x_from_lon(8.5), M.y_from_lat(47.3))
    p2 = (M.x_from_lon(10.2), M.y_from_lat(47.2))
    p3 = (M.x_from_lon(9.5), M.y_from_lat(47.2))
    loc = kernel.locate_points([p1[0], p2[0], p3[0]],
                               [p1[1], p2[1], p3[1]], edges)
    assert list(loc) == [1, 1, -1]


def test_bbox_to_ring():
    ring = bbox_to_ring(0, 0, 100, 50)
    edges = rings_to_edges([ring])
    assert kernel.locate_points([50], [25], edges)[0] == 1
    assert kernel.locate_points([101], [25], edges)[0] == -1
    assert kernel.locate_points([100], [25], edges)[0] == 0


def wkb_polygon_flags(rings, bo="<", ewkb_z=False, ewkb_m=False,
                      srid=None, iso_offset=0, extra_dims=0):
    """Polygon WKB with EWKB flag bits or ISO type offsets; pads each
    point with ``extra_dims`` dummy doubles (the Z/M values)."""
    tag = 1 if bo == "<" else 0
    t = 3 + iso_offset * 1000
    if ewkb_z:
        t |= 0x80000000
    if ewkb_m:
        t |= 0x40000000
    if srid is not None:
        t |= 0x20000000
    out = struct.pack("B", tag) + struct.pack(bo + "I", t)
    if srid is not None:
        out += struct.pack(bo + "I", srid)
    out += struct.pack(bo + "I", len(rings))
    for ring in rings:
        out += struct.pack(bo + "I", len(ring))
        for lon, lat in ring:
            out += struct.pack(bo + "dd", lon, lat)
            out += struct.pack(bo + f"{extra_dims}d", *([7.0] * extra_dims))
    return out


def test_ewkb_z_polygon():
    plain = wkb_to_rings(wkb_polygon([SQUARE]))
    z = wkb_to_rings(wkb_polygon_flags([SQUARE], ewkb_z=True, extra_dims=1))
    assert np.array_equal(plain[0], z[0])


def test_ewkb_zm_srid_polygon():
    plain = wkb_to_rings(wkb_polygon([SQUARE]))
    zm = wkb_to_rings(wkb_polygon_flags(
        [SQUARE], ewkb_z=True, ewkb_m=True, srid=4326, extra_dims=2))
    assert np.array_equal(plain[0], zm[0])


def test_iso_z_polygon_both_orders():
    plain = wkb_to_rings(wkb_polygon([SQUARE]))
    for bo in ("<", ">"):
        z = wkb_to_rings(wkb_polygon_flags([SQUARE], bo=bo, iso_offset=1,
                                           extra_dims=1))
        assert np.array_equal(plain[0], z[0])


def test_iso_zm_polygon():
    plain = wkb_to_rings(wkb_polygon([SQUARE]))
    zm = wkb_to_rings(wkb_polygon_flags([SQUARE], iso_offset=3, extra_dims=2))
    assert np.array_equal(plain[0], zm[0])


def test_unsupported_iso_offset_raises():
    import pytest
    with pytest.raises(ValueError, match="ISO WKB type offset"):
        wkb_to_rings(wkb_polygon_flags([SQUARE], iso_offset=4, extra_dims=1))


def test_wkb_export_roundtrip():
    """rings -> WKB -> rings roundtrip: re-importing the exported WKB
    reproduces the Mercator coordinates exactly (the 100-nanodegree
    rounding of lon/lat is below one Mercator unit everywhere)."""
    from libgeodesk_spark.geom.wkb import multipolygon_to_wkb, rings_to_wkb
    from libgeodesk_spark.geom.zones import prepare_zone
    from libgeodesk_spark.sources.points import GATE_ZONES

    rings = [np.array(r, dtype=np.int64) for r in GATE_ZONES["holed"]]
    data = rings_to_wkb(rings)
    back = wkb_to_rings(data)
    assert len(back) == 2
    for a, b in zip(rings, back):
        assert np.abs(a - b).max() <= 1   # one unit of projection rounding

    far = [np.array(r, dtype=np.int64) for r in GATE_ZONES["convex"]]
    mp = multipolygon_to_wkb([rings, far])
    back2 = wkb_to_rings(mp)
    assert len(back2) == 3


class TestGeoParquet:
    def test_round_trip_with_geo_metadata(self, spark, tmp_path):
        """GeoParquet sink/source: distributed pyarrow footers carry the
        spec's `geo` metadata; WKB geometry survives a write→read→decode
        round trip within the ±1-unit degree-projection contract."""
        import numpy as np

        from libgeodesk_spark.geom.wkb import rings_to_wkb
        from libgeodesk_spark.sources.geoparquet import (
            decode_geometry, read_geoparquet, write_geoparquet)
        Z = 1 << 20
        rings = [
            ("a", [np.array([[0, 0], [4 * Z, 0], [4 * Z, 4 * Z],
                             [0, 4 * Z], [0, 0]], dtype=np.int64)]),
            ("b", [np.array([[10 * Z, 0], [12 * Z, 0], [11 * Z, 2 * Z],
                             [10 * Z, 0]], dtype=np.int64)]),
        ]
        rows = [(zid, bytearray(rings_to_wkb(rs))) for zid, rs in rings]
        df = spark.createDataFrame(rows, "zone_id string, geometry binary") \
            .repartition(2)
        path = str(tmp_path / "gpq")
        n_files = write_geoparquet(df, path)
        assert n_files >= 1

        back, geo = read_geoparquet(spark, path)
        assert geo["primary_column"] == "geometry"
        assert geo["columns"]["geometry"]["encoding"] == "WKB"
        assert back.count() == 2

        dec = {r.zone_id: r.rings for r in
               decode_geometry(back, geo).collect()}
        for zid, rs in rings:
            got = dec[zid]
            assert len(got) == len(rs)
            for gring, wring in zip(got, rs):
                g = np.array([[p["x"], p["y"]] for p in gring])
                assert np.abs(g - wring).max() <= 1  # degree round trip
