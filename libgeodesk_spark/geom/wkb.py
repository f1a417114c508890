"""WKB interop: accept Well-Known-Binary polygons as zone input — the
analog of the reference's GEOS bridge (J10, PreparedFilterFactory.cpp:45-104
builds prepared filters from arbitrary GEOS geometry) without a GEOS
dependency: the standard WKB layout is decoded directly with numpy.

Coordinates in the WKB are interpreted as lon/lat degrees and projected to
int32 Mercator (the reference's GEOS bridge does the same unit conversion).
Supported: Point, LineString, Polygon, MultiPolygon (both byte orders).
"""

from __future__ import annotations

import struct

import numpy as np

from libgeodesk_spark.mercator import np_x_from_lon, np_y_from_lat

_POINT, _LINESTRING, _POLYGON, _MULTIPOLYGON = 1, 2, 3, 6


class _Reader:
    def __init__(self, data: bytes):
        self.data = memoryview(data)
        self.pos = 0

    def u8(self) -> int:
        v = self.data[self.pos]
        self.pos += 1
        return v

    def u32(self, bo: str) -> int:
        v = struct.unpack_from(bo + "I", self.data, self.pos)[0]
        self.pos += 4
        return v

    def coords(self, bo: str, n: int, dims: int = 2) -> np.ndarray:
        """Read n points of ``dims`` doubles each; keep x,y (Z/M dropped)."""
        arr = np.frombuffer(self.data, dtype=("<f8" if bo == "<" else ">f8"),
                            count=dims * n, offset=self.pos).reshape(n, dims)
        self.pos += 8 * dims * n
        return arr[:, :2]


def _ring_to_merc(lonlat: np.ndarray) -> np.ndarray:
    x = np_x_from_lon(lonlat[:, 0])
    y = np_y_from_lat(lonlat[:, 1])
    return np.stack([x, y], axis=1)


def wkb_to_rings(data: bytes) -> list[np.ndarray]:
    """WKB → list of closed int32-Mercator rings (Polygon/MultiPolygon),
    or a single open polyline / point array (LineString/Point)."""
    r = _Reader(data)
    return _read_geometry(r)


# EWKB (PostGIS) dimensionality / SRID flag bits in the type word
_EWKB_Z, _EWKB_M, _EWKB_SRID = 0x80000000, 0x40000000, 0x20000000


def _parse_type(r: _Reader, bo: str) -> tuple[int, int]:
    """Decode the WKB type word → (base geometry type, dims per point).

    Handles both EWKB flag bits (Z/M/SRID — the SRID word is consumed
    here) and ISO 19125 type offsets (+1000 Z, +2000 M, +3000 ZM)."""
    raw = r.u32(bo)
    dims = 2
    if raw & (_EWKB_Z | _EWKB_M | _EWKB_SRID):
        dims += bool(raw & _EWKB_Z) + bool(raw & _EWKB_M)
        if raw & _EWKB_SRID:
            r.u32(bo)                      # skip the 4-byte SRID
        base = raw & 0x1FFFFFFF
    else:
        base = raw
    if base >= 1000:                       # ISO Z/M/ZM type offsets
        offset, base = base // 1000, base % 1000
        if offset not in (1, 2, 3):
            raise ValueError(f"unsupported ISO WKB type offset {offset}000")
        dims += 2 if offset == 3 else 1
    return base, dims


def _read_geometry(r: _Reader) -> list[np.ndarray]:
    bo = "<" if r.u8() == 1 else ">"
    gtype, dims = _parse_type(r, bo)
    if gtype == _POINT:
        return [_ring_to_merc(r.coords(bo, 1, dims))]
    if gtype == _LINESTRING:
        return [_ring_to_merc(r.coords(bo, r.u32(bo), dims))]
    if gtype == _POLYGON:
        return [_ring_to_merc(r.coords(bo, r.u32(bo), dims))
                for _ in range(r.u32(bo))]
    if gtype == _MULTIPOLYGON:
        rings: list[np.ndarray] = []
        for _ in range(r.u32(bo)):
            rings.extend(_read_geometry(r))
        return rings
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def bbox_to_ring(min_x: int, min_y: int, max_x: int, max_y: int) -> np.ndarray:
    """Box → 4-segment prepared polygon ring (J11, the reference's
    ``forBox``, PreparedFilterFactory.cpp:96-104). Mercator units in."""
    return np.array([[min_x, min_y], [max_x, min_y], [max_x, max_y],
                     [min_x, max_y], [min_x, min_y]], dtype=np.int64)


def prepare_zone_from_wkb(zone_id: str, data: bytes, zoom: int | None = None):
    from libgeodesk_spark.geom.zones import prepare_zone
    return prepare_zone(zone_id, wkb_to_rings(data), zoom=zoom)


# ---------------------------------------------------------------------------
# WKB EXPORT (G9 outbound half: GeometryBuilder.cpp builds GEOS geometry;
# here standard little-endian WKB from int-Mercator rings)
# ---------------------------------------------------------------------------

def _merc_rings_to_lonlat(rings):
    from libgeodesk_spark.mercator import np_lat_from_y, np_lon_from_x
    out = []
    for r in rings:
        r = np.asarray(r).reshape(-1, 2)
        out.append(np.stack([np_lon_from_x(r[:, 0]),
                             np_lat_from_y(r[:, 1])], axis=1))
    return out


def rings_to_wkb(rings, merc: bool = True) -> bytes:
    """Closed int-Mercator rings → little-endian WKB Polygon (one ring
    list) — coordinates exported as lon/lat degrees (the reference's GEOS
    bridge exports degree geometry too). ``merc=False`` writes the raw
    coordinates unprojected."""
    ll = _merc_rings_to_lonlat(rings) if merc else \
        [np.asarray(r, dtype=np.float64).reshape(-1, 2) for r in rings]
    out = struct.pack("B", 1) + struct.pack("<I", _POLYGON) \
        + struct.pack("<I", len(ll))
    for r in ll:
        out += struct.pack("<I", len(r))
        out += r.astype("<f8").tobytes()
    return out


def multipolygon_to_wkb(polys, merc: bool = True) -> bytes:
    """List of ring-lists → WKB MultiPolygon."""
    out = struct.pack("B", 1) + struct.pack("<I", _MULTIPOLYGON) \
        + struct.pack("<I", len(polys))
    for rings in polys:
        out += rings_to_wkb(rings, merc)
    return out
