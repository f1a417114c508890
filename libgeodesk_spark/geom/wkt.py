"""WKT (well-known text) INBOUND parse — dependency-free.

The reference accepts query/filter geometry through GEOS, which reads
WKT and WKB alike (GeometryBuilder; geodesk-py exposes shapely
geometries, whose canonical text form is WKT). ``geom/wkb.py`` covers
the binary half; this module completes the text half with the same
contract: lon/lat coordinates → closed int-Mercator rings ready for
``prepare_zone`` / the polygonizer.

Supported: POINT, LINESTRING, POLYGON, MULTIPOLYGON (2D; EMPTY yields
no rings). Z/M dimensions raise — the engine is planar by design, and
silently dropping ordinates would corrupt round-trips.
"""

from __future__ import annotations

import re

import numpy as np

from libgeodesk_spark.geom.wkb import _ring_to_merc

# accepts leading-decimal ('.5') and trailing-decimal ('5.') forms —
# a digit-required-before-the-point regex silently split '.5' into '5'
# (review finding r4: zones prepared at wildly wrong coordinates)
_NUM = re.compile(r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?")


def _parse_ring_text(body: str) -> np.ndarray:
    """'lon lat, lon lat, ...' → (k, 2) float lon/lat array. Tokens are
    FULL-matched — malformed numerics raise instead of partially
    parsing into wrong coordinates."""
    pts = []
    for pair in body.split(","):
        toks = pair.split()
        if len(toks) > 2:
            raise ValueError(
                "WKT Z/M ordinates unsupported — the engine is planar; "
                "strip to 2D before ingest")
        if len(toks) != 2 or not all(_NUM.fullmatch(t) for t in toks):
            raise ValueError(f"bad WKT coordinate pair: {pair!r}")
        pts.append((float(toks[0]), float(toks[1])))
    return np.array(pts, dtype=np.float64)


def _split_groups(body: str) -> list[str]:
    """Split a parenthesized group list '( ... ), ( ... )' at depth 0."""
    out, depth, start = [], 0, None
    for i, ch in enumerate(body):
        if ch == "(":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                out.append(body[start:i])
    if depth != 0:
        raise ValueError("unbalanced parentheses in WKT")
    return out


def wkt_to_rings(text: str) -> list[np.ndarray]:
    """WKT → list of closed int-Mercator rings (POLYGON/MULTIPOLYGON),
    or a single open polyline / point array (LINESTRING/POINT) — the
    same contract as :func:`geom.wkb.wkb_to_rings`."""
    s = text.strip()
    m = re.match(r"^([A-Za-z]+)\s*(ZM|Z|M)?\s*(EMPTY|\()", s)
    if not m:
        raise ValueError(f"unparseable WKT: {s[:40]!r}")
    kind = m.group(1).upper()
    if m.group(2):
        raise ValueError(
            "WKT Z/M geometry unsupported — the engine is planar")
    if m.group(3) == "EMPTY":
        return []
    body = s[m.end() - 1:]
    if kind == "POINT":
        ll = _parse_ring_text(_split_groups(f"({body})")[0].strip("() "))
        return [_ring_to_merc(ll)]
    if kind == "LINESTRING":
        ll = _parse_ring_text(body.strip("() "))
        return [_ring_to_merc(ll)]
    if kind == "POLYGON":
        return [_close(_ring_to_merc(_parse_ring_text(g)))
                for g in _split_groups(body[1:-1])]
    if kind == "MULTIPOLYGON":
        rings = []
        for poly in _split_groups(body[1:-1]):
            rings += [_close(_ring_to_merc(_parse_ring_text(g)))
                      for g in _split_groups(poly)]
        return rings
    raise ValueError(f"unsupported WKT type {kind!r} — only POINT/"
                     f"LINESTRING/POLYGON/MULTIPOLYGON parse here")


def _close(r: np.ndarray) -> np.ndarray:
    if len(r) >= 2 and (r[0] != r[-1]).any():
        return np.vstack([r, r[:1]])
    return r


def prepare_zone_from_wkt(zone_id: str, text: str, zoom: int | None = None):
    from libgeodesk_spark.geom.zones import prepare_zone
    return prepare_zone(zone_id, wkt_to_rings(text), zoom=zoom)
