"""Geometry scalar functions over ring/way columns — G1-G5 of SURVEY §2.6,
as pure Spark Column expressions (higher-order functions; no UDFs).

A ring column is ``array<struct<x:long, y:long>>``, closed (first == last
vertex), matching the reference's implicit ring closing
(WayCoordinateIterator.cpp:21-26).

* shoelace2: twice the signed area in Mercator units² — exact int64
  (Area.h:56-73 computes the same /2 in float64)
* area_m2: |shoelace2|/2 × metersPerUnitAtY(avg(minY,maxY))² (Area.h:27-32)
* length_m: Σ segment length × metersPerUnitAtY(segment mid-y)
  (Length.cpp:11-24)
* areal centroid: ring-weighted (Centroid.h:25-71), lineal centroid:
  length-weighted (Centroid.h:73-92)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from libgeodesk_spark.functions.cells import meters_per_unit_at_y


def _pairs(ring: Column) -> Column:
    """array of consecutive vertex pairs (p1, p2)."""
    n = F.size(ring)
    return F.zip_with(F.slice(ring, 1, n - 1), F.slice(ring, 2, n - 1),
                      lambda a, b: F.struct(a.alias("p1"), b.alias("p2")))


def ring_shoelace2(ring: Column) -> Column:
    """Exact int64: Σ (x1·y2 − x2·y1) over edges; >0 for CCW rings."""
    terms = F.transform(_pairs(ring), lambda e:
                        e["p1"]["x"] * e["p2"]["y"] - e["p2"]["x"] * e["p1"]["y"])
    return F.aggregate(terms, F.lit(0).cast("long"), lambda acc, v: acc + v)


def _ring_ys(ring: Column) -> Column:
    return F.transform(ring, lambda p: p["y"])


def ring_area_m2(ring: Column) -> Column:
    """Unsigned area in m², reference scale convention (Area.h:27-32:
    metersPerUnitAtY(avg(minY, maxY)) squared)."""
    ys = _ring_ys(ring)
    avg_y = ((F.array_min(ys) + F.array_max(ys)) / F.lit(2.0))
    s = meters_per_unit_at_y(avg_y)
    return F.abs(ring_shoelace2(ring)).cast("double") / F.lit(2.0) * s * s


def way_length_m(ring: Column) -> Column:
    """Σ segment meters, scale at each segment's mid-y (Length.cpp:11-24)."""
    seg = F.transform(_pairs(ring), lambda e: (
        F.sqrt(((e["p2"]["x"] - e["p1"]["x"]) * (e["p2"]["x"] - e["p1"]["x"])
                + (e["p2"]["y"] - e["p1"]["y"]) * (e["p2"]["y"] - e["p1"]["y"]))
               .cast("double"))
        * meters_per_unit_at_y((e["p1"]["y"] + e["p2"]["y"]).cast("double") / F.lit(2.0))))
    return F.aggregate(seg, F.lit(0.0), lambda acc, v: acc + v)


def way_length_cm(ring: Column) -> Column:
    """Σ round(segment_meters × 100) — PER-SEGMENT rounding so the total is
    an exact integer sum (order-independent; used by the correctness gate
    to avoid float-accumulation-order drift across engines)."""
    seg = F.transform(_pairs(ring), lambda e: F.round((
        F.sqrt(((e["p2"]["x"] - e["p1"]["x"]) * (e["p2"]["x"] - e["p1"]["x"])
                + (e["p2"]["y"] - e["p1"]["y"]) * (e["p2"]["y"] - e["p1"]["y"]))
               .cast("double"))
        * meters_per_unit_at_y((e["p1"]["y"] + e["p2"]["y"]).cast("double") / F.lit(2.0))
    ) * 100).cast("long"))
    return F.aggregate(seg, F.lit(0).cast("long"), lambda acc, v: acc + v)


def _ring_sums(ring: Column) -> tuple[Column, Column, Column]:
    """(ringSum, centroidXSum, centroidYSum) per Centroid.h:30-51."""
    a = F.transform(_pairs(ring), lambda e:
                    (e["p1"]["x"] * e["p2"]["y"] - e["p2"]["x"] * e["p1"]["y"])
                    .cast("double"))
    xs = F.transform(_pairs(ring), lambda e:
                     (e["p1"]["x"] + e["p2"]["x"]).cast("double")
                     * (e["p1"]["x"] * e["p2"]["y"] - e["p2"]["x"] * e["p1"]["y"]))
    ys = F.transform(_pairs(ring), lambda e:
                     (e["p1"]["y"] + e["p2"]["y"]).cast("double")
                     * (e["p1"]["x"] * e["p2"]["y"] - e["p2"]["x"] * e["p1"]["y"]))
    zero = F.lit(0.0)
    add = lambda acc, v: acc + v  # noqa: E731
    return (F.aggregate(a, zero, add), F.aggregate(xs, zero, add),
            F.aggregate(ys, zero, add))


def ring_centroid_terms(ring: Column, is_shell: Column):
    """(signed areaSum, cxSum, cySum) with the reference's shell/hole sign
    rule (Centroid.h:52-55): sign = +1 iff ringSum >= 0 AND shell."""
    rs, cx, cy = _ring_sums(ring)
    sign = F.when((rs >= 0) & is_shell, F.lit(1.0)).otherwise(F.lit(-1.0))
    return rs * sign, cx * sign, cy * sign


def areal_centroid_from_sums(area_sum: Column, cx_sum: Column, cy_sum: Column):
    """Final centroid ints (Centroid.h:60-65); F.round = HALF_UP = C++
    round ties-away for the positive/negative cases alike."""
    return (F.round(cx_sum / (F.lit(3.0) * area_sum)).cast("long"),
            F.round(cy_sum / (F.lit(3.0) * area_sum)).cast("long"))


def lineal_centroid(ring: Column):
    """Length-weighted centroid of a polyline (Centroid.h:73-92)."""
    seg_len = F.transform(_pairs(ring), lambda e: F.sqrt(
        ((e["p2"]["x"] - e["p1"]["x"]) * (e["p2"]["x"] - e["p1"]["x"])
         + (e["p2"]["y"] - e["p1"]["y"]) * (e["p2"]["y"] - e["p1"]["y"]))
        .cast("double")))
    zero = F.lit(0.0)
    add = lambda acc, v: acc + v  # noqa: E731
    total = F.aggregate(seg_len, zero, add)
    wx = F.aggregate(
        F.zip_with(_pairs(ring), seg_len,
                   lambda e, sl: (e["p1"]["x"] + e["p2"]["x"]).cast("double") * sl),
        zero, add)
    wy = F.aggregate(
        F.zip_with(_pairs(ring), seg_len,
                   lambda e, sl: (e["p1"]["y"] + e["p2"]["y"]).cast("double") * sl),
        zero, add)
    return (F.round(wx / (total * 2.0)).cast("long"),
            F.round(wy / (total * 2.0)).cast("long"))


def ring_bbox(ring: Column) -> Column:
    """struct(min_x, min_y, max_x, max_y) — the reference stores exactly
    this per feature (FeaturePtr.h:52-56)."""
    xs = F.transform(ring, lambda p: p["x"])
    ys = _ring_ys(ring)
    return F.struct(F.array_min(xs).alias("min_x"), F.array_min(ys).alias("min_y"),
                    F.array_max(xs).alias("max_x"), F.array_max(ys).alias("max_y"))


# --- ellipsoid-corrected area (the reference's Lambert/sinusoidal variant,
# --- src/geom/LambertArea.h:44-85, LambertArea.cpp:11-47) -------------------

#: spherical Earth radius the reference's sinusoidal projection assumes
#: (src/geom/project/Sinusoidal.h EARTH_RADIUS)
SINUSOIDAL_EARTH_RADIUS = 6371000.0


def lambert_signed_area_m2(ring: Column) -> Column:
    """SIGNED area in m² via the reference's equal-area alternative:
    project every vertex through Mercator-inverse → sinusoidal
    (equal-area, spherical R=6371000 — Sinusoidal.h: px = R·lon_rad·
    cos(lat), py = R·lat_rad; lat = atan(exp(y·2π/W))·360/π − 90,
    Mercator.h:100-103) and take the planar shoelace of the projected
    ring. Unlike the default Mercator-scaled shoelace (ring_area_m2,
    Area.h:27-32 — one scale factor at the bbox mid-latitude), the
    area-preserving projection has no mid-latitude approximation error
    for tall polygons. Sign convention matches shoelace: >0 for CCW.

    Pure Column math (higher-order functions). X is re-centered on the
    first vertex before the shoelace — the same numerical-stability
    shift as the reference's x0 subtraction
    (LambertArea.h:signedOfAbstractRing)."""
    import math
    W = 4294967294.9999            # mercator.MAP_WIDTH
    R = SINUSOIDAL_EARTH_RADIUS
    deg2rad = math.pi / 180.0

    def proj(p):
        lat_deg = (F.atan(F.exp(p["y"].cast("double")
                                * F.lit(2.0 * math.pi / W)))
                   * F.lit(360.0 / math.pi) - F.lit(90.0))
        lon_deg = p["x"].cast("double") * F.lit(360.0 / W)
        lat_rad = lat_deg * F.lit(deg2rad)
        return F.struct(
            (F.lit(R) * lon_deg * F.lit(deg2rad) * F.cos(lat_rad))
            .alias("px"),
            (F.lit(R) * lat_rad).alias("py"))

    pring = F.transform(ring, proj)
    x0 = F.element_at(pring, 1)["px"]
    n = F.size(pring)
    terms = F.zip_with(
        F.slice(pring, 1, n - 1), F.slice(pring, 2, n - 1),
        lambda a, b: (a["px"] - x0) * b["py"] - (b["px"] - x0) * a["py"])
    return F.aggregate(terms, F.lit(0.0), lambda acc, v: acc + v) / F.lit(2.0)


def lambert_area_m2(ring: Column) -> Column:
    """Unsigned sinusoidal-projected area in m² (LambertArea::ofRing =
    |signed|; relations sum outer − inner via the polygonizer rings,
    LambertArea.cpp:27-47 — aggregate per zone with role signs, as
    zone_shoelace does for the Mercator variant)."""
    return F.abs(lambert_signed_area_m2(ring))
