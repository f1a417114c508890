"""GeoJSONL source — the read side of the GeoJSON sink (round-trip).

The reference only WRITES GeoJSON (src/format/GeoJsonWriter.cpp); its
ingest path is OSM PBF. A Spark engine wants the inverse too: GeoJSONL is
the de-facto interchange for feature dumps, and reading it back is one
``spark.read.text`` + ``from_json`` — whole-stage codegen, splittable by
line, no Python.

Precision contract: the sink (and the reference, Mercator.h:69-73
roundTo100nd) emits coordinates at 100-nanodegree precision, which is
COARSER than one int32 Mercator unit (360/2^32 ≈ 84 nanodegrees), so a
write→read round trip reproduces x/y within ±1 unit — the same loss the
reference's own GeoJSON output has. Exact round trips need the parquet
layout (sources/writer.py), not a text format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from libgeodesk_spark.functions.cells import x_from_lon, y_from_lat

#: properties parse as map<string,string>: GeoJSON property values are
#: arbitrary JSON; string is the lossless common denominator for tags
#: (the reference's tag model is string->string too, TagTable)
_FEATURE_SCHEMA = (
    "struct<type:string,"
    " geometry:struct<type:string>,"
    " properties:map<string,string>>"
)
_POINT_COORDS = "struct<geometry:struct<coordinates:array<double>>>"
_POLY_COORDS = "struct<geometry:struct<coordinates:array<array<array<double>>>>>"


def read_geojsonl(spark: SparkSession, path: str) -> DataFrame:
    """(geom_type, x, y, rings, properties) from line-delimited GeoJSON
    features. Point rows fill x/y; Polygon rows fill rings =
    array<array<struct<x,y>>> (outer ring first, per RFC 7946 order as
    written); other geometry types keep geom_type with null coords so
    callers can route or reject them explicitly."""
    raw = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    feat = F.from_json("value", _FEATURE_SCHEMA)
    pt = F.from_json("value", _POINT_COORDS)["geometry"]["coordinates"]
    pg = F.from_json("value", _POLY_COORDS)["geometry"]["coordinates"]
    gtype = feat["geometry"]["type"]
    is_pt = gtype == "Point"
    is_pg = gtype == "Polygon"
    ring = lambda r: F.transform(  # noqa: E731
        r, lambda c: F.struct(
            x_from_lon(c[0]).alias("x"), y_from_lat(c[1]).alias("y")))
    return raw.select(
        gtype.alias("geom_type"),
        F.when(is_pt, x_from_lon(pt[0])).alias("x"),
        F.when(is_pt, y_from_lat(pt[1])).alias("y"),
        F.when(is_pg, F.transform(pg, ring)).alias("rings"),
        feat["properties"].alias("properties"),
    )
