"""Output sinks: GeoJSON / GeoJSONL, WKT, CSV — the reference's format
writers re-expressed as Column expressions + DataFrame writers.

Reference: src/format/GeoJsonWriter.cpp:14-120 (FeatureCollection and
line-wise GeoJSONL), src/format/WktWriter.cpp (geometry text),
src/format/CsvWriter.cpp + KeySchema.cpp (key-schema projected rows).

Everything below is JVM-side string building (format_string/concat) — the
sink is ``df.write.text/csv`` so output scales like any Spark write. The
reference emits lon/lat at 100-nanodegree precision (Mercator.h:69-73
roundTo100nd via Feature.lon()/lat()); we mirror that with format '%.7f'
trimmed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from libgeodesk_spark.functions.cells import lat_from_y, lon_from_x


def _coord7(c: Column) -> Column:
    """Degree value formatted at 1e-7 precision, trailing zeros trimmed
    (GeoJsonWriter/WktWriter emit minimal decimals)."""
    s = F.format_string("%.7f", c)
    s = F.regexp_replace(s, r"0+$", "")
    return F.regexp_replace(s, r"\.$", ".0")


def point_wkt(x: Column, y: Column) -> Column:
    """WKT 'POINT (lon lat)' from integer Mercator coords (WktWriter.cpp)."""
    return F.concat(F.lit("POINT ("), _coord7(lon_from_x(x)), F.lit(" "),
                    _coord7(lat_from_y(y)), F.lit(")"))


def ring_wkt(ring: Column) -> Column:
    """WKT 'POLYGON ((x y, ...))' from array<struct<x,y>> ring column."""
    pts = F.transform(ring, lambda p: F.concat(
        _coord7(lon_from_x(p["x"])), F.lit(" "), _coord7(lat_from_y(p["y"]))))
    return F.concat(F.lit("POLYGON (("), F.array_join(pts, ", "), F.lit("))"))


def point_geojson(x: Column, y: Column, props: dict[str, Column]) -> Column:
    """One GeoJSON Feature per row (GeoJSONL — GeoJsonWriter 'linewise'
    flavor). Properties via to_json(struct(...)) so escaping is correct."""
    geometry = F.concat(
        F.lit('{"type":"Point","coordinates":['),
        _coord7(lon_from_x(x)), F.lit(","), _coord7(lat_from_y(y)), F.lit("]}"))
    props_json = F.to_json(F.struct(*[v.alias(k) for k, v in props.items()]))
    return F.concat(F.lit('{"type":"Feature","geometry":'), geometry,
                    F.lit(',"properties":'), props_json, F.lit("}"))


def write_geojsonl(df: DataFrame, path: str, x="x", y="y",
                   props: list[str] | None = None) -> None:
    props = props or [c for c in df.columns if c not in (x, y)]
    line = point_geojson(F.col(x), F.col(y),
                         {c: F.col(c) for c in props}).alias("value")
    df.select(line).write.mode("overwrite").text(path)


def geojson_feature_collection(df: DataFrame, x="x", y="y",
                               props: list[str] | None = None,
                               limit: int = 10000) -> str:
    """Small-result FeatureCollection string (the reference's default
    GeoJSON flavor, GeoJsonWriter.cpp:14-60). Driver-side assembly —
    intended for bounded result sets, like the reference's use for query
    output, not for bulk export (use write_geojsonl for that)."""
    props = props or [c for c in df.columns if c not in (x, y)]
    line = point_geojson(F.col(x), F.col(y), {c: F.col(c) for c in props})
    feats = [r[0] for r in df.select(line).limit(limit).collect()]
    return ('{"type":"FeatureCollection","features":[\n'
            + ",\n".join(feats) + "\n]}")


def write_csv(df: DataFrame, path: str, key_schema: list[str]) -> None:
    """Key-schema projected CSV (CsvWriter/KeySchema): only the requested
    columns, in order, with header."""
    df.select(*key_schema).write.mode("overwrite") \
        .option("header", True).csv(path)
