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


LEAFLET_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<link rel="stylesheet" href="https://unpkg.com/leaflet@1.9.4/dist/leaflet.css"/>
<script src="https://unpkg.com/leaflet@1.9.4/dist/leaflet.js"></script>
<style>html,body,#map{{height:100%;margin:0}}</style></head>
<body><div id="map"></div><script>
var data = {geojson};
var map = L.map('map');
L.tileLayer('https://tile.openstreetmap.org/{{z}}/{{x}}/{{y}}.png',
            {{maxZoom: 19, attribution: '&copy; OpenStreetMap'}}).addTo(map);
var layer = L.geoJSON(data, {{
  pointToLayer: function(f, ll) {{ return L.circleMarker(ll, {{radius: 4}}); }},
  onEachFeature: function(f, l) {{
    l.bindPopup(Object.entries(f.properties || {{}})
      .map(function(kv) {{ return kv[0] + ': ' + kv[1]; }}).join('<br>'));
  }}
}}).addTo(map);
map.fitBounds(layer.getBounds());
</script></body></html>
"""


def write_leaflet_map(df: DataFrame, path: str, x="x", y="y",
                      props: list[str] | None = None,
                      title: str = "libgeodesk_spark map",
                      limit: int = 10000) -> None:
    """Self-contained Leaflet HTML map of the result set — the reference's
    MapWriter sink (src/format/MapWriter.cpp:1-464). Bounded result sets
    only (it is a report artifact, like the reference's use)."""
    fc = geojson_feature_collection(df, x, y, props, limit)
    with open(path, "w") as f:
        f.write(LEAFLET_TEMPLATE.format(title=title, geojson=fc))


def write_csv(df: DataFrame, path: str, key_schema: list[str]) -> None:
    """Key-schema projected CSV (CsvWriter/KeySchema): only the requested
    columns, in order, with header."""
    df.select(*key_schema).write.mode("overwrite") \
        .option("header", True).csv(path)
