"""GeoParquet sink/source — the standard parquet-native geospatial
interchange format (public spec: geoparquet.org, v1.1.0; file-level
``geo`` key-value metadata + WKB geometry columns).

Reference analog: the GEOS/OGR bridge (SURVEY G9,
src/geom/GeometryBuilder.cpp / OgrGeometryBuilder.cpp) is how the
reference hands geometry to the outside world; GeoParquet is the
columnar, Spark-era equivalent — every modern geo engine (GeoPandas,
DuckDB-spatial, BigQuery, Sedona) reads it.

Physical shape:

* **write** — Spark's parquet writer cannot attach custom file-level
  metadata, so each partition writes its own footer through pyarrow
  inside one ``mapInPandas`` pass (executor-side, no driver collect;
  one file per non-empty partition, same parallelism as a native
  write). Geometry stays WKB bytes end-to-end.
* **read** — plain ``spark.read.parquet`` (the data pages are ordinary
  parquet); ``geo`` metadata is parsed from one footer driver-side.
  Decoding WKB into int-Mercator rings reuses geom/wkb.py.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import DataFrame, SparkSession

GEOPARQUET_VERSION = "1.1.0"


def _geo_meta(wkb_col: str, geometry_types: list[str]) -> dict:
    return {
        "version": GEOPARQUET_VERSION,
        "primary_column": wkb_col,
        "columns": {
            wkb_col: {
                "encoding": "WKB",
                "geometry_types": geometry_types,
                # WGS84 lon/lat — what rings_to_wkb exports
                "crs": None,
            }
        },
    }


def write_geoparquet(df: DataFrame, path: str, wkb_col: str = "geometry",
                     geometry_types: list[str] | None = None) -> int:
    """Write ``df`` (with a WKB binary column) as GeoParquet; returns the
    number of data files written. Distributed: one pyarrow footer per
    non-empty partition, each carrying the spec's ``geo`` metadata."""
    if wkb_col not in df.columns:
        raise ValueError(f"missing WKB column {wkb_col!r}")
    meta = json.dumps(_geo_meta(
        wkb_col, geometry_types if geometry_types is not None
        else ["Polygon", "MultiPolygon", "Point"]))
    os.makedirs(path, exist_ok=True)

    def writer(batches):
        import uuid

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq
        tables = []
        for pdf in batches:
            if len(pdf):
                tables.append(pa.Table.from_pandas(pdf,
                                                   preserve_index=False))
        if not tables:
            return
        t = pa.concat_tables(tables)
        t = t.replace_schema_metadata(
            {**(t.schema.metadata or {}), b"geo": meta.encode()})
        fn = os.path.join(path, f"part-{uuid.uuid4().hex}.parquet")
        pq.write_table(t, fn)
        yield pd.DataFrame({"file": [fn], "rows": [len(t)]})

    files = df.mapInPandas(writer, "file string, rows long").collect()
    return len(files)


def read_geoparquet(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    """(DataFrame, geo-metadata dict). The frame is a plain parquet scan
    (pushdown/pruning intact); metadata comes from one footer."""
    import pyarrow.parquet as pq
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        raise ValueError(f"no parquet files under {path}")
    md = pq.ParquetFile(files[0]).schema_arrow.metadata or {}
    geo = json.loads(md.get(b"geo", b"{}") or b"{}")
    return spark.read.parquet(*files), geo


def decode_geometry(df: DataFrame, geo: dict,
                    out_col: str = "rings") -> DataFrame:
    """Decode the primary WKB column into int-Mercator rings
    (array<array<struct<x,y>>>) — one Arrow pass through geom/wkb.py
    (both byte orders, EWKB/ISO variants)."""
    from pyspark.sql import types as T
    col = geo.get("primary_column", "geometry")
    ring_t = T.ArrayType(T.ArrayType(T.StructType(
        [T.StructField("x", T.LongType()), T.StructField("y", T.LongType())])))
    schema = T.StructType(list(df.schema.fields)
                          + [T.StructField(out_col, ring_t)])

    def go(batches):
        from libgeodesk_spark.geom.wkb import wkb_to_rings
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf = pdf.copy()
            pdf[out_col] = [
                [[{"x": int(x), "y": int(y)} for x, y in ring]
                 for ring in wkb_to_rings(bytes(b))]
                for b in pdf[col]]
            yield pdf

    return df.mapInPandas(go, schema=schema)
