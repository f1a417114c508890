"""Fluent query facade — the reference's ``Features`` API surface
re-expressed over DataFrames.

Reference (include/geodesk/feature/FeaturesBase.h, README.md:92-103):

.. code-block:: cpp

    Features world("world.gol");
    Features pubs = world("na[amenity=pub]")(zurich_bbox).within(zurich);
    for (Feature pub : pubs) ...

Here every fluent call produces a new immutable :class:`Features` wrapping
a lazily-composed DataFrame (the reference's View IR, View.h:18-62, is
Catalyst's logical plan — we never materialize until a terminal call):

.. code-block:: python

    world = Features(images_df)
    pubs = world("*[fmt=png]").bbox(x0, y0, x1, y1).within(zone)
    pubs.count(); pubs.first(); list(pubs)

Terminal ops mirror SURVEY §2.5: count/is_empty/first/one/collect;
format sinks mirror §2.1 S5-S7.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F

from libgeodesk_spark.geom.zones import PreparedZone


class Features:
    """Immutable fluent view over a point-feature DataFrame with x/y
    Mercator columns (default ``x``/``y``)."""

    def __init__(self, df: DataFrame, x: str = "x", y: str = "y"):
        self._df = df
        self._x = x
        self._y = y

    # -- composition (each returns a new Features; P1-P8, P9, J1-J6) --------

    def _wrap(self, df: DataFrame) -> "Features":
        return Features(df, self._x, self._y)

    def __call__(self, goql: str, **kw) -> "Features":
        """GOQL selector filter (the reference's query-string call)."""
        from libgeodesk_spark.functions.goql import compile_goql
        return self._wrap(self._df.filter(compile_goql(goql, **kw)))

    def filter(self, predicate) -> "Features":
        """Column predicate or python callable (P12 PredicateFilter —
        FeaturesBase.h:349-354). A callable receives each Arrow batch as a
        pandas DataFrame and returns a boolean mask — vectorized, never
        per-row; prefer Column predicates when expressible."""
        if callable(predicate) and not hasattr(predicate, "_jc"):
            schema = self._df.schema

            def apply_mask(batches):
                for pdf in batches:
                    if len(pdf):
                        yield pdf.loc[predicate(pdf)]

            return self._wrap(self._df.mapInPandas(apply_mask, schema=schema))
        return self._wrap(self._df.filter(predicate))

    def bbox(self, min_x: int, min_y: int, max_x: int, max_y: int) -> "Features":
        """bbox window (P9; FeaturesBase.h:85-97)."""
        from libgeodesk_spark.operators.spatial_join import bbox_filter
        return self._wrap(bbox_filter(self._df, min_x, min_y, max_x, max_y,
                                      self._x, self._y))

    @staticmethod
    def _as_zone(zone) -> PreparedZone:
        """Accept a PreparedZone, WKT text, or WKB bytes — the
        geodesk-py filters take shapely geometry (any GEOS-readable
        form); here both standard serializations prepare on the fly."""
        if isinstance(zone, str):
            from libgeodesk_spark.geom.wkt import prepare_zone_from_wkt
            return prepare_zone_from_wkt("zone", zone)
        if isinstance(zone, (bytes, bytearray)):
            from libgeodesk_spark.geom.wkb import prepare_zone_from_wkb
            return prepare_zone_from_wkb("zone", bytes(zone))
        return zone

    def within(self, zone: PreparedZone | str | bytes) -> "Features":
        from libgeodesk_spark.operators.spatial_join import join_zones
        return self._wrap(join_zones(self._df, [self._as_zone(zone)],
                                     predicate="within",
                                     x_col=self._x, y_col=self._y)
                          .drop("zone_id"))

    def intersecting(self, zone: PreparedZone | str | bytes) -> "Features":
        from libgeodesk_spark.operators.spatial_join import join_zones
        return self._wrap(join_zones(self._df, [self._as_zone(zone)],
                                     predicate="intersects",
                                     x_col=self._x, y_col=self._y)
                          .drop("zone_id"))

    def max_meters_from(self, meters: float, x: int, y: int) -> "Features":
        from libgeodesk_spark.operators.knn import max_meters_from
        return self._wrap(max_meters_from(self._df, meters, x, y,
                                          x_col=self._x, y_col=self._y))

    def nearest(self, x: int, y: int, k: int, id_col: str = "image_id") -> "Features":
        from libgeodesk_spark.operators.knn import knn
        return self._wrap(knn(self._df, x, y, k, id_col=id_col,
                              x_col=self._x, y_col=self._y))

    def connected_to(self, other_vertex_keys: DataFrame) -> "Features":
        from libgeodesk_spark.functions.cells import vertex_key
        keyed = self._df.withColumn(
            "_vk", vertex_key(F.col(self._x), F.col(self._y)))
        return self._wrap(keyed.join(F.broadcast(other_vertex_keys),
                                     keyed["_vk"] == other_vertex_keys["vkey"],
                                     "left_semi").drop("_vk"))

    # -- terminal ops (A1-A6, FeatureUtils.cpp / FeaturesBase.h:61-109) -----

    @property
    def df(self) -> DataFrame:
        return self._df

    def count(self) -> int:
        return self._df.count()

    def is_empty(self) -> bool:
        return self._df.limit(1).count() == 0

    def __bool__(self) -> bool:
        return not self.is_empty()

    def first(self) -> Row | None:
        rows = self._df.take(1)
        return rows[0] if rows else None

    def one(self) -> Row:
        """Exactly one result or raise (the reference's one() throws on
        0 or >1, FeaturesBase.h:103-104)."""
        rows = self._df.take(2)
        if len(rows) != 1:
            raise ValueError(f"one(): expected exactly 1 row, got "
                             f"{'0' if not rows else '>1'}")
        return rows[0]

    def collect(self) -> list[Row]:
        return self._df.collect()

    def __iter__(self) -> Iterator[Row]:
        return iter(self._df.toLocalIterator())

    # -- sinks (S5-S7) -------------------------------------------------------

    def to_geojsonl(self, path: str, props: list[str] | None = None) -> None:
        from libgeodesk_spark.sources.sinks import write_geojsonl
        write_geojsonl(self._df, path, self._x, self._y, props)

    def to_geojson(self, props: list[str] | None = None, limit: int = 10000) -> str:
        from libgeodesk_spark.sources.sinks import geojson_feature_collection
        return geojson_feature_collection(self._df, self._x, self._y,
                                          props, limit)

    def to_csv(self, path: str, key_schema: list[str]) -> None:
        from libgeodesk_spark.sources.sinks import write_csv
        write_csv(self._df, path, key_schema)

    def wkt(self) -> "F.Column":
        from libgeodesk_spark.sources.sinks import point_wkt
        return point_wkt(F.col(self._x), F.col(self._y))

    # -- dedup / tables (training-pipeline surface) --------------------------

    def near_dups_by_phash(self, max_hamming: int = 3,
                           id_col: str = "image_id",
                           phash_col: str = "phash") -> DataFrame:
        """Visual near-duplicate pairs within a hamming radius of the
        row's int64 perceptual hash (operators/dedup.phash_near_dups)."""
        from libgeodesk_spark.operators.dedup import phash_near_dups
        return phash_near_dups(self._df, id_col, phash_col, max_hamming)

    def to_snapshot(self, path: str,
                    stat_cols: tuple[str, ...] = ("cell_id",),
                    mode: str = "append") -> int:
        """Commit this view as the next snapshot of a manifest table
        (sources/catalog.SnapshotTable); returns the snapshot version."""
        from libgeodesk_spark.sources.catalog import SnapshotTable
        return SnapshotTable(path, stat_cols=stat_cols).commit(
            self._df, mode=mode)

    @classmethod
    def from_snapshot(cls, spark, path: str,
                      snapshot_id: int | None = None,
                      x: str = "x", y: str = "y") -> "Features":
        from libgeodesk_spark.sources.catalog import SnapshotTable
        return cls(SnapshotTable(path).read(spark, snapshot_id), x, y)

    @classmethod
    def from_geojsonl(cls, spark, path: str) -> "Features":
        from libgeodesk_spark.sources.geojson import read_geojsonl
        return cls(read_geojsonl(spark, path))

    def knn_join(self, k: int, id_col: str = "pid") -> DataFrame:
        """k nearest neighbors of EVERY feature (operators/knn.knn_join
        — multi-resolution grid doubling, exact)."""
        from libgeodesk_spark.operators.knn import knn_join
        return knn_join(self._df, k, id_col=id_col,
                        x_col=self._x, y_col=self._y)

    def pairs_within(self, r_units: int, id_col: str = "pid") -> DataFrame:
        """All pairs within r units (grid band join, exact)."""
        from libgeodesk_spark.operators.distance import within_distance_pairs
        return within_distance_pairs(self._df, r_units, id_col=id_col,
                                     x_col=self._x, y_col=self._y)

    def cell_hulls(self, cell_col: str = "cell_id") -> DataFrame:
        """Minimal convex hull stats per cell (exact int kernel)."""
        from libgeodesk_spark.operators.geomops import cell_hulls
        return cell_hulls(self._df, id_col=cell_col,
                          x_col=self._x, y_col=self._y)


class Ways:
    """Fluent view over a WAY table (way_id, ring: array<struct<x,y>>,
    is_area) — the reference's Features surface applied to way/relation
    candidates (FeaturesBase works over all feature types; this wrapper
    routes to the way-candidate joins of operators/way_join.py). Every
    call returns a new immutable view; nothing materializes until a
    terminal op on ``.df``."""

    def __init__(self, df: DataFrame, way_id: str = "way_id",
                 ring: str = "ring", is_area: str = "is_area"):
        self._df = df
        self._id, self._ring, self._area = way_id, ring, is_area

    def _wrap(self, df: DataFrame) -> "Ways":
        return Ways(df, self._id, self._ring, self._area)

    def _ids(self, ids_df: DataFrame) -> "Ways":
        return self._wrap(self._df.join(
            F.broadcast(ids_df.select(self._id).distinct()), self._id))

    def within(self, zone: PreparedZone) -> "Ways":
        from libgeodesk_spark.operators.way_join import way_within
        return self._ids(way_within(self._df, zone, ring_col=self._ring,
                                    id_col=self._id,
                                    is_area_col=self._area))

    def intersecting(self, zone: PreparedZone) -> "Ways":
        from libgeodesk_spark.operators.way_join import way_intersects
        return self._ids(way_intersects(self._df, zone, ring_col=self._ring,
                                        id_col=self._id,
                                        is_area_col=self._area))

    def crossing(self, zone: PreparedZone) -> "Ways":
        """Whole-way CrossesFilter (src/filter/CrossesFilter.cpp:10-41)
        — symmetric with within/intersecting, closing the round-2
        fluent-API gap."""
        from libgeodesk_spark.operators.way_join import way_crossing
        return self._ids(way_crossing(self._df, zone, ring_col=self._ring,
                                      id_col=self._id))

    def max_meters_from(self, meters: float, x: int, y: int) -> "Ways":
        from libgeodesk_spark.operators.way_join import way_max_meters_from
        return self._ids(way_max_meters_from(
            self._df, meters, x, y, ring_col=self._ring, id_col=self._id,
            is_area_col=self._area))

    def length(self, unit: str = "m") -> DataFrame:
        """(way_id, length_<unit>) — A3/G1 with the reference's exact
        unit table (LengthUnit.cpp:20-35; aliases m/km/ft/yd/mi)."""
        from libgeodesk_spark.functions.geometry import way_length_m
        from libgeodesk_spark.functions.units import (
            meters_col_to_unit, unit_from_string)
        unit_from_string(unit)          # validate early, clear message
        return self._df.select(
            self._id,
            meters_col_to_unit(way_length_m(F.col(self._ring)), unit)
            .alias(f"length_{unit.strip().lower()}"))

    def area_m2(self, lambert: bool = False) -> DataFrame:
        """(way_id, area_m2) for AREA ways — Mercator-scaled shoelace by
        default (Area.h:27-32), sinusoidal equal-area with
        ``lambert=True`` (LambertArea.h:44-85)."""
        from libgeodesk_spark.functions.geometry import (
            lambert_area_m2, ring_area_m2)
        fn = lambert_area_m2 if lambert else ring_area_m2
        return self._df.filter(F.col(self._area)).select(
            self._id, fn(F.col(self._ring)).alias("area_m2"))

    @property
    def df(self) -> DataFrame:
        return self._df

    def count(self) -> int:
        return self._df.count()

    def ids(self) -> list:
        return sorted(r[0] for r in
                      self._df.select(self._id).distinct().collect())
