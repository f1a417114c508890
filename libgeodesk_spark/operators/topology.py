"""Topological navigation — T1-T4 of SURVEY §2.4.

The reference walks member tables with foreign TIP/TEX tile references
(MemberIterator.h:32-150) and answers parents via relation tables plus a
spatial probe with FeatureNodeFilter (FeatureIteratorBase.cpp:87-127). In
Spark, topology is plain equi-joins against a membership table — the
foreign-tile indirection dissolves into join keys (SURVEY §3.3: "no clever
physical analog needed").

A membership table has (rel_id, member_id, role, ...). ``members_of`` /
``parents_of`` are thin, declarative, and broadcast the probe-id set when
small — the index-nested-loop shape of the reference.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def members_of(membership: DataFrame, rel_ids: Sequence,
               rel_col: str = "rel_id",
               roles: Sequence[str] | None = None) -> DataFrame:
    """Members of the given relations; optional role filter (J7 withRole,
    src/filter/RoleFilter.cpp:11-85)."""
    out = membership.filter(F.col(rel_col).isin(list(rel_ids)))
    if roles is not None:
        out = out.filter(F.col("role").isin(list(roles)))
    return out


def parents_of(membership: DataFrame, member_ids: Sequence,
               member_col: str = "member_id",
               rel_col: str = "rel_id") -> DataFrame:
    """Distinct parents of the given members (parentsOf — reverse walk of
    the relation table, FeatureIteratorBase.cpp:162-196)."""
    return (membership.filter(F.col(member_col).isin(list(member_ids)))
            .select(member_col, rel_col).distinct())


def members_join(membership: DataFrame, features: DataFrame,
                 member_col: str = "member_id", feature_id: str = "id") -> DataFrame:
    """Resolve member rows to full feature rows (the fetchTile+offset deref
    of MemberIterator, as a join)."""
    return membership.join(features,
                           membership[member_col] == features[feature_id])


def parent_ways_of_vertex(way_vertices: DataFrame, x: int, y: int,
                          way_col: str = "way_id") -> DataFrame:
    """parentWaysOf(anonymous node): all ways passing through an exact
    coordinate (View.h:228-245) — an equality probe on the exploded
    vertex table (int64 packed key join, ConnectedFilter-style)."""
    return (way_vertices.filter((F.col("x") == x) & (F.col("y") == y))
            .select(way_col).distinct())


def connected_to(way_vertices: DataFrame, way_id,
                 way_col: str = "way_id") -> DataFrame:
    """Ways sharing ≥1 exact vertex with ``way_id``, self excluded
    (connectedTo, src/filter/ConnectedFilter.cpp:10-118): self-join on the
    packed vertex key."""
    probe = way_vertices.filter(F.col(way_col) == way_id) \
        .select("vkey").distinct()
    return (way_vertices.join(F.broadcast(probe), "vkey")
            .filter(F.col(way_col) != way_id)
            .select(way_col).distinct())


def nodes_of(ways: DataFrame, feature_nodes: DataFrame,
             way_col: str = "way_id", ring_col: str = "ring",
             node_id: str = "node_id") -> DataFrame:
    """nodesOf(way) with ANONYMOUS node synthesis (T2): every way vertex
    becomes a row; vertices matching a stored feature node by exact
    coordinate carry its id, the rest get a NULL id — the reference
    synthesizes id+xy rows for untagged nodes the same way
    (FeatureIteratorBase.cpp:233-261 fetchNext: featureNodeIterator merge,
    anonymous coordinates yielded between feature nodes).

    ``feature_nodes`` = (node_id, x, y). Output: (way_id, seq, x, y,
    node_id nullable). Left join on the packed vertex key — broadcastable
    when the node table is small, shuffle-join otherwise (Catalyst picks).
    """
    v = ways.select(
        way_col,
        F.posexplode(ring_col).alias("seq", "p")).select(
        way_col, "seq",
        F.col("p.x").alias("x"), F.col("p.y").alias("y"))
    key = F.shiftleft(F.col("y").cast("long").bitwiseAND(F.lit(0xFFFFFFFF)), 32) \
        .bitwiseOR(F.col("x").cast("long").bitwiseAND(F.lit(0xFFFFFFFF)))
    v = v.withColumn("_vk", key)
    fn = feature_nodes.select(
        F.col(node_id),
        F.shiftleft(F.col("y").cast("long").bitwiseAND(F.lit(0xFFFFFFFF)), 32)
        .bitwiseOR(F.col("x").cast("long").bitwiseAND(F.lit(0xFFFFFFFF)))
        .alias("_vk"))
    return (v.join(fn, "_vk", "left")
            .select(way_col, "seq", "x", "y", node_id)
            .orderBy(way_col, "seq"))
