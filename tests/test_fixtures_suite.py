"""FIXTURES.md correctness suite: the full zone inventory (zone0000-0006)
and the stratified image placement (uniform / hot-cell / on-boundary /
outside incl. latitude clamp), engine vs numpy oracle — the golden-dump
device of the reference (test/Features_test.cpp:75-123).
"""

import numpy as np
import pandas as pd
import pytest

from libgeodesk_spark import mercator as M
from libgeodesk_spark.geom import kernel
from libgeodesk_spark.geom.zones import prepare_zone
from libgeodesk_spark.operators.spatial_join import join_zones

SEED = 42
N = 2000
CX, CY = M.x_from_lon(8.5), M.y_from_lat(47.3)
U = 1 << 16   # zoom-16 cover cell extent


def ring(*pts):
    pts = list(pts)
    if pts[0] != pts[-1]:
        pts.append(pts[0])
    return np.array(pts, dtype=np.int64)


def _zone_inventory():
    """zone0000-0006 per FIXTURES.md §2."""
    rng = np.random.default_rng(SEED)
    # 0: convex octagon
    ang = np.linspace(0, 2 * np.pi, 9)[:-1]
    z0 = [np.stack([CX + (np.cos(ang) * 3 * U).astype(np.int64),
                    CY + (np.sin(ang) * 3 * U).astype(np.int64)], axis=1)]
    # 1: concave 40-vertex comb
    xs, ys = [CX - 5 * U], [CY - 5 * U]
    for i in range(9):
        x = CX - 5 * U + (i + 1) * U
        ys.append(CY + (5 * U if i % 2 == 0 else -2 * U))
        xs.append(xs[-1])
        xs.append(x)
        ys.append(ys[-1])
    xs += [xs[-1], CX - 5 * U]
    ys += [CY - 5 * U, CY - 5 * U]
    z1 = [np.stack([np.array(xs, dtype=np.int64),
                    np.array(ys, dtype=np.int64)], axis=1)]
    # 2: square with two rectangular holes
    z2 = [ring((CX - 4 * U, CY - 4 * U), (CX + 4 * U, CY - 4 * U),
               (CX + 4 * U, CY + 4 * U), (CX - 4 * U, CY + 4 * U)),
          ring((CX - 2 * U, CY - 2 * U), (CX - U, CY - 2 * U),
               (CX - U, CY - U), (CX - 2 * U, CY - U)),
          ring((CX + U, CY + U), (CX + 2 * U, CY + U),
               (CX + 2 * U, CY + 2 * U), (CX + U, CY + 2 * U))]
    # 3: multipolygon, one part with a hole
    z3 = [ring((CX - 6 * U, CY - 6 * U), (CX - 4 * U, CY - 6 * U),
               (CX - 4 * U, CY - 4 * U), (CX - 6 * U, CY - 4 * U)),
          ring((CX + 4 * U, CY + 4 * U), (CX + 7 * U, CY + 4 * U),
               (CX + 7 * U, CY + 7 * U), (CX + 4 * U, CY + 7 * U)),
          ring((CX + 5 * U, CY + 5 * U), (CX + 6 * U, CY + 5 * U),
               (CX + 6 * U, CY + 6 * U), (CX + 5 * U, CY + 6 * U))]
    # 4: tiny polygon fully inside one cover cell (BOUNDARY-only path)
    z4 = [ring((CX + 10, CY + 10), (CX + 500, CY + 10), (CX + 500, CY + 500),
               (CX + 10, CY + 500))]
    # 5: giant polygon covering >= 16 cells fully (turbo path)
    z5 = [ring((CX - 8 * U, CY - 8 * U), (CX + 8 * U, CY - 8 * U),
               (CX + 8 * U, CY + 8 * U), (CX - 8 * U, CY + 8 * U))]
    # 6: degenerate sliver + vertex exactly on a cover-cell border
    cell_edge_x = ((CX >> 16) << 16)   # x on a zoom-16 cell boundary
    z6 = [ring((cell_edge_x, CY), (cell_edge_x + 3 * U, CY + 1),
               (cell_edge_x, CY + 2))]
    return {
        "zone0000": z0, "zone0001": z1, "zone0002": z2, "zone0003": z3,
        "zone0004": z4, "zone0005": z5, "zone0006": z6,
    }


@pytest.fixture(scope="module")
def zones():
    return {name: prepare_zone(name, rings)
            for name, rings in _zone_inventory().items()}


@pytest.fixture(scope="module")
def placed_points(zones):
    """FIXTURES.md placement: 70% uniform window / 20% hot cell /
    5% exactly on zone boundaries (segment-sampled, vertices included) /
    5% outside incl. latitudes at the ±85.05 clamp."""
    rng = np.random.default_rng(SEED)
    n_uni = int(N * 0.70)
    n_hot = int(N * 0.20)
    n_bnd = int(N * 0.05)
    n_out = N - n_uni - n_hot - n_bnd

    span = 16 * U
    ux = rng.integers(CX - span, CX + span, n_uni)
    uy = rng.integers(CY - span, CY + span, n_uni)

    hx = rng.integers(CX + 3 * U, CX + 3 * U + 2048, n_hot)
    hy = rng.integers(CY + 3 * U, CY + 3 * U + 2048, n_hot)

    # on-boundary: points sampled exactly on ring segments of zone0002
    # (integer points on axis-parallel edges) + exact ring vertices
    z2 = _zone_inventory()["zone0002"]
    bx, by = [], []
    edges = np.vstack([np.hstack([r[:-1], r[1:]]) for r in z2])
    for i in range(n_bnd):
        ax, ay, ex, ey = edges[i % len(edges)]
        if i % 3 == 0:
            bx.append(ax)
            by.append(ay)              # exact vertex
        elif ay == ey:
            t = rng.integers(min(ax, ex), max(ax, ex) + 1)
            bx.append(t)
            by.append(ay)              # on horizontal edge
        else:
            t = rng.integers(min(ay, ey), max(ay, ey) + 1)
            bx.append(ax)
            by.append(t)               # on vertical edge

    ox = rng.integers(CX + 40 * U, CX + 80 * U, n_out)
    oy = np.array([M.y_from_lat(lat) for lat in
                   rng.uniform(85.0, 90.0, n_out)], dtype=np.int64)

    x = np.concatenate([ux, hx, np.array(bx, dtype=np.int64), ox])
    y = np.concatenate([uy, hy, np.array(by, dtype=np.int64), oy])
    return pd.DataFrame({
        "image_id": [f"img{i:012d}" for i in range(N)],
        "x": x, "y": y,
        "cell_id": np.asarray(M.cell_id(x, y, 12)),
        "bucket": (["uniform"] * n_uni + ["hot"] * n_hot
                   + ["boundary"] * n_bnd + ["outside"] * n_out),
    })


@pytest.fixture(scope="module")
def points_df(spark, placed_points):
    df = spark.createDataFrame(placed_points)
    df.persist().count()
    return df


@pytest.mark.parametrize("zname", ["zone0000", "zone0001", "zone0002",
                                   "zone0003", "zone0004", "zone0005",
                                   "zone0006"])
@pytest.mark.parametrize("predicate", ["within", "intersects"])
def test_engine_matches_oracle(points_df, placed_points, zones,
                               zname, predicate):
    z = zones[zname]
    got = sorted(r.image_id for r in
                 join_zones(points_df, [z], predicate=predicate,
                            columns=["image_id"]).collect())
    loc = kernel.locate_points(placed_points.x.to_numpy(),
                               placed_points.y.to_numpy(), z.edges)
    min_loc = kernel.INSIDE if predicate == "within" else kernel.BOUNDARY
    want = sorted(placed_points.image_id.to_numpy()[loc >= min_loc])
    assert got == want


def test_boundary_points_semantics(placed_points, zones):
    """Every 'boundary' bucket point must locate as BOUNDARY on zone0002 —
    i.e. within excludes them, intersects includes them (the parity rules
    of PointInPolygon.h:59-67)."""
    b = placed_points[placed_points.bucket == "boundary"]
    loc = kernel.locate_points(b.x.to_numpy(), b.y.to_numpy(),
                               zones["zone0002"].edges)
    assert (loc == kernel.BOUNDARY).all()


def test_clamp_latitudes_assigned(placed_points):
    out = placed_points[placed_points.bucket == "outside"]
    # clamped y stays within int32 and lands in row 0 cells at zoom 12
    assert (out.y <= 2**31 - 2).all()
    rows = np.asarray(M.cell_row(M.cell_id(out.x.to_numpy(),
                                           out.y.to_numpy(), 12)))
    assert rows.min() >= 0


def test_giant_zone_turbo_cover(zones):
    z = zones["zone0005"]
    from libgeodesk_spark.geom.zones import INSIDE
    n_inside = sum(1 for v in z.cover.values() if v == INSIDE)
    assert n_inside >= 16 * 16 - 64     # giant: mostly turbo cells


def test_tiny_zone_boundary_only(zones):
    from libgeodesk_spark.geom.zones import BOUNDARY
    assert set(zones["zone0004"].cover.values()) == {BOUNDARY}


def test_xor_hash_device(points_df, placed_points, zones):
    """The reference's concurrency-determinism trick: order-independent
    XOR hash of result ids equals the oracle's (test_concur.cpp:92-113)."""
    from pyspark.sql import functions as F
    got = (join_zones(points_df, [zones["zone0001"]], predicate="within",
                      columns=["image_id"])
           .select(F.xxhash64("image_id").alias("h"))
           .agg(F.expr("bit_xor(h)")).first()[0])
    # oracle side computed through Spark too (same hash fn), brute force
    loc = kernel.locate_points(placed_points.x.to_numpy(),
                               placed_points.y.to_numpy(),
                               zones["zone0001"].edges)
    ids = placed_points.image_id.to_numpy()[loc == 1].tolist()
    spark = points_df.sparkSession
    want = (spark.createDataFrame([(i,) for i in ids], "image_id string")
            .select(F.xxhash64("image_id").alias("h"))
            .agg(F.expr("bit_xor(h)")).first()[0])
    assert got == want
