"""Zone preparation / cell-cover classification tests.

The cover is the distributed analog of the reference's acceptTile
(WithinFilter.cpp:164-171): INSIDE cells turbo-accept, BOUNDARY cells run
the kernel, absent cells are pruned. Invariant checked here: for any point,
membership computed via (cover + kernel on boundary cells) equals the
direct kernel answer.
"""

import numpy as np

from libgeodesk_spark.geom import kernel
from libgeodesk_spark.geom.zones import (
    BOUNDARY,
    INSIDE,
    pack_colrow,
    prepare_zone,
)
from libgeodesk_spark.mercator import col_from_x, row_from_y


def ring(*pts):
    pts = list(pts)
    if pts[0] != pts[-1]:
        pts.append(pts[0])
    return np.array(pts, dtype=np.int64)


CELL16 = 1 << 16  # zoom-16 cover cell extent (COVER_ZOOM default)


def cover_of(z, x, y):
    return z.cover.get(int(pack_colrow(col_from_x(x, z.zoom),
                                       row_from_y(y, z.zoom))))


def test_tiny_zone_single_boundary_cell():
    z = prepare_zone("tiny", [ring((100, 100), (200, 100), (200, 200), (100, 200))])
    assert set(z.cover.values()) == {BOUNDARY}
    assert len(z.cover) >= 1


def test_big_zone_has_inside_cells():
    s = 8 * CELL16
    z = prepare_zone("big", [ring((0, 0), (s, 0), (s, s), (0, s))])
    vals = list(z.cover.values())
    assert vals.count(INSIDE) >= 36
    assert vals.count(BOUNDARY) >= 28


def test_cover_vs_kernel_consistency():
    rng = np.random.default_rng(11)
    pts = [(0, 0), (5 * CELL16, 0), (5 * CELL16, 3 * CELL16),
           (3 * CELL16, 3 * CELL16), (3 * CELL16, CELL16), (2 * CELL16, CELL16),
           (2 * CELL16, 4 * CELL16), (0, 4 * CELL16)]
    z = prepare_zone("concave", [ring(*pts)])
    px = rng.integers(-CELL16, 6 * CELL16, 20000)
    py = rng.integers(-CELL16, 5 * CELL16, 20000)
    direct = kernel.locate_points(px, py, z.edges)

    via = np.full(len(px), -1, dtype=np.int8)
    for i, (x, y) in enumerate(zip(px, py)):
        cov = cover_of(z, int(x), int(y))
        if cov == INSIDE:
            via[i] = 1
        elif cov == BOUNDARY:
            via[i] = kernel.locate_points([x], [y], z.edges)[0]
    assert np.array_equal(np.where(direct == 0, 0, direct),
                          np.where(via == 0, 0, via))


def test_inside_cells_really_inside():
    s = 6 * CELL16
    z = prepare_zone("sq", [ring((0, 0), (s, 0), (s, s), (0, s))])
    shift = 32 - z.zoom
    for key, v in z.cover.items():
        if v != INSIDE:
            continue
        col, row = key >> 20, key & ((1 << 20) - 1)
        mnx = (col << shift) - (1 << 31)
        mxy = (2**31 - 1) - (row << shift)
        mny = mxy - (1 << shift) + 1
        mxx = mnx + (1 << shift) - 1
        corners = np.array([[mnx, mny], [mxx, mny], [mnx, mxy], [mxx, mxy]])
        loc = kernel.locate_points(corners[:, 0], corners[:, 1], z.edges)
        assert (loc == 1).all()


def test_hole_cells_not_inside():
    s = 8 * CELL16
    hole = ring((2 * CELL16, 2 * CELL16), (6 * CELL16, 2 * CELL16),
                (6 * CELL16, 6 * CELL16), (2 * CELL16, 6 * CELL16))
    z = prepare_zone("holed", [ring((0, 0), (s, 0), (s, s), (0, s)), hole])
    assert cover_of(z, 4 * CELL16, 4 * CELL16) != INSIDE


def test_vertex_on_cell_border():
    # degenerate: a vertex exactly on a cover-cell corner (zone0006 analog)
    mnx = (1000 << 16) - (1 << 31)
    mxy = (2**31 - 1) - (2000 << 16)
    mny = mxy - (1 << 16) + 1
    z = prepare_zone("deg", [ring((mnx, mny), (mnx + 10, mny), (mnx, mny + 10))])
    assert len(z.cover) >= 1
    assert all(v == BOUNDARY for v in z.cover.values())


def test_custom_zoom():
    s = 4 * (1 << 20)
    z = prepare_zone("z12", [ring((0, 0), (s, 0), (s, s), (0, s))], zoom=12)
    assert z.zoom == 12
    assert INSIDE in set(z.cover.values())


def test_adaptive_zoom_giant_zone():
    # a near-continent zone must get a coarser cover, bounded in size
    from libgeodesk_spark.geom.zones import MAX_COVER_CELLS
    s = (1 << 28)   # span 2^29, inside the kernel contract
    z = prepare_zone("giant", [ring((-s, -s), (s, -s), (s, s), (-s, s))])
    assert z.zoom < 16
    assert len(z.cover) <= MAX_COVER_CELLS
    assert INSIDE in set(z.cover.values())
    # membership still exact at any zoom
    import numpy as np
    rng = np.random.default_rng(1)
    px = rng.integers(-s - 1000, s + 1000, 2000)
    py = rng.integers(-s - 1000, s + 1000, 2000)
    direct = kernel.locate_points(px, py, z.edges)
    via = np.full(len(px), -1, dtype=np.int8)
    for i, (x, y) in enumerate(zip(px, py)):
        cov = cover_of(z, int(x), int(y))
        if cov == INSIDE:
            via[i] = 1
        elif cov == BOUNDARY:
            via[i] = kernel.locate_points([x], [y], z.edges)[0]
    assert np.array_equal(direct, via)
