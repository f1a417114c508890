"""Zone preparation / cell-cover classification tests.

The cover is the distributed analog of the reference's acceptTile
(WithinFilter.cpp:164-171): INSIDE cells turbo-accept, BOUNDARY cells run
the kernel, absent cells are pruned. Invariant checked here: for any point,
membership computed via (cover + kernel on boundary cells) equals the
direct kernel answer.
"""

import numpy as np

from libgeodesk_spark.geom import kernel
from libgeodesk_spark.geom.zones import BOUNDARY, INSIDE, prepare_zone
from libgeodesk_spark.mercator import cell_bounds, cell_id


def ring(*pts):
    pts = list(pts)
    if pts[0] != pts[-1]:
        pts.append(pts[0])
    return np.array(pts, dtype=np.int64)


CELL = 1 << 20  # zoom-12 cell extent


def test_tiny_zone_single_boundary_cell():
    # polygon much smaller than one cell -> its cell(s) are BOUNDARY only
    z = prepare_zone("tiny", [ring((100, 100), (200, 100), (200, 200), (100, 200))])
    assert set(z.cover.values()) == {BOUNDARY}
    assert len(z.cover) >= 1


def test_big_zone_has_inside_cells():
    # polygon spanning ~8x8 cells -> interior cells INSIDE
    s = 8 * CELL
    z = prepare_zone("big", [ring((0, 0), (s, 0), (s, s), (0, s))])
    vals = list(z.cover.values())
    assert vals.count(INSIDE) >= 36      # (8-2)^2 interior cells
    assert vals.count(BOUNDARY) >= 28    # the rim


def test_cover_vs_kernel_consistency():
    rng = np.random.default_rng(11)
    # concave polygon spanning several cells
    pts = [(0, 0), (5 * CELL, 0), (5 * CELL, 3 * CELL), (3 * CELL, 3 * CELL),
           (3 * CELL, CELL), (2 * CELL, CELL), (2 * CELL, 4 * CELL), (0, 4 * CELL)]
    z = prepare_zone("concave", [ring(*pts)])
    px = rng.integers(-CELL, 6 * CELL, 20000)
    py = rng.integers(-CELL, 5 * CELL, 20000)
    direct = kernel.locate_points(px, py, z.edges)

    cells = cell_id(px, py, 12)
    via = np.full(len(px), -1, dtype=np.int8)
    for i, (c, x, y) in enumerate(zip(cells, px, py)):
        cov = z.cover.get(int(c))
        if cov == INSIDE:
            via[i] = 1
        elif cov == BOUNDARY:
            via[i] = kernel.locate_points([x], [y], z.edges)[0]
        # absent -> outside (-1)
    assert np.array_equal(np.where(direct == 0, 0, direct),
                          np.where(via == 0, 0, via))


def test_inside_cells_really_inside():
    s = 6 * CELL
    z = prepare_zone("sq", [ring((0, 0), (s, 0), (s, s), (0, s))])
    for c, v in z.cover.items():
        mnx, mny, mxx, mxy = cell_bounds(c)
        corners = np.array([[mnx, mny], [mxx, mny], [mnx, mxy], [mxx, mxy]])
        loc = kernel.locate_points(corners[:, 0], corners[:, 1], z.edges)
        if v == INSIDE:
            assert (loc == 1).all()


def test_hole_cells_not_inside():
    s = 8 * CELL
    hole = ring((2 * CELL, 2 * CELL), (6 * CELL, 2 * CELL),
                (6 * CELL, 6 * CELL), (2 * CELL, 6 * CELL))
    z = prepare_zone("holed", [ring((0, 0), (s, 0), (s, s), (0, s)), hole])
    # center of the hole: its cell must be absent or BOUNDARY (not INSIDE)
    c = int(cell_id(4 * CELL, 4 * CELL, 12))
    assert z.cover.get(c) != INSIDE


def test_vertex_on_cell_border():
    # degenerate: a vertex exactly on a cell corner (FIXTURES.md zone0006)
    mnx, mny, _, _ = cell_bounds(int(cell_id(0, 0, 12)))
    z = prepare_zone("deg", [ring((mnx, mny), (mnx + 10, mny), (mnx, mny + 10))])
    assert len(z.cover) >= 1
    assert all(v == BOUNDARY for v in z.cover.values())
