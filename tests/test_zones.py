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


def test_coarsen_cover_exact():
    """coarsen_cover must equal classifying the SAME zone at the coarser
    zoom directly (for cells whose children were all in the fine bbox):
    INSIDE iff all children present+INSIDE, BOUNDARY for any straddle."""
    from libgeodesk_spark.geom.zones import coarsen_cover

    rng = np.random.default_rng(3)
    pts = [(0, 0), (5 * CELL16, 0), (5 * CELL16, 3 * CELL16),
           (3 * CELL16, 3 * CELL16), (3 * CELL16, CELL16), (2 * CELL16, CELL16),
           (2 * CELL16, 4 * CELL16), (0, 4 * CELL16)]
    z = prepare_zone("concave", [ring(*pts)])
    for k in (1, 2, 3):
        coarse = coarsen_cover(z.cover, k)
        # group fine keys under each coarse key and re-derive the class
        groups: dict[int, list[int]] = {}
        for key, val in z.cover.items():
            col, row = key >> 20, key & 0xFFFFF
            ck = ((col >> k) << 20) | (row >> k)
            groups.setdefault(ck, []).append(val)
        assert set(coarse) == set(groups)
        for ck, vals in groups.items():
            want = INSIDE if (len(vals) == 4 ** k
                              and all(v == INSIDE for v in vals)) else BOUNDARY
            assert coarse[ck] == want, (ck, k)
        # and the membership invariant still holds on random probes
        px = rng.integers(-CELL16, 6 * CELL16, 4000)
        py = rng.integers(-CELL16, 5 * CELL16, 4000)
        loc = kernel.locate_points(px, py, z.edges)
        shift = 32 - (z.zoom - k)
        cc = (px.astype(np.int64) + (1 << 31)) >> shift
        rr = (np.int64(0x7FFFFFFF) - py.astype(np.int64)) >> shift
        for x, y, c, r, lo in zip(px, py, cc, rr, loc):
            cov = coarse.get(int((c << 20) | r))
            if cov == INSIDE:
                assert lo == kernel.INSIDE
            elif cov is None:
                assert lo == kernel.OUTSIDE


def test_interval_rle_matches_cover():
    """zone_intervals_df's run-length encoding must reproduce the cover
    dict exactly: every (cell, class) in the cover is inside exactly one
    interval of that class, and interval cells are exactly the cover."""
    import pandas as pd

    from libgeodesk_spark.geom.zones import coarsen_cover  # noqa: F401
    from libgeodesk_spark.operators import spatial_join as sj

    pts = [(0, 0), (5 * CELL16, 0), (5 * CELL16, 3 * CELL16),
           (3 * CELL16, 3 * CELL16), (3 * CELL16, CELL16), (2 * CELL16, CELL16),
           (2 * CELL16, 4 * CELL16), (0, 4 * CELL16)]
    z = prepare_zone("concave", [ring(*pts)])

    # reimplement the RLE driver-side derivation without Spark
    frames = []
    n = len(z.cover)
    keys = np.fromiter(z.cover.keys(), dtype=np.int64, count=n)
    vals = np.fromiter(z.cover.values(), dtype=np.int32, count=n)
    cols, rows = keys >> 20, keys & 0xFFFFF
    rebuilt: dict[int, int] = {}
    for cv in (INSIDE, BOUNDARY):
        m = vals == cv
        order = np.lexsort((cols[m], rows[m]))
        rs, cs = rows[m][order], cols[m][order]
        if len(rs) == 0:
            continue
        newrun = np.ones(len(rs), dtype=bool)
        newrun[1:] = (rs[1:] != rs[:-1]) | (cs[1:] != cs[:-1] + 1)
        starts = np.flatnonzero(newrun)
        ends = np.concatenate([starts[1:] - 1, [len(rs) - 1]])
        for r, c0, c1 in zip(rs[starts], cs[starts], cs[ends]):
            for c in range(int(c0), int(c1) + 1):
                key = int((c << 20) | r)
                assert key not in rebuilt, "overlapping intervals"
                rebuilt[key] = cv
    assert rebuilt == z.cover
