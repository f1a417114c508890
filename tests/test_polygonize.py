"""Polygonizer tests: fragment the gate zones' rings into shuffled open
ways, reassemble, and verify locate results are identical to the originals
(the reference Polygonizer's contract, Polygonizer.cpp:15-168)."""

import numpy as np
import pytest

from libgeodesk_spark.geom import kernel
from libgeodesk_spark.geom.polygonize import (
    PolygonizeError,
    assign_holes,
    build_rings,
    polygonize,
)
from libgeodesk_spark.geom.zones import rings_to_edges
from libgeodesk_spark.sources.points import GATE_ZONES


def fragment(ring: np.ndarray, rng, n_parts: int) -> list[np.ndarray]:
    """Split a closed ring into open ways, randomly reversed/shuffled."""
    ring = np.asarray(ring, dtype=np.int64)
    body = ring[:-1]
    cuts = sorted(rng.choice(len(body), size=min(n_parts, len(body) - 1),
                             replace=False))
    parts = []
    idx = list(range(len(body))) + [0]
    prev = 0
    for c in cuts[1:]:
        seg = ring[prev:c + 1]
        if len(seg) >= 2:
            parts.append(seg)
        prev = c
    parts.append(ring[prev:])
    parts = [p for p in parts if len(p) >= 2]
    out = []
    for p in parts:
        out.append(p[::-1].copy() if rng.random() < 0.5 else p.copy())
    rng.shuffle(out)
    return out


@pytest.mark.parametrize("zname", ["convex", "comb", "holed"])
def test_reassembly_preserves_locate(zname):
    rng = np.random.default_rng(9)
    rings = [np.array(r, dtype=np.int64) for r in GATE_ZONES[zname]]
    ways = []
    for r in rings:
        ways.extend(fragment(r, rng, 4))
    rebuilt = polygonize(ways)
    assert len(rebuilt) == len(rings)

    px = rng.integers(rings[0][:, 0].min() - 10**6,
                      rings[0][:, 0].max() + 10**6, 5000)
    py = rng.integers(rings[0][:, 1].min() - 10**6,
                      rings[0][:, 1].max() + 10**6, 5000)
    a = kernel.locate_points(px, py, rings_to_edges(rings))
    b = kernel.locate_points(px, py, rings_to_edges(rebuilt))
    assert np.array_equal(a, b)


def test_closed_ways_pass_through():
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]])
    out = build_rings([sq])
    assert len(out) == 1 and np.array_equal(out[0], sq)


def test_dangling_raises():
    with pytest.raises(PolygonizeError, match="dangling"):
        build_rings([np.array([[0, 0], [10, 0]]),
                     np.array([[10, 0], [10, 10]])])   # never closes


def test_assign_holes_nesting():
    outer = np.array([[0, 0], [100, 0], [100, 100], [0, 100], [0, 0]])
    hole = np.array([[20, 20], [80, 20], [80, 80], [20, 80], [20, 20]])
    island = np.array([[40, 40], [60, 40], [60, 60], [40, 60], [40, 40]])
    flags = dict()
    for r, is_shell in assign_holes([outer, hole, island]):
        flags[r[0, 0]] = is_shell
    assert flags[0] is True        # outer: depth 0 -> shell
    assert flags[20] is False      # hole: depth 1
    assert flags[40] is True       # island in hole: depth 2 -> shell


def test_multipart_fragments():
    rng = np.random.default_rng(3)
    rings = [np.array(r, dtype=np.int64) for r in GATE_ZONES["holed"]]
    ways = []
    for r in rings:
        ways.extend(fragment(r, rng, 6))
    rebuilt = build_rings(ways)
    assert len(rebuilt) == 2
    shells = [s for _, s in assign_holes(rebuilt)]
    assert sorted(shells) == [False, True]


def test_rings_touching_at_point():
    """Two rings sharing one vertex (4 way-endpoints meet at the node):
    assembly must succeed and preserve locate parity regardless of which
    branch is taken at the junction (backtracking case from RingBuilder)."""
    a = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]])
    b = np.array([[10, 10], [20, 10], [20, 20], [10, 20], [10, 10]])
    ways = [
        np.array([[0, 0], [10, 0], [10, 10]]),
        np.array([[10, 10], [20, 10], [20, 20]]),
        np.array([[10, 10], [10, 20], [20, 20]]),   # both B-pieces start at node
        np.array([[10, 10], [0, 10], [0, 0]]),
    ]
    rebuilt = build_rings(ways)
    ref = rings_to_edges([a, b])
    got = rings_to_edges(rebuilt)
    px = np.arange(-2, 23)
    for y in range(-2, 23):
        la = kernel.locate_points(px, np.full(len(px), y), ref)
        lb = kernel.locate_points(px, np.full(len(px), y), got)
        assert np.array_equal(la, lb)


def test_assign_holes_probe_on_boundary():
    """Hole whose first vertex lies ON the shell boundary: nesting must be
    decided by a vertex off the boundary (ADVICE: probe with a non-boundary
    vertex)."""
    shell = np.array([[0, 0], [100, 0], [100, 100], [0, 100], [0, 0]])
    # hole's first vertex (50,0) sits on the shell's bottom edge
    hole = np.array([[50, 0], [80, 30], [50, 60], [20, 30], [50, 0]])
    flags = [s for _, s in assign_holes([shell, hole])]
    assert flags == [True, False]


# --- RingMerger + centroid dispatch (round 2) --------------------------------

from libgeodesk_spark.geom.polygonize import (
    area_relation_centroid,
    merge_touching_rings,
    relation_centroid,
)


def sq(x0, y0, s):
    return np.array([[x0, y0], [x0 + s, y0], [x0 + s, y0 + s],
                     [x0, y0 + s], [x0, y0]], dtype=np.int64)


def test_merge_touching_rings_shared_edge():
    """Two holes sharing a full edge merge into one ring covering both."""
    a = sq(0, 0, 10)
    # b shares a's right edge (10,0)-(10,10) traversed in reverse
    b = np.array([[10, 0], [20, 0], [20, 10], [10, 10], [10, 0]], dtype=np.int64)
    merged = merge_touching_rings([a, b])
    assert len(merged) == 1
    m = merged[0]
    edges = rings_to_edges([m])
    # merged ring = the 20x10 rectangle: interior points of both squares in,
    # the old shared edge interior is now INSIDE, corners on boundary
    assert kernel.locate_points([5, 15, 10], [5, 5, 5], edges).tolist() == [1, 1, 1]
    assert kernel.locate_points([0, 20], [5, 5], edges).tolist() == [0, 0]
    # shoelace area = sum of both squares
    assert abs(kernel.shoelace2(m[:, 0], m[:, 1])) == 2 * (200)


def test_merge_keeps_disjoint_rings():
    a, b = sq(0, 0, 10), sq(100, 100, 10)
    merged = merge_touching_rings([a, b])
    assert len(merged) == 2


def test_relation_centroid_priority():
    area = [sq(0, 0, 10)]
    lines = [np.array([[100, 100], [200, 100]])]
    nodes = [(500, 500), (700, 700)]
    bbox = (0, 0, 1000, 1000)
    # areal wins over lineal/puntal
    assert relation_centroid(area, lines, nodes, bbox) == (5, 5)
    # lineal wins over puntal
    assert relation_centroid([], lines, nodes, bbox) == (150, 100)
    # puntal
    assert relation_centroid([], [], nodes, bbox) == (600, 600)
    # degenerate -> bbox center
    assert relation_centroid([], [], [], bbox) == (500, 500)
    # zero-area areal member falls through to lineal
    degen = [np.array([[0, 0], [10, 10], [0, 0]])]
    assert relation_centroid(degen, lines, [], bbox) == (150, 100)


def test_area_relation_centroid_with_touching_holes():
    """Shell with two edge-sharing holes: centroid must equal the same
    polygon expressed with the single merged hole."""
    shell = sq(0, 0, 100)
    h1 = sq(20, 20, 20)
    h2 = np.array([[40, 20], [60, 20], [60, 40], [40, 40], [40, 20]],
                  dtype=np.int64)
    merged_hole = np.array([[20, 20], [60, 20], [60, 40], [20, 40], [20, 20]],
                           dtype=np.int64)
    got = area_relation_centroid([shell, h1, h2], (0, 0, 100, 100))
    exp = kernel.areal_centroid(
        [(shell[:, 0], shell[:, 1]), (merged_hole[:, 0], merged_hole[:, 1])],
        [True, False])
    assert got == exp


def test_area_relation_centroid_degenerate_bbox_fallback():
    dangling = [np.array([[0, 0], [10, 0]])]
    assert area_relation_centroid(dangling, (0, 0, 8, 4)) == (4, 2)
