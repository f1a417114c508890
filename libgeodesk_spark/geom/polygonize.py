"""Polygonizer: assemble unordered way fragments into rings and classify
shells vs holes — the reference's Polygonizer (G8 of SURVEY §2.6).

Reference pipeline (src/geom/polygon/Polygonizer.cpp:15-168, RingBuilder.cpp,
RingAssigner.h:1-112): member ways are chained by matching endpoints into
closed rings (RingBuilder), rings are split into outer shells and inner
holes, and each hole is assigned to the shell that contains it
(RingAssigner; containment via point-in-polygon on a hole vertex).

This is a driver-side preparation step (zones are built once, broadcast
many times — SURVEY §7.1), so a clear O(n) endpoint-hash implementation
over numpy arrays is the right shape; no Spark in the loop.
"""

from __future__ import annotations

import numpy as np

from libgeodesk_spark.geom import kernel
from libgeodesk_spark.geom.zones import rings_to_edges


class PolygonizeError(ValueError):
    pass


def build_rings(ways: list[np.ndarray]) -> list[np.ndarray]:
    """Chain open ways (each (k,2) int array) into closed rings by exact
    endpoint matching (RingBuilder.cpp: createSegment/buildRings). Ways may
    need reversing; already-closed ways pass through. Raises on dangling
    ends (the reference marks such relations degenerate)."""
    closed: list[np.ndarray] = []
    open_ways: list[np.ndarray] = []
    for w in ways:
        w = np.asarray(w, dtype=np.int64).reshape(-1, 2)
        if len(w) < 2:
            continue
        if (w[0] == w[-1]).all():
            if len(w) >= 4:
                closed.append(w)
        else:
            open_ways.append(w)

    # endpoint index: coordinate -> list of (way_idx, is_start)
    endpoints: dict[tuple[int, int], list[tuple[int, bool]]] = {}
    for i, w in enumerate(open_ways):
        endpoints.setdefault(tuple(w[0]), []).append((i, True))
        endpoints.setdefault(tuple(w[-1]), []).append((i, False))

    used = [False] * len(open_ways)

    def extend(chain: list[np.ndarray], cur: tuple, start: tuple) -> bool:
        """DFS with backtracking: at nodes where >2 ways meet (valid OSM
        multipolygons with rings touching at a point), the greedy first
        candidate may strand the ring — try each alternative branch."""
        if cur == start:
            return True
        for j, at_start in endpoints.get(cur, ()):
            if used[j]:
                continue
            used[j] = True
            seg = open_ways[j] if at_start else open_ways[j][::-1]
            chain.append(seg[1:])
            if extend(chain, tuple(seg[-1]), start):
                return True
            chain.pop()
            used[j] = False
        return False

    for i, w in enumerate(open_ways):
        if used[i]:
            continue
        used[i] = True
        chain = [w]
        if not extend(chain, tuple(w[-1]), tuple(w[0])):
            raise PolygonizeError(
                f"dangling endpoint {tuple(w[-1])}: ways do not close a ring")
        ring = np.vstack(chain)
        if len(ring) >= 4:
            closed.append(ring)
    return closed


def assign_holes(rings: list[np.ndarray]) -> list[tuple[np.ndarray, bool]]:
    """Classify rings into shells/holes by even-odd nesting depth
    (RingAssigner): a ring nested inside an odd number of other rings is a
    hole. Returns [(ring, is_shell)] — the input format of
    Centroid-style consumers; parity-based locate needs no assignment at
    all (every ring's edges participate), but the shell flag matters for
    centroid/area sign rules."""
    out = []
    for i, r in enumerate(rings):
        # test r against every other ring; vertices on the other ring's
        # boundary don't decide nesting (rings touching at a point) — probe
        # with the first vertex NOT on the other ring's boundary
        depth = 0
        for j, other in enumerate(rings):
            if i == j:
                continue
            edges = rings_to_edges([other])
            loc = kernel.locate_points(r[:, 0], r[:, 1], edges)
            decisive = loc[loc != kernel.BOUNDARY]
            if len(decisive) and decisive[0] == kernel.INSIDE:
                depth += 1
        out.append((r, depth % 2 == 0))
    return out


def polygonize(ways: list[np.ndarray]) -> list[np.ndarray]:
    """ways → closed rings ready for :func:`prepare_zone` (whose crossing
    parity handles holes without explicit roles)."""
    return build_rings(ways)


def _edge_key(a, b) -> tuple:
    a, b = (int(a[0]), int(a[1])), (int(b[0]), int(b[1]))
    return (a, b) if a <= b else (b, a)


def merge_touching_rings(rings: list[np.ndarray]) -> list[np.ndarray]:
    """RingMerger (src/geom/polygon/RingMerger.cpp:15-188): rings sharing
    EDGES (inner rings of a multipolygon that touch along a boundary) are
    merged — duplicated undirected edges are removed, the surviving chains
    re-polygonized. Rings without shared edges pass through untouched."""
    from collections import Counter
    counts: Counter = Counter()
    ring_edges = []
    for r in rings:
        r = np.asarray(r, dtype=np.int64).reshape(-1, 2)
        edges = [_edge_key(r[i], r[i + 1]) for i in range(len(r) - 1)]
        ring_edges.append((r, edges))
        counts.update(edges)
    valid: list[np.ndarray] = []
    chains: list[np.ndarray] = []
    for r, edges in ring_edges:
        dup = [counts[e] >= 2 for e in edges]
        if not any(dup):
            valid.append(r)
            continue
        # break the ring into maximal chains of non-duplicated edges
        run_start = None
        for i, d in enumerate(dup + [True]):
            if not d and run_start is None:
                run_start = i
            elif d and run_start is not None:
                chains.append(r[run_start:i + 1])
                run_start = None
    if chains:
        valid.extend(build_rings(chains))
    return valid


def relation_centroid(area_ways: list[np.ndarray],
                      line_ways: list[np.ndarray],
                      nodes: list[tuple[int, int]],
                      bbox: tuple[int, int, int, int]) -> tuple[int, int]:
    """Centroid of a NON-area relation with mixed members — the priority
    dispatch of Centroid::ofRelation (src/geom/Centroid.cpp:51-74):
    areal > lineal > puntal, bbox center as the degenerate fallback.
    Area-way members contribute rings (each as a shell, Centroid.cpp:77-88);
    lineal ways contribute length-weighted segments; nodes the mean."""
    if area_ways:
        rings = []
        for w in area_ways:
            w = np.asarray(w, dtype=np.int64).reshape(-1, 2)
            if (w[0] != w[-1]).any():
                w = np.vstack([w, w[:1]])
            rings.append((w[:, 0], w[:, 1]))
        a = sum(float(np.sum(xs[:-1] * ys[1:] - xs[1:] * ys[:-1]))
                for xs, ys in ((np.asarray(x, dtype=np.float64),
                                np.asarray(y, dtype=np.float64))
                               for x, y in rings))
        if a != 0.0:
            return kernel.areal_centroid(rings)
    if line_ways:
        total = 0.0
        cx = cy = 0.0
        for w in line_ways:
            w = np.asarray(w, dtype=np.float64).reshape(-1, 2)
            seg = np.sqrt(np.diff(w[:, 0]) ** 2 + np.diff(w[:, 1]) ** 2)
            total += float(seg.sum())
            cx += float(np.sum((w[:-1, 0] + w[1:, 0]) * seg))
            cy += float(np.sum((w[:-1, 1] + w[1:, 1]) * seg))
        if total > 0.0:
            from libgeodesk_spark.mercator import round_half_away
            return (round_half_away(cx / (total * 2.0)),
                    round_half_away(cy / (total * 2.0)))
    if nodes:
        xs = np.array([n[0] for n in nodes], dtype=np.float64)
        ys = np.array([n[1] for n in nodes], dtype=np.float64)
        return kernel.puntal_centroid(xs, ys)
    # degenerate: bbox center (Centroid.cpp:57-60, Box::center)
    return ((bbox[0] + bbox[2]) // 2, (bbox[1] + bbox[3]) // 2)


def area_relation_centroid(member_ways: list[np.ndarray],
                           bbox: tuple[int, int, int, int]) -> tuple[int, int]:
    """Centroid of an AREA relation (Centroid::addAreaRelation,
    src/geom/Centroid.cpp:31-48): polygonize member ways into rings,
    classify shells/holes, merge touching holes (RingMerger), then the
    ring-weighted areal centroid; bbox center if no rings could be built."""
    try:
        rings = build_rings(member_ways)
    except PolygonizeError:
        rings = []
    if not rings:
        return ((bbox[0] + bbox[2]) // 2, (bbox[1] + bbox[3]) // 2)
    assigned = assign_holes(rings)
    shells = [r for r, s in assigned if s]
    holes = [r for r, s in assigned if not s]
    if len(holes) > 1:
        holes = merge_touching_rings(holes)
    ring_list = [(r[:, 0], r[:, 1]) for r in shells + holes]
    flags = [True] * len(shells) + [False] * len(holes)
    return kernel.areal_centroid(ring_list, flags)
