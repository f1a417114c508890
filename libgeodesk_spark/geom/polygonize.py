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
