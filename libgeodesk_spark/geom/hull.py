"""Convex hull + line simplification — the GEOS-ops analog.

The reference offers hulls/simplify via its optional GEOS bridge
(README "Optional integration with GEOS"; geom/GeometryBuilder.h). This
engine has no GEOS either, so the two most-used ops are implemented as
exact integer numpy kernels (no floats, no tolerance surprises):

* :func:`convex_hull` — Andrew's monotone chain over int64 coords; all
  orientation tests are exact int64 cross products. Collinear points on
  the hull boundary are EXCLUDED (strict turns), matching GEOS's
  minimal-vertex hull.
* :func:`simplify_ring` — Douglas-Peucker with exact integer compares:
  point-segment squared distance comparisons are done as
  cross² <= eps² · |seg|² (both int), so no division and no float
  rounding ever flips a keep/drop decision.

Both are batch-shaped (vertex arrays in, vertex arrays out) so the Spark
operators wrap them per group with applyInPandas (the geometry-kernel
residual path, never per-row Python over the fact table).
"""

from __future__ import annotations

import numpy as np


def _cross(o: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.int64:
    return (int(a[0] - o[0]) * int(b[1] - o[1])
            - int(a[1] - o[1]) * int(b[0] - o[0]))


def convex_hull(pts: np.ndarray) -> np.ndarray:
    """Minimal convex hull (counter-clockwise, no repeated last vertex)
    of an (n, 2) int array. Degenerate inputs: n<=2 or all-collinear
    return the extreme points (1 or 2 vertices)."""
    pts = np.unique(pts.astype(np.int64), axis=0)        # sorted lex
    n = len(pts)
    if n <= 2:
        return pts
    lower: list[np.ndarray] = []
    for p in pts:
        while len(lower) >= 2 and _cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list[np.ndarray] = []
    for p in pts[::-1]:
        while len(upper) >= 2 and _cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    hull = np.array(lower[:-1] + upper[:-1], dtype=np.int64)
    if len(hull) < 3:          # all collinear -> the two extremes
        return np.array([pts[0], pts[-1]], dtype=np.int64)
    return hull


def hull_area2(hull: np.ndarray) -> int:
    """Twice the (positive) area of a CCW hull — exact int (shoelace)."""
    if len(hull) < 3:
        return 0
    x, y = hull[:, 0].astype(object), hull[:, 1].astype(object)
    xn, yn = np.roll(x, -1), np.roll(y, -1)
    return int(abs(sum(x * yn - xn * y)))


def simplify_ring(pts: np.ndarray, eps: int) -> np.ndarray:
    """Douglas-Peucker on an open polyline (first/last always kept).

    A point survives iff its exact squared perpendicular distance to the
    current chord exceeds eps²: cross² > eps² · |chord|² in int — for
    degenerate chords (closed rings / repeated endpoints) the point-
    to-POINT distance is used. Iterative stack, no recursion limits."""
    pts = pts.astype(np.int64)
    n = len(pts)
    if n <= 2:
        return pts
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    eps2 = int(eps) * int(eps)
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        ax, ay = int(pts[i][0]), int(pts[i][1])
        bx, by = int(pts[j][0]), int(pts[j][1])
        vx, vy = bx - ax, by - ay
        seg2 = vx * vx + vy * vy
        best, best_val = -1, -1
        for k in range(i + 1, j):
            px, py = int(pts[k][0]) - ax, int(pts[k][1]) - ay
            if seg2 == 0:
                val = (px * px + py * py) * 1  # point distance, scale 1
                thresh = eps2
            else:
                cr = px * vy - py * vx
                val = cr * cr                  # dist² · seg2
                thresh = eps2 * seg2
            # compare against the shared threshold scale for this chord
            if val > thresh and val > best_val:
                best, best_val = k, val
        if best >= 0:
            keep[best] = True
            stack.append((i, best))
            stack.append((best, j))
    return pts[keep]
