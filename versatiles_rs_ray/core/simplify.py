"""Douglas-Peucker polyline simplification (the published algorithm;
the standard tiling-engine vertex reducer — tippecanoe/GDAL
`simplify`). Iterative stack form with the per-span perpendicular
distances computed vectorized, so long lines cost O(kept-spans) numpy
passes rather than per-point Python.
"""

from __future__ import annotations

import numpy as np


def dp_mask(pts: np.ndarray, tol: float) -> np.ndarray:
    """Boolean keep-mask of Douglas-Peucker on an open polyline.

    pts: (N, 2) float64. Endpoints are always kept. A point is dropped
    when its perpendicular distance to the current chord is <= tol
    (degenerate chords fall back to point distance)."""
    pts = np.asarray(pts, dtype=np.float64)
    n = len(pts)
    if n <= 2:
        return np.ones(n, dtype=bool)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    tol2 = float(tol) * float(tol)
    stack = [(0, n - 1)]
    x, y = pts[:, 0], pts[:, 1]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        ax, ay, bx, by = x[a], y[a], x[b], y[b]
        dx, dy = bx - ax, by - ay
        sx, sy = x[a + 1:b] - ax, y[a + 1:b] - ay
        L2 = dx * dx + dy * dy
        if L2 == 0.0:
            d2 = sx * sx + sy * sy  # degenerate chord: point distance
        else:
            cross = sx * dy - sy * dx
            d2 = cross * cross / L2
        m = int(np.argmax(d2))
        if d2[m] > tol2:
            mid = a + 1 + m
            keep[mid] = True
            stack.append((a, mid))
            stack.append((mid, b))
    return keep


def simplify_line(pts: np.ndarray, tol: float) -> np.ndarray:
    """Open polyline -> simplified copy (endpoints preserved)."""
    pts = np.asarray(pts, dtype=np.float64)
    return pts[dp_mask(pts, tol)]


def simplify_ring(pts: np.ndarray, tol: float) -> np.ndarray:
    """Closed ring (WITHOUT repeated closing vertex) -> simplified
    ring, still without the closing vertex. The ring is closed
    virtually (first point appended) for the recursion, so the seam
    vertex is an anchor; rings that would collapse below 3 distinct
    vertices return the original ring unchanged (a degenerate polygon
    is worse than an unsimplified one)."""
    pts = np.asarray(pts, dtype=np.float64)
    if len(pts) < 4:
        return pts
    closed = np.vstack([pts, pts[:1]])
    out = closed[dp_mask(closed, tol)][:-1]
    return out if len(out) >= 3 else pts
