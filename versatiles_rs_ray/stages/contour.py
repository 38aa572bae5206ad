"""Contour lines from a DEM grid (marching squares) — the
raster->vector half of the engine's raster<->vector surface
(BASELINE.json north star; gdal_contour is the reference tool shape:
`-i interval -b base` level generation, linear edge interpolation).

From the published marching-squares algorithm, vectorized: one pass
classifies every cell against a level (4 corner bits -> 16 cases),
crossings are interpolated on grid edges for ALL cells of a case at
once, and segments are emitted oriented so the >= level region lies
on the LEFT of the walk direction. Chaining joins segments into
polylines by their shared grid-edge ids — endpoints on the same edge
are computed from the same two corner values with the same float
chain, so edge identity (integer) replaces float matching.

Saddle cells (cases 5/10) disambiguate by the cell's center average
(the common marching-squares rule; deterministic).
"""

from __future__ import annotations

import numpy as np

# edge ids per cell: 0=top, 1=right, 2=bottom, 3=left.
# case = tl*1 + tr*2 + br*4 + bl*8 (corner >= level).
# segments (entry_edge, exit_edge) oriented with inside (>=) on the left.
_CASE_SEGMENTS = {
    1: [(3, 0)],            # tl only
    2: [(0, 1)],            # tr only
    3: [(3, 1)],            # top row
    4: [(1, 2)],            # br only
    6: [(0, 2)],            # right column
    7: [(3, 2)],            # all but bl
    8: [(2, 3)],            # bl only
    9: [(2, 0)],            # left column
    11: [(2, 1)],           # all but br
    12: [(1, 3)],           # bottom row
    13: [(1, 0)],           # all but tr
    14: [(0, 3)],           # all but tl
    # 5 / 10 are saddles, resolved at runtime
}
_SADDLE = {
    # case 5 (tl+br): center >= level joins the two inside corners
    (5, True): [(3, 2), (1, 0)],
    (5, False): [(3, 0), (1, 2)],
    # case 10 (tr+bl): mirrored
    (10, True): [(2, 1), (0, 3)],
    (10, False): [(0, 1), (2, 3)],
}


def _edge_points(z, level, ii, jj, edge):
    """Crossing coordinates (x, y) in pixel space and the integer edge
    key for cells (ii, jj) on the given edge. Pixel (j, i) maps to
    x = j, y = i (row-major grid)."""
    H, W = z.shape
    if edge == 0:    # top: between (i, j) and (i, j+1)
        z0, z1 = z[ii, jj], z[ii, jj + 1]
        t = (level - z0) / (z1 - z0)
        x, y = jj + t, ii.astype(np.float64)
        key = (ii * W + jj) * 2  # horizontal edge id
    elif edge == 2:  # bottom: between (i+1, j) and (i+1, j+1)
        z0, z1 = z[ii + 1, jj], z[ii + 1, jj + 1]
        t = (level - z0) / (z1 - z0)
        x, y = jj + t, (ii + 1).astype(np.float64)
        key = ((ii + 1) * W + jj) * 2
    elif edge == 3:  # left: between (i, j) and (i+1, j)
        z0, z1 = z[ii, jj], z[ii + 1, jj]
        t = (level - z0) / (z1 - z0)
        x, y = jj.astype(np.float64), ii + t
        key = (ii * W + jj) * 2 + 1  # vertical edge id
    else:            # right: between (i, j+1) and (i+1, j+1)
        z0, z1 = z[ii, jj + 1], z[ii + 1, jj + 1]
        t = (level - z0) / (z1 - z0)
        x, y = (jj + 1).astype(np.float64), ii + t
        key = (ii * W + jj + 1) * 2 + 1
    return x, y, key


def contour_segments(z, level: float):
    """Vectorized marching squares: all oriented crossings of ``level``
    over the (H-1)x(W-1) cells of float grid ``z``. Returns
    (x0, y0, x1, y1, k0, k1): segment endpoints in pixel coordinates
    and their integer grid-edge keys (k identifies the edge a point
    lies on — shared bit-exactly by the neighbor cell)."""
    z = np.asarray(z, dtype=np.float64)
    if z.ndim != 2 or z.shape[0] < 2 or z.shape[1] < 2:
        raise ValueError("contour grid must be 2-D with shape >= (2, 2)")
    inside = z >= level
    tl = inside[:-1, :-1]
    tr = inside[:-1, 1:]
    br = inside[1:, 1:]
    bl = inside[1:, :-1]
    case = (tl * 1 + tr * 2 + br * 4 + bl * 8).astype(np.int8)
    xs0, ys0, xs1, ys1, ks0, ks1 = [], [], [], [], [], []

    def emit(ii, jj, e_in, e_out):
        x0, y0, k0 = _edge_points(z, level, ii, jj, e_in)
        x1, y1, k1 = _edge_points(z, level, ii, jj, e_out)
        xs0.append(x0); ys0.append(y0); ks0.append(k0)
        xs1.append(x1); ys1.append(y1); ks1.append(k1)

    for c, segs in _CASE_SEGMENTS.items():
        ii, jj = np.nonzero(case == c)
        if not len(ii):
            continue
        for e_in, e_out in segs:
            emit(ii, jj, e_in, e_out)
    for c in (5, 10):
        ii, jj = np.nonzero(case == c)
        if not len(ii):
            continue
        center = (z[ii, jj] + z[ii, jj + 1]
                  + z[ii + 1, jj] + z[ii + 1, jj + 1]) * 0.25
        for flag in (True, False):
            m = (center >= level) == flag
            if not m.any():
                continue
            for e_in, e_out in _SADDLE[(c, flag)]:
                emit(ii[m], jj[m], e_in, e_out)
    if not xs0:
        e = np.empty(0, dtype=np.float64)
        k = np.empty(0, dtype=np.int64)
        return e, e, e, e, k, k
    return (np.concatenate(xs0), np.concatenate(ys0),
            np.concatenate(xs1), np.concatenate(ys1),
            np.concatenate(ks0).astype(np.int64),
            np.concatenate(ks1).astype(np.int64))


def chain_segments(x0, y0, x1, y1, k0, k1):
    """Join oriented segments into polylines by shared edge keys.

    With inside-on-the-left orientation every edge key appears at most
    once as a start and once as an end, so chains follow out[k] links:
    open chains start at keys that are never an end (grid border),
    closed rings pick their lowest remaining key as a deterministic
    anchor. Returns a list of (N, 2) float arrays of pixel (x, y)."""
    n = len(k0)
    if n == 0:
        return []
    nxt = {int(k): i for i, k in enumerate(k0)}  # start edge -> segment
    if len(nxt) != n:
        raise AssertionError("contour orientation broken: duplicate starts")
    is_end = set(int(k) for k in k1)
    used = np.zeros(n, dtype=bool)
    chains = []

    def walk(seg):
        pts = [(x0[seg], y0[seg])]
        while True:
            used[seg] = True
            pts.append((x1[seg], y1[seg]))
            seg2 = nxt.get(int(k1[seg]))
            if seg2 is None or used[seg2]:
                return pts
            seg = seg2

    # open chains first: starts whose key is never an end
    for i in range(n):
        if not used[i] and int(k0[i]) not in is_end:
            chains.append(walk(i))
    # remaining segments form closed rings: anchor at the lowest key
    rest = np.flatnonzero(~used)
    order = rest[np.argsort(k0[rest], kind="stable")] if len(rest) else rest
    for i in order:
        if not used[i]:
            chains.append(walk(i))
    return [np.asarray(c, dtype=np.float64) for c in chains]


def level_list(zmin: float, zmax: float, interval: float | None = None,
               base: float = 0.0, levels=None):
    """gdal_contour level generation: explicit ``levels``, or base +
    k*interval strictly inside (zmin, zmax)."""
    if levels is not None:
        return [float(v) for v in levels]
    if not interval or interval <= 0:
        raise ValueError("need levels= or a positive interval")
    k0 = int(np.ceil((zmin - base) / interval))
    k1 = int(np.floor((zmax - base) / interval))
    return [base + k * interval for k in range(k0, k1 + 1)]


def contour_lines(g, interval: float | None = None, base: float = 0.0,
                  levels=None, simplify_px: float = 0.0):
    """Contours of a decoded raster source (GeoTIFF-like: .array with
    band 0 = elevation, .geotransform). Returns a list of
    (level, (N, 2) world-xy polyline) in the source SRS.
    ``simplify_px`` > 0 Douglas-Peucker-reduces each chain in PIXEL
    units before georeferencing (rings keep >= 3 vertices)."""
    from ..core.simplify import simplify_line, simplify_ring

    arr = g.array
    z = (arr[..., 0] if arr.ndim == 3 else arr).astype(np.float64)
    gt = g.geotransform
    out = []
    for level in level_list(np.nanmin(z), np.nanmax(z), interval, base,
                            levels):
        segs = contour_segments(z, level)
        for pts in chain_segments(*segs):
            if simplify_px > 0:
                if len(pts) > 2 and np.array_equal(pts[0], pts[-1]):
                    pts = np.vstack(
                        [simplify_ring(pts[:-1], simplify_px), pts[:1]])
                else:
                    pts = simplify_line(pts, simplify_px)
            # pixel (x, y) -> world via the affine geotransform;
            # pixel centers sit at +0.5 like gdal_contour
            wx = gt[0] + (pts[:, 0] + 0.5) * gt[1] + (pts[:, 1] + 0.5) * gt[2]
            wy = gt[3] + (pts[:, 0] + 0.5) * gt[4] + (pts[:, 1] + 0.5) * gt[5]
            out.append((level, np.column_stack([wx, wy])))
    return out
