"""Rectangle clipping of line/ring geometry — the tippecanoe-style
per-tile clip: each tile keeps only the geometry inside its buffered
square instead of a whole copy of every feature whose bbox touches it
(a 100-tile contour previously shipped its full vertex list into all
100 tiles).

Published algorithms, vectorized:

- lines: Liang-Barsky parametric clipping (Liang & Barsky 1984) —
  per-segment [t0, t1] visibility intervals computed for all segments
  at once; surviving sub-segments chain into maximal polyline pieces
  (a line may exit and re-enter the rect, yielding several pieces);
- rings: Sutherland-Hodgman (1974) against the four half-planes —
  each pass is one vectorized inside-mask + crossing interpolation.
  Output rings are closed by construction; a ring wholly outside
  clips to nothing. (Like the original algorithm, a concave ring
  wrapping a corner may gain boundary-running edges — harmless for
  even-odd fills, the MVT consumer contract.)

Coordinates are float64 (x, y) arrays; the rect is half-open-agnostic
(boundary points are kept — quantization downstream decides ties).
"""

from __future__ import annotations

import numpy as np


def clip_line(pts: np.ndarray, x0: float, y0: float, x1: float,
              y1: float) -> list:
    """Polyline -> list of clipped polyline pieces (each (k, 2)
    float64, k >= 2). Liang-Barsky per segment, vectorized across the
    whole polyline; consecutive surviving segments whose endpoints
    coincide chain into one piece."""
    pts = np.asarray(pts, dtype=np.float64)
    if len(pts) < 2:
        return []
    p = pts[:-1]
    d = pts[1:] - pts[:-1]
    t0 = np.zeros(len(p))
    t1 = np.ones(len(p))
    for axis, lo, hi in ((0, x0, x1), (1, y0, y1)):
        dp = d[:, axis]
        pp = p[:, axis]
        with np.errstate(divide="ignore", invalid="ignore"):
            t_lo = (lo - pp) / dp
            t_hi = (hi - pp) / dp
        enter = np.where(dp > 0, t_lo, np.where(dp < 0, t_hi, -np.inf))
        leave = np.where(dp > 0, t_hi, np.where(dp < 0, t_lo, np.inf))
        # dp == 0: inside iff lo <= pp <= hi, else reject
        flat_out = (dp == 0) & ((pp < lo) | (pp > hi))
        t0 = np.maximum(t0, np.where(flat_out, np.inf, enter))
        t1 = np.minimum(t1, np.where(flat_out, -np.inf, leave))
    ok = t0 <= t1
    pieces = []
    cur = None
    for i in np.flatnonzero(ok):
        a = p[i] + t0[i] * d[i]
        b = p[i] + t1[i] * d[i]
        if cur is not None and t0[i] == 0.0 and cur[-1][0] == a[0] \
                and cur[-1][1] == a[1]:
            cur.append(b)
        else:
            if cur is not None and len(cur) >= 2:
                pieces.append(np.asarray(cur))
            cur = [a, b]
    if cur is not None and len(cur) >= 2:
        pieces.append(np.asarray(cur))
    return pieces


def clip_ring(ring: np.ndarray, x0: float, y0: float, x1: float,
              y1: float) -> np.ndarray | None:
    """Closed ring (first != last needed; closure implied) ->
    clipped closed-implied ring, or None when nothing remains.
    Sutherland-Hodgman against the four rect half-planes, each pass
    vectorized (inside masks + crossing interpolation)."""
    out = np.asarray(ring, dtype=np.float64)
    #            axis, bound, keep-side-is-greater
    for axis, bound, keep_ge in ((0, x0, True), (0, x1, False),
                                 (1, y0, True), (1, y1, False)):
        if len(out) < 3:
            return None
        v = out[:, axis]
        inside = (v >= bound) if keep_ge else (v <= bound)
        if inside.all():
            continue
        if not inside.any():
            return None
        nxt = np.roll(np.arange(len(out)), -1)
        cross = inside != inside[nxt]
        # interpolated crossing point per crossing edge
        a = out
        b = out[nxt]
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (bound - a[:, axis]) / (b[:, axis] - a[:, axis])
        cpt = a + t[:, None] * (b - a)
        cpt[:, axis] = bound  # exact on the clip plane
        pieces = []
        for i in range(len(out)):
            if inside[i]:
                pieces.append(out[i])
            if cross[i]:
                pieces.append(cpt[i])
        out = np.asarray(pieces)
        # collapse immediate duplicates the interpolation can produce
        if len(out) >= 2:
            same = np.all(out == np.roll(out, 1, axis=0), axis=1)
            same[0] = np.all(out[0] == out[-1]) and len(out) > 1
            if same.any():
                out = out[~same]
    return out if len(out) >= 3 else None


def clip_parts(parts, mvt_type_point: bool, mvt_type_line: bool,
               x0: float, y0: float, x1: float, y1: float) -> list:
    """Geometry parts (list of (k, 2) arrays) -> clipped parts for one
    tile rect. Points filter; lines split into pieces; rings clip
    closed (dropped when nothing remains)."""
    out = []
    for part in parts:
        arr = np.asarray(part, dtype=np.float64)
        if mvt_type_point:
            keep = ((arr[:, 0] >= x0) & (arr[:, 0] <= x1)
                    & (arr[:, 1] >= y0) & (arr[:, 1] <= y1))
            if keep.any():
                out.append(arr[keep])
        elif mvt_type_line:
            out.extend(clip_line(arr, x0, y0, x1, y1))
        else:
            r = clip_ring(arr, x0, y0, x1, y1)
            if r is not None:
                out.append(r)
    return out
