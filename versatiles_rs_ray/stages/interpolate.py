"""Radius-bounded IDW gridding — sparse point observations -> a
regular raster grid (the ``gdal_grid`` / QGIS "IDW interpolation"
operation, equirectangular variant) as one grid-bucketed exchange.

Kernel contract (exact, order-independent, SQL-mirrorable):

    d2   = (px - cx)^2 + (py - cy)^2          # 3 IEEE float64 ops
    d2_q = floor(d2 * 1e9)                    # int64 quantization
    w    = SCALE // (1 + d2_q)                # pure integer division
    pixel value = (sum(w * v) * 1e6) // sum(w)  over points with
                  d2 <= radius^2

i.e. inverse-distance-squared weighting with the distance quantized to
integer BEFORE the weight division, so every (pixel, point) term is a
deterministic int64 and the per-pixel sums commute — the engine's
standard quantization contract (lm/pmi/textrank), which makes the
whole raster bit-exact against a DuckDB GROUP BY. No transcendentals
anywhere (the grid lives in lon/lat degree space), so there is no
libm-parity risk; pixel centers are x0 + (gx + 0.5) * dx with dx a
shared float64 literal.

Distribution: pixels are grouped into TILE x TILE blocks; each point
ships once per grid block whose extent, expanded by ``radius``,
contains it (bounded replication, the DBSCAN/rect-join grid shape) —
one hash exchange, then each block computes its (pixels x points)
terms vectorized (point side chunked to bound the mask matrix) and
reduces with np.add.at. Output rows exist only for pixels with at
least one in-radius point (den > 0), matching the SQL GROUP BY.

Overflow: w <= SCALE = 1e12 and |v| < 2^22 keeps w*v < 2^62 per term;
per-pixel int64 sums are (heuristically) checked and raise loudly
rather than wrap silently.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

SCALE = 10 ** 12
D2_QUANT = 1e9
VAL_MICRO = 10 ** 6
TILE = 8  # pixels per grid block side (the exchange granularity)


def _empty_out() -> pa.Table:
    return pa.table({
        "gx": pa.array([], type=pa.int64()),
        "gy": pa.array([], type=pa.int64()),
        "den": pa.array([], type=pa.int64()),
        "num": pa.array([], type=pa.int64()),
        "value_micro": pa.array([], type=pa.int64()),
    })


def _point_rows(batch: pa.Table, grid: dict, radius: float,
                value_col: str) -> pa.Table:
    """Replicate each point to every TILE-block whose extent expanded
    by ``radius`` contains it (ragged cross product, vectorized)."""
    x = np.asarray(batch["lon"], dtype=np.float64)
    y = np.asarray(batch["lat"], dtype=np.float64)
    v = np.asarray(batch[value_col], dtype=np.int64)
    if len(v) and (v.min() < 0 or v.max() >= (1 << 22)):
        raise OverflowError("idw_grid: values must be in [0, 2^22) to "
                            "keep SCALE * v terms inside int64 and "
                            "floor == truncate in every division")
    x0, y0, dx, dy, nx, ny = (grid["x0"], grid["y0"], grid["dx"],
                              grid["dy"], grid["nx"], grid["ny"])
    ntx = -(-nx // TILE)
    nty = -(-ny // TILE)
    bw, bh = dx * TILE, dy * TILE
    # block bx covers pixel centers in [x0 + bx*bw + dx/2, ...]; a point
    # influences the block iff its radius disc's bbox overlaps the
    # block's center extent (conservative: bbox test, exact d2 test in
    # the combine)
    bx0 = np.clip(np.floor((x - radius - x0) / bw), 0, ntx - 1).astype(np.int64)
    bx1 = np.clip(np.floor((x + radius - x0) / bw), 0, ntx - 1).astype(np.int64)
    by0 = np.clip(np.floor((y - radius - y0) / bh), 0, nty - 1).astype(np.int64)
    by1 = np.clip(np.floor((y + radius - y0) / bh), 0, nty - 1).astype(np.int64)
    nbx = bx1 - bx0 + 1
    nby = by1 - by0 + 1
    total = nbx * nby
    tot = int(total.sum())
    pt = np.repeat(np.arange(len(x), dtype=np.int64), total)
    starts = np.concatenate(([0], np.cumsum(total)[:-1]))
    pos = np.arange(tot, dtype=np.int64) - np.repeat(starts, total)
    nby_r = np.repeat(nby, total)
    bx = np.repeat(bx0, total) + pos // np.maximum(nby_r, 1)
    by = np.repeat(by0, total) + pos % np.maximum(nby_r, 1)
    return pa.table({
        "bkey": pa.array(bx * nty + by, type=pa.int64()),
        "x": pa.array(x[pt], type=pa.float64()),
        "y": pa.array(y[pt], type=pa.float64()),
        "v": pa.array(v[pt], type=pa.int64()),
    })


_PT_CHUNK = 4096


def _block_combine(table: pa.Table, grid: dict, radius: float) -> pa.Table:
    """Per partition: for each grid block, the (pixels x points) term
    matrix reduced to per-pixel (den, num) int64 sums."""
    if table.num_rows == 0:
        return _empty_out()
    x0, y0, dx, dy, nx, ny = (grid["x0"], grid["y0"], grid["dx"],
                              grid["dy"], grid["nx"], grid["ny"])
    nty = -(-ny // TILE)
    r2 = radius * radius
    bkey = np.asarray(table["bkey"], dtype=np.int64)
    px = np.asarray(table["x"], dtype=np.float64)
    py = np.asarray(table["y"], dtype=np.float64)
    pv = np.asarray(table["v"], dtype=np.int64)
    order = np.argsort(bkey, kind="stable")
    bkey, px, py, pv = bkey[order], px[order], py[order], pv[order]
    starts = np.flatnonzero(np.r_[True, bkey[1:] != bkey[:-1]])
    ends = np.r_[starts[1:], len(bkey)]
    out_gx, out_gy, out_den, out_num = [], [], [], []
    for s, e in zip(starts, ends):
        bx, by = divmod(int(bkey[s]), nty)
        gxs = np.arange(bx * TILE, min((bx + 1) * TILE, nx), dtype=np.int64)
        gys = np.arange(by * TILE, min((by + 1) * TILE, ny), dtype=np.int64)
        cx = x0 + (gxs + 0.5) * dx
        cy = y0 + (gys + 0.5) * dy
        npx, npy = len(gxs), len(gys)
        den = np.zeros((npx, npy), dtype=np.int64)
        num = np.zeros((npx, npy), dtype=np.int64)
        for c0 in range(s, e, _PT_CHUNK):
            c1 = min(c0 + _PT_CHUNK, e)
            ddx = px[c0:c1, None] - cx[None, :]          # (P, npx)
            ddy = py[c0:c1, None] - cy[None, :]          # (P, npy)
            d2 = (ddx * ddx)[:, :, None] + (ddy * ddy)[:, None, :]
            mask = d2 <= r2
            d2q = np.floor(d2 * D2_QUANT).astype(np.int64)
            w = np.where(mask, SCALE // (1 + np.maximum(d2q, 0)), 0)
            den += w.sum(axis=0)
            num += (w * pv[c0:c1, None, None]).sum(axis=0)
        hit = den > 0
        if (den[hit] < 0).any() or (num[hit] < 0).any() \
                or num[hit].max(initial=0) >= (1 << 62) \
                or den[hit].max(initial=0) >= (1 << 63) // VAL_MICRO:
            raise OverflowError("idw_grid: per-pixel int64 sum overflow — "
                                "reduce SCALE or point density per pixel")
        gxm, gym = np.meshgrid(gxs, gys, indexing="ij")
        out_gx.append(gxm[hit])
        out_gy.append(gym[hit])
        out_den.append(den[hit])
        out_num.append(num[hit])
    gx = np.concatenate(out_gx) if out_gx else np.zeros(0, dtype=np.int64)
    gy = np.concatenate(out_gy) if out_gy else np.zeros(0, dtype=np.int64)
    den = np.concatenate(out_den) if out_den else np.zeros(0, dtype=np.int64)
    num = np.concatenate(out_num) if out_num else np.zeros(0, dtype=np.int64)
    if len(den):
        # (num * 1e6) // den without leaving int64: split the quotient
        # (q < 2^22 since it's a weighted mean of the values; r < den,
        # and den * 1e6 < 2^63 is guarded above)
        q, r = np.divmod(num, den)
        vm = q * VAL_MICRO + (r * VAL_MICRO) // den
    else:
        vm = num
    return pa.table({
        "gx": pa.array(gx, type=pa.int64()),
        "gy": pa.array(gy, type=pa.int64()),
        "den": pa.array(den, type=pa.int64()),
        "num": pa.array(num, type=pa.int64()),
        "value_micro": pa.array(vm, type=pa.int64()),
    })


def idw_grid(pts_ds, value_col: str, bbox: tuple, nx: int, ny: int,
             radius: float, num_partitions: int = 32):
    """IDW-interpolated grid over ``bbox`` = (x0, y0, x1, y1): Dataset
    of (gx, gy, den, num, value_micro) rows for every pixel with at
    least one point within ``radius`` (see module docstring for the
    exact kernel). Input columns: lon, lat, ``value_col`` (int)."""
    from .exchange import hash_exchange

    if nx < 1 or ny < 1:
        raise ValueError("idw_grid: nx/ny must be >= 1")
    if not (radius > 0):
        raise ValueError("idw_grid: radius must be > 0")
    x0, y0, x1, y1 = (float(c) for c in bbox)
    if not (x1 > x0 and y1 > y0):
        raise ValueError("idw_grid: bbox must be non-degenerate")
    grid = {"x0": x0, "y0": y0, "dx": (x1 - x0) / nx, "dy": (y1 - y0) / ny,
            "nx": int(nx), "ny": int(ny)}
    rows = pts_ds.map_batches(
        functools.partial(_point_rows, grid=grid, radius=float(radius),
                          value_col=value_col),
        batch_format="pyarrow")
    return hash_exchange(
        rows, "bkey",
        functools.partial(_block_combine, grid=grid, radius=float(radius)),
        num_partitions=num_partitions)
