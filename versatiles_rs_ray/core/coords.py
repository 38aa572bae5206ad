"""Vectorized web-mercator tile coordinate kernels.

Pure numpy over flat arrays — no Ray imports here. These are the
building blocks every `map_batches` stage uses on Arrow columns.

Semantics replicate the reference engine exactly (goldens in
tests/test_coords.py):

- geo -> tile:  versatiles_core/src/types/tile_coord.rs:64-80
- tile -> geo:  versatiles_core/src/types/tile_coord.rs:82-88
- sort index:   versatiles_core/src/types/tile_coord.rs:110-114
- Hilbert:      versatiles_core/src/utils/tile_hilbert_index.rs:81-175
- flip/swap:    versatiles_core/src/types/tile_coord.rs:179-184

All functions accept scalars or numpy arrays and broadcast; tile
coordinates are int64 throughout (z <= 31 so everything fits and
signed ints keep SQL/DuckDB parity trivial).
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 31
# Valid web-mercator latitude range (same constant the reference prints
# in TileJSON bounds, e.g. filter.rs test: [-180, -85.051129, 180, 85.051129]).
MERCATOR_LAT_MAX = 85.05112877980659


def _as_i64(a):
    return np.asarray(a, dtype=np.int64)


def lonlat_to_tile(lon, lat, z):
    """(lon, lat) degrees -> (x, y) tile indices at zoom ``z``.

    Mirrors ``TileCoord::from_geo`` (tile_coord.rs:64-80):
    ``x = 2^z * (lon/360 + 0.5)``,
    ``y = 2^z * (0.5 - 0.5*ln(tan(lat*pi/360 + pi/4))/pi)``,
    both clamped to ``[0, 2^z - 1]`` and floored.
    """
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    zoom = np.float64(2.0) ** np.asarray(z, dtype=np.float64)
    fx = zoom * (lon / 360.0 + 0.5)
    fy = zoom * (0.5 - 0.5 * np.log(np.tan(lat * np.pi / 360.0 + np.pi / 4.0)) / np.pi)
    hi = zoom - 1.0
    x = np.floor(np.clip(fx, 0.0, hi)).astype(np.int64)
    y = np.floor(np.clip(fy, 0.0, hi)).astype(np.int64)
    return x, y


def mercator_fraction(lon, lat):
    """(lon, lat) -> (mx, my) in [0, 1): position in the mercator unit square.

    ``tile_x = floor(mx * 2^z)`` — the zoom-independent form of
    ``TileCoord::from_geo``. Used by the rect-join (point-in-polygon)
    operators so edge semantics are half-open in mercator space.
    """
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    mx = lon / 360.0 + 0.5
    my = 0.5 - 0.5 * np.log(np.tan(lat * np.pi / 360.0 + np.pi / 4.0)) / np.pi
    return mx, my


def tile_to_lonlat(z, x, y):
    """Tile corner (north-west) -> (lon, lat) degrees.

    Mirrors ``TileCoord::coord_to_geo`` (tile_coord.rs:82-88):
    ``lon = (x/2^z - 0.5) * 360``,
    ``lat = (atan(exp(pi*(1 - 2y/2^z)))/pi - 0.25) * 360``.
    """
    zoom = np.float64(2.0) ** np.asarray(z, dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = (x / zoom - 0.5) * 360.0
    lat = (np.arctan(np.exp(np.pi * (1.0 - 2.0 * y / zoom))) / np.pi - 0.25) * 360.0
    return lon, lat


def tile_geo_bbox(z, x, y):
    """Tile -> geographic bbox [west, south, east, north].

    Matches ``TileCoord::to_geo_bbox`` golden (tile_coord.rs:245-248).
    """
    west, north = tile_to_lonlat(z, x, y)
    east, south = tile_to_lonlat(z, _as_i64(x) + 1, _as_i64(y) + 1)
    return west, south, east, north


def sort_index(z, x, y):
    """Linear sort index: level offset + row-major position.

    ``offset = (4^z - 1)/3; idx = offset + 2^z * y + x``
    (tile_coord.rs:110-114; golden: (5,3,4) -> 472).
    """
    z = _as_i64(z)
    size = np.int64(1) << z
    offset = (size * size - 1) // 3
    return offset + size * _as_i64(y) + _as_i64(x)


def hilbert_index(z, x, y):
    """Level-offset Hilbert index, matching the reference exactly.

    Port of the *semantics* of ``coord_to_index``
    (tile_hilbert_index.rs:81-113): lower zooms occupy the lower part
    of the 64-bit range (offset = (4^z-1)/3), then the classic Hilbert
    d-value of (x, y) within the 2^z grid. Vectorized over rows with a
    python loop only over the <=31 bit positions.

    Goldens: (1,1,z=1)->3, (2,2,z=2)->13, (5,3,z=3)->73, (7,7,z=3)->63,
    (0,0,z=31)->1537228672809129301.
    """
    z_arr = _as_i64(z)
    x = _as_i64(x).copy()
    y = _as_i64(y).copy()
    scalar = x.ndim == 0 and y.ndim == 0 and z_arr.ndim == 0
    x, y, z_arr = np.atleast_1d(x, y, z_arr)
    x, y, z_arr = np.broadcast_arrays(x, y, z_arr)
    x = x.copy()
    y = y.copy()

    size = np.int64(1) << z_arr
    acc = (size * size - 1) // 3
    d = np.zeros_like(x)
    max_z = int(z_arr.max()) if z_arr.size else 0
    for shift in range(max_z - 1, -1, -1):
        s = np.int64(1) << shift
        active = z_arr > shift  # this bit participates only when s < 2^z
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d = np.where(active, d + s * s * ((3 * rx) ^ ry), d)
        # rotate (tile_hilbert_index.rs:124-132)
        refl = active & (ry == 0) & (rx == 1)
        x = np.where(refl, s - 1 - x, x)
        y = np.where(refl, s - 1 - y, y)
        swap = active & (ry == 0)
        x2 = np.where(swap, y, x)
        y2 = np.where(swap, x, y)
        x, y = x2, y2
    out = acc + d
    return out[0] if scalar else out


def hilbert_to_coord(index):
    """Inverse of :func:`hilbert_index` (tile_hilbert_index.rs:144-175)."""
    index = int(index)
    acc = 0
    for t_z in range(32):
        num_tiles = (1 << t_z) * (1 << t_z)
        if acc + num_tiles > index:
            n = 1 << t_z
            t = index - acc
            tx = ty = 0
            s = 1
            while s < n:
                rx = (t // 2) & 1
                ry = (t ^ rx) & 1
                if ry == 0:
                    if rx == 1:
                        tx = s - 1 - tx
                        ty = s - 1 - ty
                    tx, ty = ty, tx
                if rx == 1:
                    tx += s
                if ry == 1:
                    ty += s
                t //= 4
                s *= 2
            return t_z, tx, ty
        acc += num_tiles
    raise ValueError("tile zoom exceeds 64-bit limit")


def flip_y(z, y):
    """XYZ <-> TMS y flip: ``y' = 2^z - 1 - y`` (tile_coord.rs:179-181)."""
    z = _as_i64(z)
    return (np.int64(1) << z) - 1 - _as_i64(y)


def parent_tile(x, y, levels=1):
    """(x, y) at z -> ancestor at z-levels (tile_coord.rs:185-188)."""
    return _as_i64(x) >> levels, _as_i64(y) >> levels


def pack_pk(z, x, y, block_bits):
    """Partition key: z and the block-grid cell, packed into one int64.

    ``pk = (z << 58) | ((x >> block_bits) << 29) | (y >> block_bits)``.
    The analogue of the reference's ``iter_bbox_grid`` partitioning
    (tile_bbox/iter.rs:63-90; 256x256 blocks at the versatiles writer,
    versatiles/writer.rs:165 -> block_bits=8).
    """
    z = _as_i64(z)
    bx = _as_i64(x) >> block_bits
    by = _as_i64(y) >> block_bits
    return (z << np.int64(58)) | (bx << np.int64(29)) | by


_M16 = np.uint64(0x0000FFFF0000FFFF)
_M8 = np.uint64(0x00FF00FF00FF00FF)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_M2 = np.uint64(0x3333333333333333)
_M1 = np.uint64(0x5555555555555555)


def _spread_bits(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of v into the even bit positions."""
    v = v.astype(np.uint64)
    v = (v | (v << np.uint64(16))) & _M16
    v = (v | (v << np.uint64(8))) & _M8
    v = (v | (v << np.uint64(4))) & _M4
    v = (v | (v << np.uint64(2))) & _M2
    v = (v | (v << np.uint64(1))) & _M1
    return v


def _compact_bits(v: np.ndarray) -> np.ndarray:
    """Inverse of _spread_bits (keep even bit positions)."""
    v = v.astype(np.uint64) & _M1
    v = (v | (v >> np.uint64(1))) & _M2
    v = (v | (v >> np.uint64(2))) & _M4
    v = (v | (v >> np.uint64(4))) & _M8
    v = (v | (v >> np.uint64(8))) & _M16
    v = (v | (v >> np.uint64(16))) & np.uint64(0xFFFFFFFF)
    return v


def morton_key(x, y):
    """Z-order (Morton) interleave: x bits odd, y bits even.

    The crucial property for pyramid aggregation: the parent tile's
    morton key is ``key >> 2``, so an array sorted by child keys stays
    sorted at every ancestor level — one sort serves the whole rollup
    (the quadtree DepthFirst ordering of traversal/order.rs:17-38 as a
    key, not a traversal).
    """
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    return ((_spread_bits(x) << np.uint64(1)) | _spread_bits(y)).astype(np.int64)


def morton_to_xy(key):
    key = np.asarray(key, dtype=np.int64).astype(np.uint64)
    x = _compact_bits(key >> np.uint64(1))
    y = _compact_bits(key)
    return x.astype(np.int64), y.astype(np.int64)


def quadkey(z, x, y):
    """Bing-style quadkey strings (z interleaved bits), mostly for debugging."""
    z = np.atleast_1d(_as_i64(z))
    x = np.atleast_1d(_as_i64(x))
    y = np.atleast_1d(_as_i64(y))
    x, y, z = np.broadcast_arrays(x, y, z)
    out = []
    for zi, xi, yi in zip(z.tolist(), x.tolist(), y.tolist()):
        s = []
        for bit in range(zi, 0, -1):
            digit = ((xi >> (bit - 1)) & 1) | (((yi >> (bit - 1)) & 1) << 1)
            s.append(str(digit))
        out.append("".join(s))
    return np.asarray(out, dtype=object)
