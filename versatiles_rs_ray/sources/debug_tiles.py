"""Deterministic debug-tile sources (the from_debug analogue).

- json_debug_tiles: payload is a pure function of the coordinate
  (`{"x":x,"y":y,"z":z}`), mirroring the mock/debug readers
  (versatiles_pipeline/src/operations/read/from_debug/mod.rs:44-90,
  versatiles_container/src/container/mock/reader.rs). Used to verify
  filters / transforms / stacking without codecs — and it is fully
  SQL-expressible, so the driver oracle covers the whole source.
- gradient_tiles: RGBA gradient rasters (R=f(px_x), G=f(px_y)), the
  synthetic analogue of testdata/gradient.tif (FIXTURES.md F6) for
  raster op checks by exact pixels / average color.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.bbox import TileBBoxPyramid
from ..core.raster import RAW_FORMAT, from_array


def _pyramid_coords(pyramid: TileBBoxPyramid):
    zs, xs, ys = [], [], []
    for bb in pyramid.levels():
        x, y = bb.coords()
        zs.append(np.full(len(x), bb.level, dtype=np.int64))
        xs.append(x)
        ys.append(y)
    if not zs:
        return (np.empty(0, np.int64),) * 3
    return np.concatenate(zs), np.concatenate(xs), np.concatenate(ys)


def coords_table(pyramid: TileBBoxPyramid) -> pa.Table:
    z, x, y = _pyramid_coords(pyramid)
    return pa.table(
        {
            "z": pa.array(z, type=pa.int64()),
            "x": pa.array(x, type=pa.int64()),
            "y": pa.array(y, type=pa.int64()),
        }
    )


def add_json_payload(batch: pa.Table) -> pa.Table:
    """payload = '{"x":x,"y":y,"z":z}' (ascii bytes), cf. TileCoord::as_json
    ordering (tile_coord.rs:104-106)."""
    z = np.asarray(batch["z"], dtype=np.int64)
    x = np.asarray(batch["x"], dtype=np.int64)
    y = np.asarray(batch["y"], dtype=np.int64)
    payload = [
        f'{{"x":{xi},"y":{yi},"z":{zi}}}'.encode()
        for zi, xi, yi in zip(z.tolist(), x.tolist(), y.tolist())
    ]
    return batch.append_column("payload", pa.array(payload, type=pa.binary()))


def json_debug_tiles(pyramid: TileBBoxPyramid, override_num_blocks=None):
    """Dataset of (z, x, y, payload) debug tiles over a pyramid."""
    import ray.data as rd

    ds = rd.from_arrow(coords_table(pyramid))
    if override_num_blocks:
        ds = ds.repartition(override_num_blocks)
    return ds.map_batches(add_json_payload, batch_format="pyarrow")


def gradient_array(z: int, x: int, y: int, size: int = 64) -> np.ndarray:
    """Deterministic RGBA gradient: R ramps with pixel x, G with pixel
    y, B encodes the coordinate hash, fully opaque."""
    gx = np.linspace(0, 255, size, dtype=np.float64)
    arr = np.empty((size, size, 4), dtype=np.uint8)
    arr[..., 0] = np.round(gx)[None, :].astype(np.uint8)
    arr[..., 1] = np.round(gx)[:, None].astype(np.uint8)
    arr[..., 2] = (z * 37 + x * 17 + y * 11) % 256
    arr[..., 3] = 255
    return arr


def add_gradient_payload(batch: pa.Table, size: int = 64) -> pa.Table:
    z = np.asarray(batch["z"], dtype=np.int64)
    x = np.asarray(batch["x"], dtype=np.int64)
    y = np.asarray(batch["y"], dtype=np.int64)
    payload = [
        from_array(gradient_array(zi, xi, yi, size))
        for zi, xi, yi in zip(z.tolist(), x.tolist(), y.tolist())
    ]
    batch = batch.append_column("payload", pa.array(payload, type=pa.binary()))
    batch = batch.append_column("format", pa.array([RAW_FORMAT] * len(z)))
    batch = batch.append_column("width", pa.array(np.full(len(z), size), type=pa.int64()))
    return batch.append_column("height", pa.array(np.full(len(z), size), type=pa.int64()))


def gradient_tiles(pyramid: TileBBoxPyramid, size: int = 64, override_num_blocks=None):
    import ray.data as rd

    ds = rd.from_arrow(coords_table(pyramid))
    if override_num_blocks:
        ds = ds.repartition(override_num_blocks)
    return ds.map_batches(lambda t: add_gradient_payload(t, size), batch_format="pyarrow")
