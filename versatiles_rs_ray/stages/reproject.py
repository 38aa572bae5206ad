"""Raster reprojection actor pool: WGS84 source raster -> mercator tiles.

The analogue of the reference's GDAL read path
(versatiles_pipeline/src/operations/read/from_gdal/raster/operation.rs:56-221,
raster_source.rs:36-152): a source raster in a geographic CRS is
window-reprojected into web-mercator tiles. GDAL itself is not in this
container, so the source here is an in-memory WGS84 (plate-carree)
RGBA array broadcast once via ``ray.put``; the per-tile inverse
mapping (tile pixel -> lon/lat -> source pixel) is exact and
vectorized, sampling is nearest-neighbor (resampler pluggable).

Pool mechanics mirror the reference: a callable-class actor pool
(concurrency = the reference's `concurrency_limit` semaphore, default
4) and `max_uses` recycling (reference recycles GDAL datasets after
`reuse_limit`=100 uses to contain leaks — raster_source.rs:94-101);
here recycling re-fetches the broadcast source, a no-op semantically
but it keeps the lifecycle contract visible.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..core.raster import RAW_FORMAT, from_array

DEFAULT_CONCURRENCY = 4  # from_gdal default (operation.rs:36-41)
DEFAULT_REUSE_LIMIT = 100


def max_zoom_for_source(source_width: int, tile_size: int) -> int:
    """Max zoom where tile resolution ~ source resolution:
    ``ceil(log2(W / S))`` — the engine analogue of the reference's
    ``z = ceil(log2(initial_res / px_size))`` (raster_source.rs:190-205).
    """
    return max(0, math.ceil(math.log2(source_width / tile_size)))


def make_world_raster(height: int = 512) -> np.ndarray:
    """Synthetic global WGS84 raster (FIXTURES.md F6 style gradients):
    R ramps with longitude, G with latitude, opaque."""
    width = height * 2
    arr = np.empty((height, width, 4), dtype=np.uint8)
    arr[..., 0] = np.round(np.linspace(0, 255, width))[None, :].astype(np.uint8)
    arr[..., 1] = np.round(np.linspace(0, 255, height))[:, None].astype(np.uint8)
    arr[..., 2] = 128
    arr[..., 3] = 255
    return arr


class WGS84Reprojector:
    """Actor: holds the source raster; reprojects (z, x, y) rows to
    raw-RGBA mercator tiles."""

    def __init__(self, source_ref, tile_size: int = 64, max_uses: int = DEFAULT_REUSE_LIMIT):
        self._source_ref = source_ref
        self.tile_size = tile_size
        self.max_uses = max_uses
        self._uses = 0
        self._load()

    def _load(self):
        import ray

        self.source = (
            ray.get(self._source_ref)
            if not isinstance(self._source_ref, np.ndarray)
            else self._source_ref
        )
        self.h, self.w = self.source.shape[:2]

    def _reproject_one(self, z: int, x: int, y: int) -> np.ndarray:
        s = self.tile_size
        n = float(1 << z)
        # output pixel centers in mercator fractions
        fx = (x + (np.arange(s) + 0.5) / s) / n
        fy = (y + (np.arange(s) + 0.5) / s) / n
        lon = (fx - 0.5) * 360.0
        lat = (np.arctan(np.exp(np.pi * (1.0 - 2.0 * fy))) / np.pi - 0.25) * 360.0
        # source pixel indices (plate-carree: linear in lon/lat)
        sx = np.clip(((lon + 180.0) / 360.0 * self.w).astype(np.int64), 0, self.w - 1)
        sy = np.clip(((90.0 - lat) / 180.0 * self.h).astype(np.int64), 0, self.h - 1)
        return self.source[sy[:, None], sx[None, :]]

    def __call__(self, batch: pa.Table) -> pa.Table:
        self._uses += 1
        if self._uses > self.max_uses:
            self._load()
            self._uses = 1
        z = np.asarray(batch["z"], dtype=np.int64)
        x = np.asarray(batch["x"], dtype=np.int64)
        y = np.asarray(batch["y"], dtype=np.int64)
        payloads = [
            from_array(self._reproject_one(int(zi), int(xi), int(yi)))
            for zi, xi, yi in zip(z, x, y)
        ]
        s = self.tile_size
        return pa.table(
            {
                "z": batch["z"],
                "x": batch["x"],
                "y": batch["y"],
                "payload": pa.array(payloads, type=pa.binary()),
                "format": pa.array([RAW_FORMAT] * len(z)),
                "width": pa.array(np.full(len(z), s), type=pa.int64()),
                "height": pa.array(np.full(len(z), s), type=pa.int64()),
            }
        )


def reproject_raster(coords_ds, source: np.ndarray, tile_size=64,
                     concurrency=DEFAULT_CONCURRENCY, batch_size=256):
    """(z, x, y) Dataset -> mercator raster tiles from a WGS84 source.

    Broadcast the source once; pool size mirrors the reference's
    4-instance GDAL pool.
    """
    import ray

    ref = ray.put(source)
    return coords_ds.map_batches(
        WGS84Reprojector,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"source_ref": ref, "tile_size": tile_size},
    )
