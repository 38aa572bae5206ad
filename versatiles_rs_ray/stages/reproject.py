"""Raster reprojection actor pool: WGS84 source raster -> mercator tiles.

The analogue of the reference's GDAL read path
(versatiles_pipeline/src/operations/read/from_gdal/raster/operation.rs:56-221,
raster_source.rs:36-152): a source raster in a geographic CRS is
window-reprojected into web-mercator tiles. GDAL itself is not in this
container, so the source is an in-memory RGBA array broadcast once via
``ray.put``; the per-tile inverse mapping (tile pixel -> lon/lat ->
source-SRS coords -> source pixel) is exact and vectorized.
:class:`WGS84Reprojector` is the fast plate-carree special case;
:class:`SRSReprojector` warps from ANY SRS registered in core/srs.py
(4326 / 3857 / UTM zones + GDAL-style geotransforms) with band
remapping and nearest/bilinear resampling — the arbitrary-SRS
capability the reference gets from GDAL.

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

# from_gdal default pool size (operation.rs:36-41); elastic (1, n) so a
# fixed reservation can never deadlock against in-teardown actors
DEFAULT_CONCURRENCY = (1, 4)
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


def _merc_axes(z: int, x: int, y: int, s: int):
    """(lon_1d, lat_1d) of a tile's pixel centers in WGS84 degrees."""
    n = float(1 << z)
    fx = (x + (np.arange(s) + 0.5) / s) / n
    fy = (y + (np.arange(s) + 0.5) / s) / n
    lon = (fx - 0.5) * 360.0
    lat = (np.arctan(np.exp(np.pi * (1.0 - 2.0 * fy))) / np.pi - 0.25) * 360.0
    return lon, lat


def _opaque(dtype) -> int:
    """Fully-opaque alpha for the sample dtype (255 for u8, dtype max
    for the 16-bit DEM case)."""
    return int(np.iinfo(dtype).max)


def _normalize_rgba(src: np.ndarray) -> np.ndarray:
    """Grey/L, RGB or RGBA -> contiguous RGBA (one gather downstream).
    dtype-preserving: uint8 imagery and uint16/int16 DEM rasters both
    flow through the same warp kernels."""
    if src.ndim == 2:
        src = src[:, :, None]
    c = src.shape[2]
    if c == 1:
        src = np.concatenate(
            [src] * 3 + [np.full(src.shape[:2] + (1,), _opaque(src.dtype), src.dtype)],
            axis=2)
    elif c == 3:
        src = np.concatenate(
            [src, np.full(src.shape[:2] + (1,), _opaque(src.dtype), src.dtype)], axis=2)
    elif c != 4:
        raise ValueError(f"unsupported channel count {c}")
    return np.ascontiguousarray(src)


class _ReprojectorBase:
    """Shared actor mechanics: recycle-after-N reloads and the
    per-batch payload table assembly (both pools emit the identical
    rgba-raw tile schema)."""

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


class WGS84Reprojector(_ReprojectorBase):
    """Actor: holds the source raster; reprojects (z, x, y) rows to
    raw-RGBA mercator tiles (plate-carree fast path)."""

    def __init__(self, source_ref, tile_size: int = 64, max_uses: int = DEFAULT_REUSE_LIMIT):
        self._source_ref = source_ref
        self.tile_size = tile_size
        self.max_uses = max_uses
        self._uses = 0
        self._load()

    def _load(self):
        import ray

        src = (
            ray.get(self._source_ref)
            if not isinstance(self._source_ref, np.ndarray)
            else self._source_ref
        )
        self.source = _normalize_rgba(src)
        self.h, self.w = self.source.shape[:2]

    def _reproject_one(self, z: int, x: int, y: int) -> np.ndarray:
        lon, lat = _merc_axes(z, x, y, self.tile_size)
        # source pixel indices (plate-carree: linear in lon/lat)
        sx = np.clip(((lon + 180.0) / 360.0 * self.w).astype(np.int64), 0, self.w - 1)
        sy = np.clip(((90.0 - lat) / 180.0 * self.h).astype(np.int64), 0, self.h - 1)
        return self.source[sy[:, None], sx[None, :]]


class SRSReprojector(_ReprojectorBase):
    """Actor: window-warps mercator tiles out of a source raster in
    ANY registered SRS (core/srs.py: 4326 / 3857 / UTM; extend there).

    The general analogue of the reference's GDAL warp
    (raster_source.rs:114-152): per output tile, pixel centers ->
    lon/lat -> source-SRS coords (srs.forward) -> source pixels
    (geotransform inverse) -> sample. ``band_mapping`` reorders source
    channels into RGBA slots exactly like the reference's
    BandMappingItem loop; ``resampling`` is "nearest" or "bilinear";
    pixels outside the source window come back transparent.
    """

    def __init__(self, source_ref, geotransform, epsg: int, tile_size: int = 64,
                 band_mapping=None, resampling: str = "nearest",
                 max_uses: int = DEFAULT_REUSE_LIMIT):
        from ..core import srs as _srs

        self._source_ref = source_ref
        self.gt = _srs.GeoTransform(geotransform) if not hasattr(geotransform, "crs_to_pixel") else geotransform
        self.srs = _srs.get_srs(epsg)
        self.tile_size = tile_size
        self.band_mapping = band_mapping
        self.resampling = resampling
        self.max_uses = max_uses
        self._uses = 0
        self._load()

    def _load(self):
        import ray

        src = (
            ray.get(self._source_ref)
            if not isinstance(self._source_ref, np.ndarray)
            else self._source_ref
        )
        if src.ndim == 2:
            src = src[:, :, None]
        if self.band_mapping is not None:
            src = src[:, :, list(self.band_mapping)]
        self.source = _normalize_rgba(src)
        self.h, self.w = self.source.shape[:2]
        if self.resampling == "average":
            # summed-area table, built once per actor: box means in O(1)
            # per dst pixel. 8B x 4 channels x (H+1)(W+1) — fine for the
            # GDAL-fixture scale; window the source at 100-TB scale.
            # int64 accumulator so signed (int16 DEM) sources sum right.
            sat_t = np.uint64 if self.source.dtype == np.uint8 else np.int64
            self._sat = np.zeros((self.h + 1, self.w + 1, 4), sat_t)
            np.cumsum(self.source, axis=0, dtype=sat_t,
                      out=self._sat[1:, 1:]).cumsum(axis=1, out=self._sat[1:, 1:])

    def _tile_lonlat(self, z: int, x: int, y: int):
        s = self.tile_size
        lon, lat = _merc_axes(z, x, y, s)
        return np.broadcast_to(lon[None, :], (s, s)), np.broadcast_to(lat[:, None], (s, s))

    def _reproject_average(self, z: int, x: int, y: int) -> np.ndarray:
        """GDAL's default warp resampling (GRA_Average — resample.rs:54:
        `Default for ResampleAlg` is `Average`): each dst pixel averages
        every source pixel whose center back-projects into the dst
        pixel's footprint; an empty footprint (upsampling) degrades to
        the single covering pixel, exactly GDAL's clamp."""
        s = self.tile_size
        n = float(1 << z)
        # dst pixel EDGES in mercator fractions -> lon/lat -> src coords
        fxe = (x + np.arange(s + 1) / s) / n
        fye = (y + np.arange(s + 1) / s) / n
        lon_e = (fxe - 0.5) * 360.0
        lat_e = (np.arctan(np.exp(np.pi * (1.0 - 2.0 * fye))) / np.pi - 0.25) * 360.0
        LON = np.broadcast_to(lon_e[None, :], (s + 1, s + 1))
        LAT = np.broadcast_to(lat_e[:, None], (s + 1, s + 1))
        sx, sy = self.srs.forward(LON.ravel(), LAT.ravel())
        col, row = self.gt.crs_to_pixel(sx, sy)
        col = col.reshape(s + 1, s + 1)
        row = row.reshape(s + 1, s + 1)
        # per-dst-pixel src bounding rect from its 4 corners (exact for
        # separable mappings, GDAL-style rect approximation otherwise)
        c_lo = np.minimum.reduce([col[:-1, :-1], col[:-1, 1:], col[1:, :-1], col[1:, 1:]])
        c_hi = np.maximum.reduce([col[:-1, :-1], col[:-1, 1:], col[1:, :-1], col[1:, 1:]])
        r_lo = np.minimum.reduce([row[:-1, :-1], row[:-1, 1:], row[1:, :-1], row[1:, 1:]])
        r_hi = np.maximum.reduce([row[:-1, :-1], row[:-1, 1:], row[1:, :-1], row[1:, 1:]])
        # src pixels with centers inside [lo, hi): c0 inclusive, c1 exclusive
        c0 = np.ceil(c_lo - 0.5).astype(np.int64)
        c1 = np.ceil(c_hi - 0.5).astype(np.int64)
        r0 = np.ceil(r_lo - 0.5).astype(np.int64)
        r1 = np.ceil(r_hi - 0.5).astype(np.int64)
        # empty range (dst finer than src): clamp to the single pixel
        # under the footprint midpoint
        cmid = np.floor((c_lo + c_hi) * 0.5).astype(np.int64)
        rmid = np.floor((r_lo + r_hi) * 0.5).astype(np.int64)
        empty_c = c1 <= c0
        empty_r = r1 <= r0
        c0 = np.where(empty_c, cmid, c0)
        c1 = np.where(empty_c, cmid + 1, c1)
        r0 = np.where(empty_r, rmid, r0)
        r1 = np.where(empty_r, rmid + 1, r1)
        # clip to source bounds; dst pixels with nothing under them stay
        # transparent (outside source coverage)
        c0c = np.clip(c0, 0, self.w)
        c1c = np.clip(c1, 0, self.w)
        r0c = np.clip(r0, 0, self.h)
        r1c = np.clip(r1, 0, self.h)
        cnt = (c1c - c0c) * (r1c - r0c)
        ok = cnt > 0
        sat = self._sat
        tot = (sat[r1c, c1c] - sat[r0c, c1c] - sat[r1c, c0c] + sat[r0c, c0c]).astype(np.float64)
        mean = tot / np.maximum(cnt, 1)[..., None]
        dt = self.source.dtype
        info = np.iinfo(dt)
        out = np.zeros((s, s, 4), dtype=dt)
        out[ok] = np.clip(np.rint(mean[ok]), info.min, info.max).astype(dt)
        return out

    def _reproject_one(self, z: int, x: int, y: int) -> np.ndarray:
        if self.resampling == "average":
            return self._reproject_average(z, x, y)
        lon, lat = self._tile_lonlat(z, x, y)
        sx, sy = self.srs.forward(lon.ravel(), lat.ravel())
        col, row = self.gt.crs_to_pixel(sx, sy)
        s = self.tile_size
        dt = self.source.dtype
        info = np.iinfo(dt)
        out = np.zeros((s * s, 4), dtype=dt)
        if self.resampling == "bilinear":
            cf, rf = col - 0.5, row - 0.5
            c0, r0 = np.floor(cf).astype(np.int64), np.floor(rf).astype(np.int64)
            wc, wr = cf - c0, rf - r0
            ok = (c0 >= -1) & (c0 < self.w) & (r0 >= -1) & (r0 < self.h)
            c0c = np.clip(c0, 0, self.w - 1)
            c1c = np.clip(c0 + 1, 0, self.w - 1)
            r0c = np.clip(r0, 0, self.h - 1)
            r1c = np.clip(r0 + 1, 0, self.h - 1)
            # gather uint8 corners FIRST, convert only the gathered
            # (s*s, 4) pixels — converting the whole source per tile
            # is O(source) work per tile
            p00 = self.source[r0c, c0c].astype(np.float64)
            p01 = self.source[r0c, c1c].astype(np.float64)
            p10 = self.source[r1c, c0c].astype(np.float64)
            p11 = self.source[r1c, c1c].astype(np.float64)
            top = p00 * (1 - wc)[:, None] + p01 * wc[:, None]
            bot = p10 * (1 - wc)[:, None] + p11 * wc[:, None]
            val = top * (1 - wr)[:, None] + bot * wr[:, None]
            out[ok] = np.clip(np.rint(val[ok]), info.min, info.max).astype(dt)
        else:
            ci, ri = np.floor(col).astype(np.int64), np.floor(row).astype(np.int64)
            ok = (ci >= 0) & (ci < self.w) & (ri >= 0) & (ri < self.h)
            out[ok] = self.source[ri[ok], ci[ok]]
        return out.reshape(s, s, 4)


def reproject_srs_raster(coords_ds, source: np.ndarray, geotransform, epsg: int,
                         tile_size=64, band_mapping=None, resampling="nearest",
                         concurrency=DEFAULT_CONCURRENCY, batch_size=256):
    """(z, x, y) Dataset -> mercator raster tiles warped from a source
    raster in any registered SRS. Source broadcast once via ray.put
    (read once per actor, never per batch)."""
    import ray

    ref = ray.put(source)
    return coords_ds.map_batches(
        SRSReprojector,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={
            "source_ref": ref,
            "geotransform": geotransform,
            "epsg": epsg,
            "tile_size": tile_size,
            "band_mapping": band_mapping,
            "resampling": resampling,
        },
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
