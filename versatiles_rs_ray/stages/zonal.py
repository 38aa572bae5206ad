"""Zonal statistics — per-zone aggregation of raster tile pixels
(the gdal `zonal stats` shape: count/sum/min/max of the pixels whose
CENTERS fall inside each zone).

Zones are lon/lat rectangles or polygons; tiles are the engine's
standard raster rows (z, x, y, payload, width, height). Each tile
batch computes bounded per-(tile, zone) partials — real per-pixel
masking against the decoded payload — and one small ``groupby(zone)``
combine finishes the job, so the shuffle moves zones x touched tiles
rows, never pixels.

Geometry conventions shared with the rest of the engine:

- pixel (r, c) of tile (z, x, y) has mercator-fraction center
  ``((x + (c+0.5)/size) / 2^z, (y + (r+0.5)/size) / 2^z)``;
- rectangle zones are half-open ``[lo, hi)`` in mercator fractions
  (the RectJoin convention), evaluated as exact integer row/col
  ranges (``ceil((g - t) * size - 0.5)`` float chain, mirrored
  association-identically in the SQL oracle);
- polygon zones reuse the rasterizer's scanline even-odd fill
  (stages/rasterize.fill_rings) on the zone ring transformed into
  tile pixel coordinates — the same pixel-center crossing-parity
  convention as the PIP join.

Scale: the zone catalog lives in the callable (shipped once per task;
``ray.put`` + a lookup inside a custom callable for very large
catalogs — the PolygonJoin/STRtree pattern applies above ~10^4 zones).
Reference parity: the reference probes tile pyramids but has no
per-zone pixel aggregation (graft-new; gdal zonal-statistics shape).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.coords import mercator_fraction


def _decode(payload: bytes, fmt: str, w, h) -> np.ndarray:
    if fmt == "raw":
        from ..core.raster import to_array

        return to_array(payload, w, h)
    if fmt == "png":
        from ..core.png import decode_png_rgba

        return decode_png_rgba(payload)
    if fmt == "auto":  # sniff magic, any engine codec (container tiles)
        from ..core.formats import sniff_format
        from ..core.raster import decode

        arr = decode(payload, sniff_format(payload))
        if arr.ndim == 3 and arr.shape[2] == 3:
            arr = np.dstack([arr, np.full(arr.shape[:2], 255, np.uint8)])
        return arr
    raise ValueError(f"zonal_stats: unknown decoder {fmt!r}")


def _values(rgba: np.ndarray, band) -> np.ndarray:
    """Pixel value plane as int64: a raw channel, or Terrarium
    terrain-RGB elevation in EXACT 1/256-metre integer units
    (R*65536 + G*256 + B - 32768*256 — the stages/terrain encoding
    inverted without touching floats, so zone sums stay exact)."""
    if band == "terrarium":
        r = rgba[..., 0].astype(np.int64)
        g = rgba[..., 1].astype(np.int64)
        b = rgba[..., 2].astype(np.int64)
        return r * 65536 + g * 256 + b - 32768 * 256
    return rgba[..., band].astype(np.int64)


class ZonalStats:
    """map_batches callable: raster tiles -> per-(tile, zone) partial
    stats over one band. ``zones`` maps zone_id -> either a lon/lat
    rect (lon0, lat0, lon1, lat1) or a polygon ring
    [(lon, lat), ...] (>= 3 vertices)."""

    def __init__(self, zones: dict, band=2, decoder: str = "raw"):
        if band == "terrarium":
            pass  # Terrarium terrain-RGB elevation in exact 1/256 m
        elif not isinstance(band, (int, np.integer)) or band < 0 or band > 3:
            raise ValueError(
                f"zonal_stats: band must be 0..3 or 'terrarium', got {band}")
        if decoder not in ("raw", "png", "auto"):
            raise ValueError(f"zonal_stats: unknown decoder {decoder!r}")
        if not zones:
            raise ValueError("zonal_stats: zones must be non-empty")
        self.band = band if band == "terrarium" else int(band)
        self.decoder = decoder
        self.rects, self.polys = [], []
        for zid, zone in zones.items():
            arr = np.asarray(zone, dtype=np.float64)
            if arr.shape == (4,):
                mx0, my0 = mercator_fraction(arr[0], arr[3])  # lat1 = top
                mx1, my1 = mercator_fraction(arr[2], arr[1])
                self.rects.append((str(zid), float(mx0), float(my0),
                                   float(mx1), float(my1)))
            elif arr.ndim == 2 and arr.shape[1] == 2 and len(arr) >= 3:
                mx, my = mercator_fraction(arr[:, 0], arr[:, 1])
                self.polys.append((str(zid), np.stack([mx, my], axis=1)))
            else:
                raise ValueError(
                    f"zonal_stats: zone {zid!r} must be a (lon0, lat0, "
                    f"lon1, lat1) rect or a >=3-vertex lon/lat ring")

    @staticmethod
    def _span(g0: float, g1: float, t: int, size: int):
        """Half-open [g0, g1) mercator-fraction-times-2^z interval ->
        pixel index range [i0, i1) of tile coordinate ``t`` whose
        centers fall inside. The float chain is mirrored verbatim in
        the SQL oracle: i = ceil((g - t) * size - 0.5)."""
        i0 = int(np.ceil((g0 - t) * size - 0.5))
        i1 = int(np.ceil((g1 - t) * size - 0.5))
        return max(i0, 0), min(i1, size)

    def __call__(self, batch: pa.Table) -> pa.Table:
        zs = np.asarray(batch["z"], dtype=np.int64)
        xs = np.asarray(batch["x"], dtype=np.int64)
        ys = np.asarray(batch["y"], dtype=np.int64)
        has_wh = ("width" in batch.column_names
                  and "height" in batch.column_names)
        if not has_wh and self.decoder == "raw":
            raise ValueError(
                "zonal_stats: raw payloads need width/height columns")
        ws = (np.asarray(batch["width"], dtype=np.int64)
              if has_wh else None)
        hs = (np.asarray(batch["height"], dtype=np.int64)
              if has_wh else None)
        payloads = batch["payload"].to_pylist()
        out_zone, out_n, out_s, out_mn, out_mx = [], [], [], [], []
        for i in range(len(zs)):
            if has_wh:
                size = int(ws[i])
                if int(hs[i]) != size:
                    raise ValueError("zonal_stats: tiles must be square")
                vals = None  # decoded lazily: skip untouched tiles
            else:  # self-describing payload: decode for dimensions
                vals = _values(_decode(payloads[i], self.decoder,
                                       None, None), self.band)
                size = vals.shape[1]
                if vals.shape[0] != size:
                    raise ValueError("zonal_stats: tiles must be square")
            n_t = float(1 << int(zs[i]))
            for zid, mx0, my0, mx1, my1 in self.rects:
                c0, c1 = self._span(mx0 * n_t, mx1 * n_t, int(xs[i]), size)
                r0, r1 = self._span(my0 * n_t, my1 * n_t, int(ys[i]), size)
                if c0 >= c1 or r0 >= r1:
                    continue
                if vals is None:
                    vals = _values(_decode(payloads[i], self.decoder,
                                           size, size), self.band)
                v = vals[r0:r1, c0:c1]
                out_zone.append(zid)
                out_n.append(v.size)
                out_s.append(int(v.sum()))
                out_mn.append(int(v.min()))
                out_mx.append(int(v.max()))
            for zid, ring in self.polys:
                from .rasterize import fill_rings

                # ring in mercator fractions -> this tile's pixel units
                px = (ring[:, 0] * n_t - int(xs[i])) * size
                py = (ring[:, 1] * n_t - int(ys[i])) * size
                if px.max() < 0 or px.min() > size \
                        or py.max() < 0 or py.min() > size:
                    continue
                mask = np.zeros((size, size), dtype=bool)
                fill_rings(mask, [np.stack([px, py], axis=1)], size)
                if not mask.any():
                    continue
                if vals is None:
                    vals = _values(_decode(payloads[i], self.decoder,
                                           size, size), self.band)
                v = vals[mask]
                out_zone.append(zid)
                out_n.append(v.size)
                out_s.append(int(v.sum()))
                out_mn.append(int(v.min()))
                out_mx.append(int(v.max()))
        return pa.table({
            "zone": pa.array(out_zone, type=pa.string()),
            "n_px": pa.array(out_n, type=pa.int64()),
            "sum_val": pa.array(out_s, type=pa.int64()),
            "min_val": pa.array(out_mn, type=pa.int64()),
            "max_val": pa.array(out_mx, type=pa.int64()),
        })


def zonal_stats(tiles_ds, zones: dict, band: int = 2,
                decoder: str = "raw"):
    """Per-zone pixel statistics over a raster tile dataset:
    (zone, n_px, sum_val, min_val, max_val) — one output row per zone
    that covers at least one pixel center. Mean = sum_val / n_px on
    the consumer side (kept as exact integers here)."""
    from ray.data.aggregate import Max, Min, Sum

    partials = tiles_ds.map_batches(
        ZonalStats(zones, band=band, decoder=decoder),
        batch_format="pyarrow")
    return partials.groupby("zone").aggregate(
        Sum("n_px", alias_name="n_px"),
        Sum("sum_val", alias_name="sum_val"),
        Min("min_val", alias_name="min_val"),
        Max("max_val", alias_name="max_val"),
    )
