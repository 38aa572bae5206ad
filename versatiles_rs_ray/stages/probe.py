"""Introspection operators: pyramid inference, tile-size histogram,
coverage outline.

Reformulations of `versatiles probe` / `dev measure-tile-sizes` /
`dev export-outline` (SURVEY.md §3.3 minor entries):
- infer_pyramid: per-level min/max x/y + count, the mbtiles reader's
  pyramid scan (mbtiles/reader.rs doc, SURVEY.md §2.7 global agg);
- tile_size_histogram: sum payload bytes into a scaled grid
  (dev_tools/measure_tile_sizes.rs:57-90);
- coverage_outline: union of tile footprints as rectilinear rings
  (tile_outline/mod.rs:14-75) via row-run merging — no geometry libs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.compression import byte_sizes


def infer_pyramid(tiles_ds):
    """Per-level bbox + tile count: (z, x_min, x_max, y_min, y_max, n_tiles)."""
    from ray.data.aggregate import Count, Max, Min

    return tiles_ds.groupby("z").aggregate(
        Min("x", alias_name="x_min"),
        Max("x", alias_name="x_max"),
        Min("y", alias_name="y_min"),
        Max("y", alias_name="y_max"),
        Count(alias_name="n_tiles"),
    )


def tile_size_histogram(tiles_ds, scale_level: int, payload_col="payload"):
    """Sum payload bytes per scaled tile cell.

    Mirrors measure-tile-sizes: every tile's byte size is added to the
    cell ``(x >> s, y >> s)`` at the probe level
    (measure_tile_sizes.rs:57-90). Partial per batch + small groupby.
    """
    from ray.data.aggregate import Count, Sum

    def partial(batch: pa.Table) -> pa.Table:
        z = np.asarray(batch["z"], dtype=np.int64)
        shift = np.maximum(z - scale_level, 0)
        cx = np.asarray(batch["x"], dtype=np.int64) >> shift
        cy = np.asarray(batch["y"], dtype=np.int64) >> shift
        sizes = byte_sizes(batch[payload_col])
        key = (z << 40) | (cx << 20) | cy
        uniq, inv = np.unique(key, return_inverse=True)
        return pa.table(
            {
                "z": pa.array(uniq >> 40, type=pa.int64()),
                "cell_x": pa.array((uniq >> 20) & ((1 << 20) - 1), type=pa.int64()),
                "cell_y": pa.array(uniq & ((1 << 20) - 1), type=pa.int64()),
                "n_tiles": pa.array(np.bincount(inv), type=pa.int64()),
                "sum_bytes": pa.array(
                    np.bincount(inv, weights=sizes).astype(np.int64), type=pa.int64()
                ),
            }
        )

    partials = tiles_ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(["z", "cell_x", "cell_y"]).aggregate(
        Sum("n_tiles", alias_name="n_tiles"), Sum("sum_bytes", alias_name="sum_bytes")
    )


def measure_tile_sizes_image(tiles_ds, level: int = 14, scale: int = 4,
                             payload_col="payload") -> bytes:
    """Render the reference's tile-size visualization as a grayscale
    PNG: scan ONE zoom level, sum stored byte sizes into
    ``(x // scale, y // scale)`` cells, pixel brightness =
    ``clamp(10 * log2(max(mean_bytes, 1)), 0, 255)``
    (dev_tools/measure_tile_sizes.rs:36-93: 0 -> <=1 B, 100 -> ~1 KB,
    200 -> ~1 MB). Returns encoded PNG bytes.

    The per-batch partial dedups cells before anything leaves the
    task; the driver accumulates the (at most ``W**2``-cell) partial
    stream into the dense grid exactly like the reference's
    driver-side ``result`` vec — 128 MB of u64 at level 14 / scale 4,
    the tool's documented ceiling, never the raw tile stream.
    """
    from ..core.png import encode_png

    if scale < 1 or (1 << level) % scale:
        raise ValueError(f"scale {scale} must divide 2^{level}")
    w = (1 << level) // scale

    def partial(batch: pa.Table) -> pa.Table:
        z = np.asarray(batch["z"], dtype=np.int64)
        keep = z == level
        cx = np.asarray(batch["x"], dtype=np.int64)[keep] // scale
        cy = np.asarray(batch["y"], dtype=np.int64)[keep] // scale
        sizes = byte_sizes(batch[payload_col])[keep]
        uniq, inv = np.unique(cy * w + cx, return_inverse=True)
        return pa.table(
            {
                "cell": pa.array(uniq, type=pa.int64()),
                "sum_bytes": pa.array(
                    np.bincount(inv, weights=sizes).astype(np.int64),
                    type=pa.int64(),
                ),
            }
        )

    grid = np.zeros(w * w, dtype=np.int64)
    partials = tiles_ds.map_batches(partial, batch_format="pyarrow")
    for b in partials.iter_batches(batch_format="pyarrow"):
        np.add.at(grid, np.asarray(b["cell"]), np.asarray(b["sum_bytes"]))
    mean = grid / float(scale * scale)
    px = np.clip(np.log2(np.maximum(mean, 1.0)) * 10.0, 0.0, 255.0)
    return encode_png(px.astype(np.uint8).reshape(w, w))


# packs (y, x) into one sortable key; y-transitions can never look like
# an x-gap of 1 because x < 2^32 << 2^33
_RUN_B = np.int64(1) << np.int64(33)


def _points_to_runs(x: np.ndarray, y: np.ndarray) -> pa.Table:
    """Covered (x, y) tiles -> maximal horizontal runs, vectorized."""
    if not len(x):
        empty64 = pa.array([], type=pa.int64())
        return pa.table({"y": empty64, "x_start": empty64, "x_end": empty64})
    key = np.unique(y * _RUN_B + x)  # sorted + dedup in one pass
    brk = np.flatnonzero(np.diff(key) > 1)
    starts = np.concatenate(([0], brk + 1))
    ends = np.concatenate((brk, [len(key) - 1]))
    ks, ke = key[starts], key[ends]
    return pa.table(
        {
            "y": pa.array(ks // _RUN_B, type=pa.int64()),
            "x_start": pa.array(ks % _RUN_B, type=pa.int64()),
            "x_end": pa.array(ke % _RUN_B, type=pa.int64()),
        }
    )


def _merge_runs_block(table: pa.Table) -> pa.Table:
    """One exchange partition: merge overlapping/adjacent partial runs
    per y (classic interval merge, vectorized with cummax)."""
    if table.num_rows == 0:
        return table
    y = np.asarray(table["y"], dtype=np.int64)
    s = y * _RUN_B + np.asarray(table["x_start"], dtype=np.int64)
    e = y * _RUN_B + np.asarray(table["x_end"], dtype=np.int64)
    order = np.argsort(s, kind="stable")
    s, e = s[order], e[order]
    cm = np.maximum.accumulate(e)
    new = np.ones(len(s), dtype=bool)
    new[1:] = s[1:] > cm[:-1] + 1
    starts_idx = np.flatnonzero(new)
    out_s = s[starts_idx]
    out_e = np.maximum.reduceat(e, starts_idx)
    return pa.table(
        {
            "y": pa.array(out_s // _RUN_B, type=pa.int64()),
            "x_start": pa.array(out_s % _RUN_B, type=pa.int64()),
            "x_end": pa.array(out_e % _RUN_B, type=pa.int64()),
        }
    )


def coverage_runs(tiles_ds, level: int, num_partitions: int = 8):
    """Horizontal runs of covered tiles per row at one level:
    (y, x_start, x_end) — the rectilinear decomposition every outline
    derives from.

    Fully distributed: per-batch run partials (already maximal within
    their batch) -> small hash exchange keyed on y -> vectorized
    interval merge per partition. The driver only ever gathers the
    merged RUNS (outline-sized), never the covered-tile set — at z=14
    the tiles are millions, the runs a few thousand."""
    def partial(batch: pa.Table) -> pa.Table:
        z = np.asarray(batch["z"], dtype=np.int64)
        m = z == level
        x = np.asarray(batch["x"], dtype=np.int64)[m]
        y = np.asarray(batch["y"], dtype=np.int64)[m]
        return _points_to_runs(x, y)

    from .exchange import hash_exchange

    partials = tiles_ds.map_batches(partial, batch_format="pyarrow")
    merged = hash_exchange(partials, "y", _merge_runs_block, num_partitions=num_partitions)
    df = merged.to_pandas()
    return sorted(
        (int(r.y), int(r.x_start), int(r.x_end)) for r in df.itertuples()
    )


def coverage_outline_geojson(tiles_ds, level: int):
    """Tile coverage -> GeoJSON MultiPolygon of merged rectangles.

    Vertical merge of equal horizontal runs (the rectilinear analogue
    of tile_outline's unary_union); each rectangle becomes a WGS84
    ring via tile_geo_bbox. Ring order: exterior counter-clockwise.
    """
    from ..core.coords import tile_geo_bbox

    runs = coverage_runs(tiles_ds, level)
    # merge vertically-adjacent identical runs into rectangles
    open_rects = {}  # (x0, x1) -> [y_start, y_end]
    rects = []
    for y, x0, x1 in sorted(runs):
        key = (x0, x1)
        if key in open_rects and open_rects[key][1] == y - 1:
            open_rects[key][1] = y
        else:
            if key in open_rects:
                rects.append((key[0], key[1], *open_rects.pop(key)))
            open_rects[key] = [y, y]
    rects += [(k[0], k[1], v[0], v[1]) for k, v in open_rects.items()]
    polygons = []
    for x0, x1, y0, y1 in sorted(rects):
        west, _, _, north = tile_geo_bbox(level, x0, y0)
        _, south, east, _ = tile_geo_bbox(level, x1, y1)
        polygons.append(
            [[[west, south], [east, south], [east, north], [west, north], [west, south]]]
        )
    return {"type": "MultiPolygon", "coordinates": polygons}


# ---- deep probe: tile-contents scan (probe.rs -dd / ProbeDepth) --------

from ..core.formats import sniff_format as _sniff_format  # one sniffer, core/formats.py


def probe_tile_contents(tiles_ds, payload_col="payload"):
    """Deep content scan (ProbeDepth::TileContents, probe_depth.rs:23):
    per-zoom payload-format counts plus MVT per-layer feature totals.

    One map_batches pass emits tiny per-(z, kind, name) partials
    (kind='format': n = tiles, bytes = payload bytes; kind='layer':
    n = features in that MVT layer), combined by a small groupby —
    the scan distributes, only per-key sums shuffle. Payload decode is
    inherently per-tile (each MVT parses independently), matching the
    reference's per-tile probe loop.
    """
    import gzip as _gzip

    from ray.data.aggregate import Sum

    from ..core import mvt as _mvt

    def partial(batch: pa.Table) -> pa.Table:
        z = np.asarray(batch["z"], dtype=np.int64)
        sizes = byte_sizes(batch[payload_col])
        counts = {}  # (z, kind, name) -> [n, bytes]
        col = batch[payload_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        for i in range(len(col)):
            payload = col[i].as_py()
            if payload[:2] == b"\x1f\x8b":
                payload = _gzip.decompress(payload)
            fmt = _sniff_format(payload)
            key = (int(z[i]), "format", fmt)
            agg = counts.setdefault(key, [0, 0])
            agg[0] += 1
            agg[1] += int(sizes[i])
            if fmt == "mvt":
                try:
                    tile = _mvt.decode_tile(payload, raw_geometry=True)
                except Exception:
                    continue
                for layer in tile["layers"]:
                    lkey = (int(z[i]), "layer", layer["name"])
                    lagg = counts.setdefault(lkey, [0, 0])
                    lagg[0] += len(layer["features"])
        keys = sorted(counts)
        return pa.table(
            {
                "z": pa.array([k[0] for k in keys], type=pa.int64()),
                "kind": pa.array([k[1] for k in keys], type=pa.string()),
                "name": pa.array([k[2] for k in keys], type=pa.string()),
                "n": pa.array([counts[k][0] for k in keys], type=pa.int64()),
                "bytes": pa.array([counts[k][1] for k in keys], type=pa.int64()),
            }
        )

    return tiles_ds.map_batches(partial, batch_format="pyarrow").groupby(
        ["z", "kind", "name"]
    ).aggregate(Sum("n", alias_name="n"), Sum("bytes", alias_name="bytes"))
