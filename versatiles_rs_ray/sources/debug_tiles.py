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


def debug_raster_array(z: int, x: int, y: int, use_alpha: bool = False) -> np.ndarray:
    """The reference's debug image, semantically (from_debug/image.rs:
    13-34): 512x512, checkerboard background br=((x+y)%2)*255 with
    alpha 16 when the format carries alpha, and 'z:/x:/y:' text at the
    reference's exact offsets/colors. Glyphs come from the built-in
    pixel font (core/pixfont), not the reference's TTF — layout and
    colors match, glyph pixels don't."""
    from ..core.pixfont import draw_text

    br = np.uint8(((x + y) % 2) * 255)
    a = np.uint8(16 if use_alpha else 255)
    img = np.empty((512, 512, 4), dtype=np.uint8)
    img[..., 0] = img[..., 1] = img[..., 2] = br
    img[..., 3] = a
    # image.rs:23-26: 40px text at x=220, y=195/225/255
    draw_text(img, 220, 195, f"z: {z}", (127, 30, 16, 255))
    draw_text(img, 220, 225, f"x: {x}", (0, 92, 45, 255))
    draw_text(img, 220, 255, f"y: {y}", (30, 23, 98, 255))
    return img if use_alpha else img[..., :3]


def debug_vector_tile(z: int, x: int, y: int) -> bytes:
    """The reference's debug MVT, structurally (from_debug/vector.rs:
    17-24): layers background + debug_z/x/y; text features carry one
    MultiPolygon PER CHARACTER with properties char/x/index; layout
    constants (start x=100, rows y=140/190/240, tile-space x8 scale,
    extent 4096) match; glyph outlines come from the pixel font."""
    from ..core import mvt
    from ..core.pixfont import text_polygons

    def quant(p):
        return (int(round(p[0])), int(round(p[1])))

    def text_layer(name, row_y, text):
        feats = []
        # vector.rs: position starts at (100, y), glyph height scaled
        # to 80 font units, all coords x8 into the 4096 extent
        for i, (ch, char_x, polys) in enumerate(
                text_polygons(text, 100.0, row_y, 80.0 / 7)):
            if ch == " " or not polys:
                continue
            feats.append({
                "id": i + 1,
                "type": 3,  # polygon
                "geometry": [[quant((8 * px, 8 * py)) for px, py in ring]
                             for ring in polys],
                "properties": {"char": ch, "x": float(char_x), "index": i},
            })
        return {"version": 2, "name": name, "extent": 4096, "features": feats}

    background = {
        "version": 2, "name": "background", "extent": 4096,
        "features": [{
            "id": 1, "type": 3,
            "geometry": [[(0, 0), (4096, 0), (4096, 4096), (0, 4096), (0, 0)]],
            "properties": {},
        }],
    }
    tile = {"layers": [
        background,
        text_layer("debug_z", 140.0, f"z:{z}"),
        text_layer("debug_x", 190.0, f"x:{x}"),
        text_layer("debug_y", 240.0, f"y:{y}"),
    ]}
    return mvt.encode_tile(tile)


def add_format_payload(batch: pa.Table, fmt: str) -> pa.Table:
    """payload column for from_debug format= (mvt or encoded raster)."""
    from ..core import raster as R

    z = np.asarray(batch["z"], dtype=np.int64)
    x = np.asarray(batch["x"], dtype=np.int64)
    y = np.asarray(batch["y"], dtype=np.int64)
    payloads = []
    for zi, xi, yi in zip(z.tolist(), x.tolist(), y.tolist()):
        if fmt == "mvt":
            payloads.append(debug_vector_tile(zi, xi, yi))
        else:
            use_alpha = fmt in ("png", "webp", "avif")
            arr = debug_raster_array(zi, xi, yi, use_alpha=use_alpha)
            payloads.append(R.encode(arr, fmt))
    out = batch.append_column("payload", pa.array(payloads, type=pa.binary()))
    return out.append_column("format", pa.array([fmt] * len(z)))


def format_debug_tiles(pyramid: TileBBoxPyramid, fmt: str,
                       override_num_blocks=None):
    """from_debug format=mvt|png|jpg|webp|avif — real encoded payloads
    (from_debug/mod.rs:31-34 format arg)."""
    import functools

    import ray.data as rd

    table = coords_table(pyramid)
    ds = rd.from_arrow(table)
    if override_num_blocks:
        ds = ds.repartition(override_num_blocks)
    return ds.map_batches(functools.partial(add_format_payload, fmt=fmt),
                          batch_format="pyarrow")
