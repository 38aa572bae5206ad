"""VPL-style pipeline language: `from_x a=1 | op b=2 | ...` -> Dataset.

The Ray restatement of the reference's pipeline factory
(versatiles_pipeline/src/vpl/parser.rs node model,
src/factory.rs:147-157: head node = read op, tail folded as
transforms) and its plugin registries (factory.rs:44-128,
container_registry.rs:56-112). A pipeline string builds a lazy
Dataset; execution happens when the caller consumes it.

Grammar (the subset the engine needs):
  pipeline   := node ("|" node)*
  node       := name (key "=" value)* sources?
  sources    := "[" pipeline ("," pipeline)* "]"   # nested sub-pipelines
  value      := scalar | "[" scalar ("," scalar)* "]"

A bracket group containing pipeline syntax (a word not followed by
"=", or a "|") is parsed as nested SOURCES (the reference's
`from_merged_vector [ a, b ]` form, vpl_node.rs:21-28); a bracket of
bare scalars stays a list value (e.g. bbox=[0,0,40,20]).
"""

from __future__ import annotations

import re

from ..core.bbox import TileBBoxPyramid

_TOKEN = re.compile(r"(\w+)\s*=\s*(\[[^\]]*\]|\S+)")


def _split_top(text: str, sep: str):
    """Split on sep at bracket depth 0."""
    parts = []
    depth = 0
    cur = []
    for ch in text:
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


def parse_vpl(text: str):
    """'from_debug zmax=3 | filter bbox=[0,0,40,20]' -> [(name, args)].

    Nested sources appear in args as args["sources"] = [node-list, ...].
    """
    nodes = []
    for part in _split_top(text, "|"):
        part = part.strip()
        if not part:
            continue
        name = part.split()[0]
        rest = part[len(name):].strip()
        args = {}
        # nested sources: a trailing top-level bracket group holding
        # pipeline syntax rather than scalars
        src_match = re.search(r"(?:^|\s)(\[.*\])\s*$", rest, re.S)
        if src_match and ("|" in src_match.group(1) or re.search(r"\bfrom_\w+", src_match.group(1))):
            inner = src_match.group(1)[1:-1]
            args["sources"] = [parse_vpl(p) for p in _split_top(inner, ",")]
            rest = rest[: src_match.start()].strip()
        for key, raw in _TOKEN.findall(rest):
            if raw.startswith("["):
                args[key] = [_coerce(v) for v in raw[1:-1].split(",") if v.strip()]
            else:
                args[key] = _coerce(raw)
        nodes.append((name, args))
    return nodes


def _coerce(v: str):
    v = v.strip()
    # reference VPL quotes values (`filename="..." tile_size="512"`,
    # vpl/parser.rs): strip one layer of matching quotes before casting
    if len(v) >= 2 and v[0] == v[-1] and v[0] in "\"'":
        v = v[1:-1]
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            continue
    return v


# ---- registries (user-extensible, cf. factory.rs:121-128) ------------

READ_OPS = {}
TRANSFORM_OPS = {}


def register_read_op(name):
    def deco(fn):
        READ_OPS[name] = fn
        return fn

    return deco


def register_transform_op(name):
    def deco(fn):
        TRANSFORM_OPS[name] = fn
        return fn

    return deco


def _build_nodes(nodes, sf_dir):
    head, args = nodes[0]
    if head not in READ_OPS:
        raise ValueError(f"unknown read op {head!r} (have {sorted(READ_OPS)})")
    if "sources" in args:
        args = dict(args)
        args["sources"] = [_build_nodes(sub, sf_dir) for sub in args["sources"]]
    ds = READ_OPS[head](sf_dir=sf_dir, **args)
    for name, targs in nodes[1:]:
        if name not in TRANSFORM_OPS:
            raise ValueError(f"unknown transform {name!r} (have {sorted(TRANSFORM_OPS)})")
        # transforms resolve relative side-files (e.g. cities.csv)
        # against the pipeline's base dir, like the reference factory
        ds = TRANSFORM_OPS[name](ds, sf_dir=sf_dir, **targs)
    return ds


def build_pipeline(text: str, sf_dir: str | None = None):
    """Build a Dataset from a VPL string: head = read op (possibly with
    nested [sub, sub] sources), rest transforms."""
    nodes = parse_vpl(text)
    if not nodes:
        raise ValueError("empty pipeline")
    return _build_nodes(nodes, sf_dir)


# ---- built-in operators ----------------------------------------------


@register_read_op("from_debug")
def _from_debug(sf_dir=None, zmax=3, zmin=0, format=None, **_):
    """from_debug [format=mvt|png|jpg|webp|avif|json] — real encoded
    payloads per format (from_debug/mod.rs:31-34; our default stays the
    oracle-friendly json payload, the reference defaults to mvt)."""
    from ..sources.debug_tiles import format_debug_tiles, json_debug_tiles

    pyr = TileBBoxPyramid.new_full(int(zmax), int(zmin))
    if format in (None, "json"):
        return json_debug_tiles(pyr)
    return format_debug_tiles(pyr, str(format))


@register_read_op("from_docs")
def _from_docs(sf_dir=None, replicate=1, **_):
    """Interleaved-docs source over {sf_dir}/documents.parquet (replicate= tiles the id space)."""
    from ..sources.docs import read_docs

    return read_docs(sf_dir, replicate=int(replicate))


@register_read_op("from_gradient")
def _from_gradient(sf_dir=None, zmax=3, zmin=0, size=64, **_):
    """Synthetic WGS84 gradient raster tiles (testdata/gradient.tif analogue)."""
    from ..sources.debug_tiles import gradient_tiles

    return gradient_tiles(TileBBoxPyramid.new_full(int(zmax), int(zmin)), size=int(size))


@register_read_op("from_stacked")
def _from_stacked(sf_dir=None, sources=None, **_):
    """First-wins stack of N nested sources (from_stacked.rs:125-165)."""
    from ..stages.stack import stacked_tiles

    if not sources:
        raise ValueError("from_stacked needs nested [source, source] pipelines")
    return stacked_tiles(sources)


@register_read_op("from_merged_vector")
def _from_merged_vector(sf_dir=None, sources=None, **_):
    """Merge N nested vector sources per tile key (from_merged_vector.rs: same-name layers concatenated)."""
    from ..stages.vector import merge_vector_tiles

    if not sources:
        raise ValueError("from_merged_vector needs nested [source, source] pipelines")
    union = None
    for s in sources:
        union = s if union is None else union.union(s)
    return merge_vector_tiles(union)


@register_read_op("from_stacked_raster")
def _from_stacked_raster(sf_dir=None, sources=None, **_):
    """Alpha-composite stack of N nested raster sources (from_stacked_raster.rs)."""
    from ..stages.raster import stacked_raster

    if not sources:
        raise ValueError("from_stacked_raster needs nested [source, source] pipelines")
    return stacked_raster(sources)


@register_read_op("from_container")
def _from_container(sf_dir=None, filename=None, **_):
    """Open any registered container as a VPL head node
    (from_container.rs:20-43: filename resolved relative to the
    pipeline's base path — here sf_dir)."""
    import os

    if filename is None:
        raise ValueError("from_container needs filename=...")
    path = str(filename)
    if sf_dir and "://" not in path and not os.path.isabs(path):
        path = os.path.join(sf_dir, path)
    return open_container(path)


@register_read_op("from_gdal_raster")
def _from_gdal_raster(sf_dir=None, zmax=3, zmin=0, tile_size=64,
                      source_height=512, filename=None,
                      level_min=None, level_max=None, **_):
    """GDAL-path raster source: `filename=` opens a real GeoTIFF via
    the stdlib reader (sources/geotiff.py) and warps it through the
    arbitrary-SRS pool, exactly the reference's
    `from_gdal_raster filename=... tile_size=... level_min/max=...`
    surface (from_gdal/raster/operation.rs:262). Without a filename the
    deterministic synthetic WGS84 world raster substitutes (no GDAL in
    sandbox for exotic formats)."""
    import os

    from ..sources.debug_tiles import json_debug_tiles
    from ..stages.reproject import (
        make_world_raster,
        reproject_raster,
        reproject_srs_raster,
    )

    if level_min is not None:
        zmin = level_min
    if level_max is not None:
        zmax = level_max
    coords = json_debug_tiles(
        TileBBoxPyramid.new_full(int(zmax), int(zmin))
    ).select_columns(["z", "x", "y"])
    if filename is not None:
        from ..sources.geotiff import read_raster_source

        path = str(filename)
        if sf_dir and "://" not in path and not os.path.isabs(path):
            path = os.path.join(sf_dir, path)
        g = read_raster_source(path, epsg=int(_["epsg"]) if "epsg" in _ else None)
        # GDAL's default warp resampling is Average (resample.rs:54)
        return reproject_srs_raster(
            coords, g.array, g.geotransform, g.epsg or 4326,
            tile_size=int(tile_size), resampling="average",
        )
    return reproject_raster(
        coords, make_world_raster(int(source_height)), tile_size=int(tile_size)
    )


@register_read_op("from_terrain")
def _from_terrain(sf_dir=None, filename=None, mode="terrarium",
                  azimuth=315.0, altitude=45.0, z_factor=1.0, scale=None,
                  zmax=3, zmin=0, tile_size=64,
                  level_min=None, level_max=None, **_):
    """Terrain source: open a DEM with the same reader stack as
    `from_gdal_raster` (TIFF/HGT/AAIGrid/NetCDF/VRT/world-file),
    derive mode=hillshade|slope|terrarium|mapbox on the SOURCE grid
    (stages/terrain.py, GDALDEM Horn kernel / the published
    terrain-RGB encodings), then warp the resulting uint8 grid through
    the standard SRS pool into ordinary raster tiles. Graft-new
    surface (the reference has no terrain ops)."""
    import os

    from ..sources.debug_tiles import json_debug_tiles
    from ..sources.geotiff import read_raster_source
    from ..stages.reproject import reproject_srs_raster
    from ..stages.terrain import terrain_grid

    if filename is None:
        raise ValueError("from_terrain requires filename=")
    if level_min is not None:
        zmin = level_min
    if level_max is not None:
        zmax = level_max
    path = str(filename)
    if sf_dir and "://" not in path and not os.path.isabs(path):
        path = os.path.join(sf_dir, path)
    g = read_raster_source(path, epsg=int(_["epsg"]) if "epsg" in _ else None)
    grid = terrain_grid(g, mode=str(mode), azimuth=float(azimuth),
                        altitude=float(altitude), z_factor=float(z_factor),
                        scale=float(scale) if scale is not None else None)
    coords = json_debug_tiles(
        TileBBoxPyramid.new_full(int(zmax), int(zmin))
    ).select_columns(["z", "x", "y"])
    return reproject_srs_raster(
        coords, grid, g.geotransform, g.epsg or 4326,
        tile_size=int(tile_size), resampling="average",
    )


@register_read_op("from_contours")
def _from_contours(sf_dir=None, filename=None, interval=None, base=0.0,
                   levels=None, zmax=3, zmin=0, layer="contours",
                   simplify=0.0, level_min=None, level_max=None, **_):
    """Contour vector tiles from a DEM — the raster->vector conversion
    (gdal_contour shape: interval=/base= or levels=v1,v2,...): open the
    DEM with the from_gdal_raster reader stack, marching-squares the
    SOURCE grid (stages/contour.py), transform vertices to lon/lat via
    the SRS registry, and stream the polylines through the standard
    GeoJSON->MVT tiling exchange (one linestring feature per chain,
    property elevation=<level>). Graft-new surface (the reference has
    no contour op)."""
    import json as _json
    import os

    import ray.data as rd

    from ..core import srs as _srs
    from ..sources.geojson import features_to_mvt_tiles
    from ..sources.geotiff import read_raster_source
    from ..stages.contour import contour_lines

    if filename is None:
        raise ValueError("from_contours requires filename=")
    if level_min is not None:
        zmin = level_min
    if level_max is not None:
        zmax = level_max
    path = str(filename)
    if sf_dir and "://" not in path and not os.path.isabs(path):
        path = os.path.join(sf_dir, path)
    g = read_raster_source(path, epsg=int(_["epsg"]) if "epsg" in _ else None)
    if levels is not None and not isinstance(levels, (list, tuple)):
        levels = [float(v) for v in str(levels).split(",")]
    lines = contour_lines(
        g, interval=float(interval) if interval is not None else None,
        base=float(base), levels=levels, simplify_px=float(simplify))
    epsg = g.epsg or 4326
    tr = None if epsg == 4326 else _srs.get_srs(epsg)
    rows = {"lon": [], "lat": [], "geom_type": [], "geometry": [],
            "properties": []}
    for level, pts in lines:
        if tr is not None:
            lon, lat = tr.inverse(pts[:, 0], pts[:, 1])
        else:
            lon, lat = pts[:, 0], pts[:, 1]
        coords = [[float(a), float(b)] for a, b in zip(lon, lat)]
        rows["lon"].append(coords[0][0])
        rows["lat"].append(coords[0][1])
        rows["geom_type"].append("LineString")
        rows["geometry"].append(_json.dumps(
            {"type": "LineString", "coordinates": coords}))
        rows["properties"].append(_json.dumps({"elevation": float(level)}))
    import pyarrow as pa

    feats = rd.from_arrow(pa.table({
        "lon": pa.array(rows["lon"], type=pa.float64()),
        "lat": pa.array(rows["lat"], type=pa.float64()),
        "geom_type": pa.array(rows["geom_type"], type=pa.string()),
        "geometry": pa.array(rows["geometry"], type=pa.string()),
        "properties": pa.array(rows["properties"], type=pa.string()),
    }))
    out = None
    for z in range(int(zmin), int(zmax) + 1):
        t = features_to_mvt_tiles(feats, z, layer_name=str(layer))
        out = t if out is None else out.union(t)
    return out


@register_transform_op("filter")
def _filter(ds, bbox=None, level_min=None, level_max=None, **_):
    """Keep tiles inside bbox=[w,s,e,n] / level_min= / level_max= (filter.rs:44-57)."""
    from ..stages.filter import filter_bbox_zoom

    return filter_bbox_zoom(ds, bbox=bbox, level_min=level_min, level_max=level_max)


@register_transform_op("flip_y")
def _flip(ds, **_):
    """Flip y within each zoom level (TMS <-> XYZ)."""
    from ..stages.transform import flip_y_ds

    return flip_y_ds(ds)


@register_transform_op("swap_xy")
def _swap(ds, **_):
    """Swap x and y coordinates."""
    from ..stages.transform import swap_xy_ds

    return swap_xy_ds(ds)


@register_transform_op("assign_tiles")
def _assign(ds, zoom=8, **_):
    """Assign doc rows to (z,x,y) tiles at zoom= (mercator point assignment)."""
    from ..stages.assign import assign_tiles

    return assign_tiles(ds, int(zoom))


@register_transform_op("raster_levels")
def _levels(ds, brightness=0.0, contrast=1.0, gamma=1.0, **_):
    """Brightness/contrast/gamma adjust raster tiles with Rust rounding (raster_levels.rs)."""
    from ..stages.raster import raster_levels

    return raster_levels(ds, float(brightness), float(contrast), float(gamma))


@register_transform_op("raster_flatten")
def _flatten(ds, **_):
    """Composite tiles onto an opaque background color (raster_flatten.rs)."""
    from ..stages.raster import raster_flatten

    return raster_flatten(ds)


@register_transform_op("raster_overscale")
def _overscale(ds, delta=1, **_):
    """Derive missing deeper zooms by 1->4^d pixel upscaling (raster_overscale.rs)."""
    from ..stages.raster import raster_overscale

    return raster_overscale(ds, int(delta))


@register_transform_op("recompress")
def _recompress(ds, src="raw", dst="gzip", **_):
    """Recompress payloads from=/to= raw|gzip|br|zstd (converter
    recompression; zstd only when the system libzstd resolves)."""
    from ..stages.transform import recompress_ds

    return recompress_ds(ds, "payload", src, dst)


@register_transform_op("vector_filter_layers")
def _vfl(ds, names=None, invert=0, **_):
    """Keep/remove named layers in vector tiles (vector_filter_layers.rs)."""
    from ..stages.vector import VectorFilterLayers

    names = names if isinstance(names, list) else [names]
    return ds.map_batches(VectorFilterLayers(names, bool(int(invert))), batch_format="pyarrow")


@register_transform_op("vector_filter_properties")
def _vfp(ds, regex=".*", invert=0, **_):
    """Keep/remove feature properties in vector tiles (vector_filter_properties.rs)."""
    from ..stages.vector import VectorFilterProperties

    return ds.map_batches(
        VectorFilterProperties(str(regex), bool(int(invert))), batch_format="pyarrow"
    )


@register_transform_op("vector_simplify")
def _vsimplify(ds, tolerance=2.0, **_):
    """Douglas-Peucker simplify vector-tile lines/rings; tolerance in
    tile-local units (extent 4096). Graft-new op."""
    from ..stages.vector import VectorSimplify

    return ds.map_batches(VectorSimplify(float(tolerance)),
                          batch_format="pyarrow")


@register_transform_op("vector_rasterize")
def _vrasterize(ds, size=256, colors=None, background=None, **_):
    """Render vector tiles into PNG raster tiles (scanline even-odd
    fill / dense-sampled strokes / 3x3 point markers; pixel-center
    sampling matches the PIP join's crossing-parity convention).
    colors: 'layer:RRGGBBAA;...' overrides; background: RRGGBBAA hex
    (default transparent). Graft-new op (the reference never
    rasterizes vector data)."""
    from ..stages.rasterize import vector_rasterize

    styles = {}
    if colors:
        for part in str(colors).split(";"):
            name, _, hexv = part.partition(":")
            if len(hexv) != 8:
                raise ValueError(
                    f"vector_rasterize: colors entry {part!r} must be "
                    "layer:RRGGBBAA")
            styles[name] = tuple(int(hexv[i:i + 2], 16) for i in (0, 2, 4, 6))
    bg = (0, 0, 0, 0)
    if background:
        if len(str(background)) != 8:
            raise ValueError("vector_rasterize: background must be RRGGBBAA")
        bg = tuple(int(str(background)[i:i + 2], 16) for i in (0, 2, 4, 6))
    return vector_rasterize(ds, size=int(size), styles=styles, background=bg)


@register_transform_op("raster_format")
def _rformat(ds, format="png", quality=None, speed=None, codec="auto", **_):
    """Re-encode raster payloads per-zoom via a format/quality schedule
    (raster_format.rs). codec=auto (default) takes the compiled
    libjpeg shim for JPEG (~40x/tile) when its self-check passed;
    codec=pure forces the byte-deterministic pure-Python encoder."""
    from ..stages.raster import raster_format

    return raster_format(ds, str(format), quality_schedule=quality,
                         speed=speed, codec=str(codec))


@register_transform_op("raster_overview")
def _roverview(ds, z_from=None, z_to=0, **_):
    """Derive shallower zooms by 2x2 mosaic downscale cascade (raster_overview.rs)."""
    from ..stages.raster import raster_overview

    if z_from is None:
        raise ValueError("raster_overview needs z_from=...")
    # derive strictly from the base level (raster_overview.rs fills
    # missing lower zooms from the bottom of the pyramid)
    import pyarrow.compute as pc

    base = ds.map_batches(
        lambda b: b.filter(pc.equal(b["z"], int(z_from))), batch_format="pyarrow"
    )
    levels = raster_overview(base, int(z_from), int(z_to))
    union = None  # one stream: the base level plus every derived level
    for z in sorted(levels):
        union = levels[z] if union is None else union.union(levels[z])
    return union


def _to_bool(v) -> bool:
    """VPL booleans arrive as `true`/`false` strings (parser.rs) or
    already-coerced ints."""
    if isinstance(v, str):
        return v.strip().lower() in ("true", "1", "yes")
    return bool(v)


@register_transform_op("vector_update_properties")
def _vup(ds, data_source_path=None, id_field_tiles=None, id_field_data=None,
         layer_name=None, replace_properties=0, remove_non_matching=0,
         include_id=0, sf_dir=None, **_):
    """CSV side table broadcast into feature properties
    (vector_update_properties.rs Args: layer_name restricts the update
    to that layer, include_id keeps the CSV id column; the side dict
    ships once via ray.put, each actor reads it from the object store)."""
    import os

    import ray

    from ..sources.geojson import load_csv_side
    from ..stages.vector import VectorUpdateProperties

    if not (data_source_path and id_field_tiles and id_field_data):
        raise ValueError(
            "vector_update_properties needs data_source_path=, "
            "id_field_tiles=, id_field_data=")
    path = str(data_source_path)
    if sf_dir and "://" not in path and not os.path.isabs(path):
        path = os.path.join(sf_dir, path)
    side = load_csv_side(path, str(id_field_data), include_id=_to_bool(include_id))
    return ds.map_batches(
        VectorUpdateProperties,
        batch_format="pyarrow",
        fn_constructor_kwargs={
            "side": ray.put(side),
            "id_field": str(id_field_tiles),
            "layer_name": str(layer_name) if layer_name is not None else None,
            "replace_properties": _to_bool(replace_properties),
            "remove_non_matching": _to_bool(remove_non_matching),
        },
        concurrency=(1, 2),
    )


@register_transform_op("meta_update")
def _meta_update(ds, **_):
    """No-op on tile rows: TileJSON metadata travels beside the tile
    stream, not through it (core/tilejson.meta_update holds the real
    merge logic; the reference's op rewrites the reader's tilejson,
    meta_update.rs). Registered so reference pipelines parse."""
    return ds


# ---- container registry (extension -> reader/writer) ------------------

CONTAINER_READERS = {}
CONTAINER_WRITERS = {}


def register_container(ext, reader=None, writer=None):
    """User-registrable container formats
    (container_registry.rs:83-112 analogue)."""
    if reader:
        CONTAINER_READERS[ext] = reader
    if writer:
        CONTAINER_WRITERS[ext] = writer


def _builtin_containers():
    from ..sources import tiles_io

    register_container(
        "mbtiles", reader=tiles_io.read_mbtiles, writer=tiles_io.write_mbtiles
    )
    register_container(
        "dir", reader=tiles_io.read_directory_tiles, writer=tiles_io.write_directory_tiles
    )
    register_container("parquet", writer=tiles_io.write_hilbert_parquet)
    register_container("tar", reader=tiles_io.read_tar_tiles, writer=tiles_io.write_tar_tiles)

    from ..sources import pmtiles

    register_container(
        "pmtiles", reader=pmtiles.read_pmtiles, writer=pmtiles.write_pmtiles
    )

    from ..sources import versatiles as _vt

    register_container(
        "versatiles", reader=_vt.read_versatiles, writer=_vt.write_versatiles
    )
    # a .vpl file IS a container source: the registry dispatches it to
    # the pipeline builder (container_registry.rs:196-246; exercised by
    # the reference's `convert ../testdata/berlin.vpl out.pmtiles` test)
    register_container("vpl", reader=_read_vpl_container)


def _read_vpl_container(path: str):
    import os

    with open(path) as f:
        text = f.read()
    return build_pipeline(text, sf_dir=os.path.dirname(os.path.abspath(path)))


_builtin_containers()


def open_container(path: str):
    ext = "dir" if "." not in path.rsplit("/", 1)[-1] else path.rsplit(".", 1)[-1]
    if ext not in CONTAINER_READERS:
        raise ValueError(f"no reader for {ext!r} (have {sorted(CONTAINER_READERS)})")
    return CONTAINER_READERS[ext](path)


def write_container(ds, path: str, **kwargs):
    ext = "dir" if "." not in path.rsplit("/", 1)[-1] else path.rsplit(".", 1)[-1]
    if ext not in CONTAINER_WRITERS:
        raise ValueError(f"no writer for {ext!r} (have {sorted(CONTAINER_WRITERS)})")
    return CONTAINER_WRITERS[ext](ds, path, **kwargs)