"""VPL-style pipeline language: `from_x a=1 | op b=2 | ...` -> Dataset.

The Ray restatement of the reference's pipeline factory
(versatiles_pipeline/src/vpl/parser.rs node model,
src/factory.rs:147-157: head node = read op, tail folded as
transforms) and its plugin registries (factory.rs:44-128,
container_registry.rs:56-112). A pipeline string builds a lazy
Dataset; execution happens when the caller consumes it.

Grammar (the subset the engine needs — no nested sources yet):
  pipeline   := node ("|" node)*
  node       := name (key "=" value)*
  value      := scalar | "[" scalar ("," scalar)* "]"
"""

from __future__ import annotations

import re

from ..core.bbox import TileBBoxPyramid

_TOKEN = re.compile(r"(\w+)\s*=\s*(\[[^\]]*\]|\S+)")


def parse_vpl(text: str):
    """'from_debug zmax=3 | filter bbox=[0,0,40,20]' -> [(name, args)]."""
    nodes = []
    for part in text.split("|"):
        part = part.strip()
        if not part:
            continue
        name = part.split()[0]
        args = {}
        for key, raw in _TOKEN.findall(part[len(name):]):
            if raw.startswith("["):
                args[key] = [_coerce(v) for v in raw[1:-1].split(",") if v.strip()]
            else:
                args[key] = _coerce(raw)
        nodes.append((name, args))
    return nodes


def _coerce(v: str):
    v = v.strip()
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


def build_pipeline(text: str, sf_dir: str | None = None):
    """Build a Dataset from a VPL string: head = read op, rest transforms."""
    nodes = parse_vpl(text)
    if not nodes:
        raise ValueError("empty pipeline")
    head, args = nodes[0]
    if head not in READ_OPS:
        raise ValueError(f"unknown read op {head!r} (have {sorted(READ_OPS)})")
    ds = READ_OPS[head](sf_dir=sf_dir, **args)
    for name, args in nodes[1:]:
        if name not in TRANSFORM_OPS:
            raise ValueError(f"unknown transform {name!r} (have {sorted(TRANSFORM_OPS)})")
        ds = TRANSFORM_OPS[name](ds, **args)
    return ds


# ---- built-in operators ----------------------------------------------


@register_read_op("from_debug")
def _from_debug(sf_dir=None, zmax=3, zmin=0, **_):
    from ..sources.debug_tiles import json_debug_tiles

    return json_debug_tiles(TileBBoxPyramid.new_full(int(zmax), int(zmin)))


@register_read_op("from_docs")
def _from_docs(sf_dir=None, replicate=1, **_):
    from ..sources.docs import read_docs

    return read_docs(sf_dir, replicate=int(replicate))


@register_read_op("from_gradient")
def _from_gradient(sf_dir=None, zmax=3, zmin=0, size=64, **_):
    from ..sources.debug_tiles import gradient_tiles

    return gradient_tiles(TileBBoxPyramid.new_full(int(zmax), int(zmin)), size=int(size))


@register_transform_op("filter")
def _filter(ds, bbox=None, level_min=None, level_max=None, **_):
    from ..stages.filter import filter_bbox_zoom

    return filter_bbox_zoom(ds, bbox=bbox, level_min=level_min, level_max=level_max)


@register_transform_op("flip_y")
def _flip(ds, **_):
    from ..stages.transform import flip_y_ds

    return flip_y_ds(ds)


@register_transform_op("swap_xy")
def _swap(ds, **_):
    from ..stages.transform import swap_xy_ds

    return swap_xy_ds(ds)


@register_transform_op("assign_tiles")
def _assign(ds, zoom=8, **_):
    from ..stages.assign import assign_tiles

    return assign_tiles(ds, int(zoom))


@register_transform_op("raster_levels")
def _levels(ds, brightness=0.0, contrast=1.0, gamma=1.0, **_):
    from ..stages.raster import raster_levels

    return raster_levels(ds, float(brightness), float(contrast), float(gamma))


@register_transform_op("raster_flatten")
def _flatten(ds, **_):
    from ..stages.raster import raster_flatten

    return raster_flatten(ds)


@register_transform_op("raster_overscale")
def _overscale(ds, delta=1, **_):
    from ..stages.raster import raster_overscale

    return raster_overscale(ds, int(delta))


@register_transform_op("recompress")
def _recompress(ds, src="raw", dst="gzip", **_):
    from ..stages.transform import recompress_ds

    return recompress_ds(ds, "payload", src, dst)


@register_transform_op("vector_filter_layers")
def _vfl(ds, names=None, invert=0, **_):
    from ..stages.vector import VectorFilterLayers

    names = names if isinstance(names, list) else [names]
    return ds.map_batches(VectorFilterLayers(names, bool(int(invert))), batch_format="pyarrow")


@register_transform_op("vector_filter_properties")
def _vfp(ds, regex=".*", invert=0, **_):
    from ..stages.vector import VectorFilterProperties

    return ds.map_batches(
        VectorFilterProperties(str(regex), bool(int(invert))), batch_format="pyarrow"
    )


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