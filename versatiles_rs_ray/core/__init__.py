"""Core kernels: coordinates, bboxes, cells, compression. Pure numpy/pyarrow."""

from .bbox import TileBBox, TileBBoxPyramid
from .coords import (
    MAX_LEVEL,
    MERCATOR_LAT_MAX,
    flip_y,
    hilbert_index,
    hilbert_to_coord,
    lonlat_to_tile,
    mercator_fraction,
    pack_pk,
    parent_tile,
    quadkey,
    sort_index,
    tile_geo_bbox,
    tile_to_lonlat,
)

__all__ = [
    "MAX_LEVEL",
    "MERCATOR_LAT_MAX",
    "TileBBox",
    "TileBBoxPyramid",
    "flip_y",
    "hilbert_index",
    "hilbert_to_coord",
    "lonlat_to_tile",
    "mercator_fraction",
    "pack_pk",
    "parent_tile",
    "quadkey",
    "sort_index",
    "tile_geo_bbox",
    "tile_to_lonlat",
]
