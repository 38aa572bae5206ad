"""Filter operators: bbox / zoom / pyramid pushdown.

Ray-Data reformulation of the reference `filter` op
(versatiles_pipeline/src/operations/general/filter.rs:29-96): the
pyramid is the pushdown predicate; membership is evaluated vectorized
per Arrow batch. When the input is partitioned by pk, whole partitions
whose bbox misses the pyramid can be pruned before read (see
sources/tiles_io.read_pyramid's `pyramid=` argument).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.bbox import TileBBoxPyramid


class PyramidFilter:
    """Keep rows whose (z, x, y) fall inside a TileBBoxPyramid."""

    def __init__(self, pyramid: TileBBoxPyramid):
        # plain data (dict of tuples) so it pickles cheaply to workers
        self.rows = pyramid.to_rows()
        self._pyramid = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._pyramid is None:
            self._pyramid = TileBBoxPyramid.from_rows(self.rows)
        mask = self._pyramid.contains_coord(
            np.asarray(batch["z"], dtype=np.int64),
            np.asarray(batch["x"], dtype=np.int64),
            np.asarray(batch["y"], dtype=np.int64),
        )
        return batch.filter(pa.array(mask))


def filter_pyramid(ds, pyramid: TileBBoxPyramid):
    return ds.map_batches(PyramidFilter(pyramid), batch_format="pyarrow")


def filter_bbox_zoom(ds, bbox=None, level_min=None, level_max=None, max_level=14,
                     bbox_border=None):
    """The reference's `filter bbox=[w,s,e,n] level_min= level_max=`.

    Builds the per-level pyramid from the WGS84 bbox exactly like
    filter.rs:44-57 (set_level_min/max + intersect_geo_bbox);
    bbox_border expands each level's box by N tiles on every edge
    (convert.rs:117-119 `--bbox-border`).
    """
    lo = level_min if level_min is not None else 0
    hi = level_max if level_max is not None else max_level
    if bbox is not None:
        pyramid = TileBBoxPyramid.from_geo_bbox(*bbox, min_level=lo, max_level=hi)
        if bbox_border:
            b = int(bbox_border)
            pyramid.add_border(b, b, b, b)
    else:
        pyramid = TileBBoxPyramid.new_full(hi, lo)
    return filter_pyramid(ds, pyramid)
