"""Coordinate-scheme transforms and payload recompression.

The Ray analogue of `TilesConvertReader`
(versatiles_container/src/types/converter.rs:117-256): flip_y / swap_xy
rewrite the x/y columns (`converter.rs:223-246`), recompression maps
the binary payload column (`converter.rs:248-253`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core import coords
from ..core.compression import recompress_table


def flip_y_batch(batch: pa.Table) -> pa.Table:
    """y' = 2^z - 1 - y (XYZ <-> TMS, tile_coord.rs:179-181)."""
    z = np.asarray(batch["z"], dtype=np.int64)
    y = np.asarray(batch["y"], dtype=np.int64)
    idx = batch.schema.get_field_index("y")
    return batch.set_column(idx, "y", pa.array(coords.flip_y(z, y), type=pa.int64()))


def swap_xy_batch(batch: pa.Table) -> pa.Table:
    """Swap the x and y columns (tile_coord.rs:182-184)."""
    xi = batch.schema.get_field_index("x")
    yi = batch.schema.get_field_index("y")
    x_col, y_col = batch.column(xi), batch.column(yi)
    return batch.set_column(xi, "x", y_col).set_column(yi, "y", x_col)


def flip_y_ds(ds):
    return ds.map_batches(flip_y_batch, batch_format="pyarrow")


def swap_xy_ds(ds):
    return ds.map_batches(swap_xy_batch, batch_format="pyarrow")


def recompress_ds(ds, payload_col, from_codec, to_codec):
    return ds.map_batches(
        lambda t: recompress_table(t, payload_col, from_codec, to_codec),
        batch_format="pyarrow",
    )
