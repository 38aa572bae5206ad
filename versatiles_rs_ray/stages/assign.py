"""Tile / cell assignment stages (stateless map_batches kernels).

Adds (z, x, y), packed tile key, hilbert, partition key, and S2 cell
columns to a docs table carrying lon/lat. The numpy path and the SQL
fragments below implement the *same* formula as the reference's
``TileCoord::from_geo`` (versatiles_core/src/types/tile_coord.rs:64-80)
so DuckDB oracles agree bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core import cells, coords

# tkey packing: (z << 58) | (x << 29) | y  -- valid for z <= 29.
TKEY_Z_SHIFT = 58
TKEY_X_SHIFT = 29
TKEY_MAX_Z = 29


def pack_tkey(z, x, y):
    z = np.asarray(z, dtype=np.int64)
    assert int(np.max(z, initial=0)) <= TKEY_MAX_Z, "tkey packing supports z <= 29"
    return (z << TKEY_Z_SHIFT) | (np.asarray(x, dtype=np.int64) << TKEY_X_SHIFT) | np.asarray(y, dtype=np.int64)


def unpack_tkey(tkey):
    tkey = np.asarray(tkey, dtype=np.int64)
    z = tkey >> TKEY_Z_SHIFT
    x = (tkey >> TKEY_X_SHIFT) & ((1 << TKEY_Z_SHIFT - TKEY_X_SHIFT) - 1)
    y = tkey & ((1 << TKEY_X_SHIFT) - 1)
    return z, x, y


def sql_tile_x(z: int, lon_expr: str) -> str:
    """SQL mirror of lonlat_to_tile's x (tile_coord.rs:71-77)."""
    p2z = float(1 << z)
    return f"CAST(floor(least(greatest({p2z} * (({lon_expr}) / 360.0 + 0.5), 0.0), {p2z - 1.0})) AS BIGINT)"


def sql_tile_y(z: int, lat_expr: str) -> str:
    """SQL mirror of lonlat_to_tile's y (tile_coord.rs:73-78)."""
    p2z = float(1 << z)
    return (
        f"CAST(floor(least(greatest({p2z} * (0.5 - 0.5 * "
        f"ln(tan(({lat_expr}) * pi() / 360.0 + pi() / 4.0)) / pi()), 0.0), {p2z - 1.0})) AS BIGINT)"
    )


class AssignTiles:
    """map_batches fn: add z/x/y (+ optional hilbert, pk, s2) columns.

    Stateless and vectorized; configured once at pipeline build. Use
    with ``batch_format="pyarrow"`` for zero-copy input.
    """

    def __init__(self, zoom: int, with_hilbert=False, with_pk=False, block_bits=8, with_s2=None):
        self.zoom = zoom
        self.with_hilbert = with_hilbert
        self.with_pk = with_pk
        self.block_bits = block_bits
        self.with_s2 = with_s2  # None or an S2 level

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = np.asarray(batch["lon"], dtype=np.float64)
        lat = np.asarray(batch["lat"], dtype=np.float64)
        x, y = coords.lonlat_to_tile(lon, lat, self.zoom)
        z = np.full(len(x), self.zoom, dtype=np.int64)
        batch = batch.append_column("z", pa.array(z, type=pa.int64()))
        batch = batch.append_column("x", pa.array(x, type=pa.int64()))
        batch = batch.append_column("y", pa.array(y, type=pa.int64()))
        if self.with_hilbert:
            batch = batch.append_column(
                "hilbert", pa.array(coords.hilbert_index(z, x, y), type=pa.int64())
            )
        if self.with_pk:
            batch = batch.append_column(
                "pk", pa.array(coords.pack_pk(z, x, y, self.block_bits), type=pa.int64())
            )
        if self.with_s2 is not None:
            batch = batch.append_column(
                "s2_cell", pa.array(cells.s2_cell_id(lon, lat, self.with_s2), type=pa.int64())
            )
        return batch


def assign_tiles(ds, zoom, **kwargs):
    """Dataset helper: ``ds`` must carry lon/lat columns."""
    return ds.map_batches(AssignTiles(zoom, **kwargs), batch_format="pyarrow")


def spatial_thin(ds, zoom: int, k: int, id_col: str = "doc_num",
                 num_partitions: int = 64):
    """Density cap: keep at most ``k`` features per tile at ``zoom``,
    chosen as the k smallest Knuth-hash priorities of ``id_col`` — the
    tippecanoe feature-dropping move (drop densest, keep a
    deterministic pseudo-random subset so zoom-in reveals MORE data,
    never different data). Pure composition: tile assignment +
    per-key quota with its map-side prune (shuffle rows bounded by
    k x tiles per input batch under any density skew). ``ds`` must
    carry lon/lat; output adds z/x/y and keeps survivors only.

    Equivalent SQL: row_number() OVER (PARTITION BY x, y ORDER BY
    (id * 6364136223846793005) % 2^64, id) <= k.
    """
    from .curate import _SHUFFLE_MULT, quota_per_key

    if k < 1:
        raise ValueError("spatial_thin: k must be >= 1")

    def keyed(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], dtype=np.int64)
        z = np.asarray(batch["z"], dtype=np.int64)
        x = np.asarray(batch["x"], dtype=np.int64)
        y = np.asarray(batch["y"], dtype=np.int64)
        pri = ids.astype(np.uint64) * np.uint64(_SHUFFLE_MULT)
        batch = batch.append_column("tkey", pa.array(pack_tkey(z, x, y),
                                                     type=pa.int64()))
        return batch.append_column("_pri", pa.array(pri, type=pa.uint64()))

    tiled = assign_tiles(ds, zoom).map_batches(keyed, batch_format="pyarrow")
    out = quota_per_key(tiled, "tkey", "_pri", k,
                        num_partitions=num_partitions)
    return out.drop_columns(["tkey", "_pri"])
