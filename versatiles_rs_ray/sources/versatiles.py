"""The versatiles binary container: reader + single-writer sink.

Implements the project's namesake format, `versatiles_v02`, from the
reference's serialization code (all layouts big-endian):

- 66-byte header: magic, tile format, compression, zoom range, geo
  bbox x1e7, meta/blocks byte ranges
  (versatiles_container/src/container/versatiles/types/file_header.rs:80-130);
- tiles grouped in 256x256 blocks; per block a tile index of
  (offset u64, length u32) per covered tile, row-major within the
  block's bbox (tile_index.rs:65-98, tile_bbox/queries.rs:180-192),
  small identical tiles deduplicated by hash (block_writer.rs:56-67);
- 33-byte block definitions collected into a block index appended at
  the end (block_definition.rs:135-156, block_index.rs:38-55);
- the two indices are brotli streams. Without the brotli library this
  engine writes STORED-mode brotli (valid per RFC 7932 — the
  reference's rust decoder reads our files) and reads back its own;
  entropy-coded foreign files need the library (core/brotli_stored.py).

Reading is distributed: the driver decodes only the (small) block
index, then per-block Dataset tasks range-read their tile index +
clustered tile span — the same shape as read_pmtiles, working over
local paths and http(s):// URLs.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from ..core import brotli_stored
from ..core.coords import tile_geo_bbox

MAGIC = b"versatiles_v02"
HEADER_LENGTH = 66
BLOCK_DEF_LENGTH = 33

_FORMAT_CODE = {
    "bin": 0x00,
    "png": 0x10, "jpg": 0x11, "webp": 0x12, "avif": 0x13, "svg": 0x14,
    "mvt": 0x20, "geojson": 0x21, "topojson": 0x22, "json": 0x23,
}
_CODE_FORMAT = {v: k for k, v in _FORMAT_CODE.items()}
_COMPRESSION_CODE = {"raw": 0, "gzip": 1, "br": 2}
_CODE_COMPRESSION = {v: k for k, v in _COMPRESSION_CODE.items()}


def _pack_header(tile_format, compression, zmin, zmax, geo_bbox,
                 meta_off, meta_len, blocks_off, blocks_len) -> bytes:
    bbox_i = [int(round(v * 1e7)) for v in geo_bbox]
    return (
        MAGIC
        + struct.pack(">BBBB", _FORMAT_CODE[tile_format],
                      _COMPRESSION_CODE[compression], zmin, zmax)
        + struct.pack(">iiii", *bbox_i)
        + struct.pack(">QQQQ", meta_off, meta_len, blocks_off, blocks_len)
    )


def _unpack_header(blob: bytes) -> dict:
    assert blob[:14] == MAGIC, "not a versatiles_v02 file"
    fmt, comp, zmin, zmax = struct.unpack_from(">BBBB", blob, 14)
    bbox = struct.unpack_from(">iiii", blob, 18)
    meta_off, meta_len, blocks_off, blocks_len = struct.unpack_from(">QQQQ", blob, 34)
    return {
        "tile_format": _CODE_FORMAT[fmt],
        "compression": _CODE_COMPRESSION[comp],
        "zoom_range": (zmin, zmax),
        "geo_bbox": tuple(v / 1e7 for v in bbox),
        "meta_range": (meta_off, meta_len),
        "blocks_range": (blocks_off, blocks_len),
    }


def _pack_block_def(level, bx, by, x0, y0, x1, y1, tiles_off, tiles_len, idx_len) -> bytes:
    return struct.pack(
        ">BIIBBBBQQI", level, bx, by, x0, y0, x1, y1, tiles_off, tiles_len, idx_len
    )


def _unpack_block_def(blob: bytes) -> tuple:
    return struct.unpack(">BIIBBBBQQI", blob)


def write_versatiles(ds, path: str, tile_format="bin", compression="raw",
                     metadata: bytes | None = None, payload_col="payload"):
    """Tile Dataset (z, x, y, payload) -> a `.versatiles` archive.

    Single-writer funnel fed by a global sort on (block key, local
    row-major position) — the universal order translator replacing the
    reference's 256x256 traversal contract (writer.rs:165). Payloads
    are written as-is; `compression` only stamps the header (compress
    upstream via stages/transform.recompress).
    """
    def add_keys(batch: pa.Table) -> pa.Table:
        z = np.asarray(batch["z"], dtype=np.int64)
        x = np.asarray(batch["x"], dtype=np.int64)
        y = np.asarray(batch["y"], dtype=np.int64)
        bkey = (z << np.int64(48)) | ((x >> np.int64(8)) << np.int64(24)) | (y >> np.int64(8))
        lkey = ((y & np.int64(255)) << np.int64(8)) | (x & np.int64(255))
        batch = batch.append_column("_bkey", pa.array(bkey, type=pa.int64()))
        return batch.append_column("_lkey", pa.array(lkey, type=pa.int64()))

    sorted_ds = ds.map_batches(add_keys, batch_format="pyarrow").sort(["_bkey", "_lkey"])

    meta_blob = metadata if metadata is not None else b"{}"
    if compression == "gzip":
        import gzip as _gzip

        meta_blob = _gzip.compress(meta_blob, 6, mtime=0)
    elif compression == "br":
        meta_blob = brotli_stored.compress(meta_blob)

    block_defs = []
    geo_w = geo_s = geo_e = geo_n = None
    zmin, zmax = 31, 0

    with open(path, "wb") as f:
        f.write(b"\0" * HEADER_LENGTH)
        meta_off = f.tell()
        f.write(meta_blob)

        cur_bkey = None
        rows = None

        def flush_block():
            nonlocal cur_bkey, rows
            if cur_bkey is None or not rows:
                return
            z = cur_bkey >> 48
            bx = (cur_bkey >> 24) & ((1 << 24) - 1)
            by = cur_bkey & ((1 << 24) - 1)
            lx = np.asarray([r[0] & 255 for r in rows], dtype=np.int64)
            ly = np.asarray([r[1] & 255 for r in rows], dtype=np.int64)
            x0, x1 = int(lx.min()), int(lx.max())
            y0, y1 = int(ly.min()), int(ly.max())
            w = x1 - x0 + 1
            n_tiles = w * (y1 - y0 + 1)
            index = [(0, 0)] * n_tiles
            tiles_off = f.tell()
            hash_lookup = {}
            for (tx, ty, payload) in rows:
                if len(payload) == 0:
                    # the format cannot represent empty payloads: a
                    # length-0 index entry reads back as tile-absent
                    raise ValueError(
                        f"empty payload at z{z} ({tx},{ty}): .versatiles "
                        "cannot store zero-length tiles (drop or filter them first)"
                    )
                li = (int(ty & 255) - y0) * w + (int(tx & 255) - x0)
                if len(payload) < 1000 and payload in hash_lookup:
                    index[li] = hash_lookup[payload]
                    continue
                rel = f.tell() - tiles_off
                f.write(payload)
                index[li] = (rel, len(payload))
                if len(payload) < 1000:
                    hash_lookup[payload] = index[li]
            tiles_len = f.tell() - tiles_off
            idx_blob = brotli_stored.compress(
                b"".join(struct.pack(">QI", o, ln) for o, ln in index)
            )
            f.write(idx_blob)
            block_defs.append(
                _pack_block_def(int(z), int(bx), int(by), x0, y0, x1, y1,
                                tiles_off, tiles_len, len(idx_blob))
            )
            cur_bkey, rows = None, None

        for batch in sorted_ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
            bk = np.asarray(batch["_bkey"], dtype=np.int64)
            zcol = np.asarray(batch["z"], dtype=np.int64)
            xcol = np.asarray(batch["x"], dtype=np.int64)
            ycol = np.asarray(batch["y"], dtype=np.int64)
            payloads = batch[payload_col].to_pylist()
            for i in range(len(bk)):
                if cur_bkey is None or bk[i] != cur_bkey:
                    flush_block()
                    cur_bkey, rows = int(bk[i]), []
                rows.append((int(xcol[i]), int(ycol[i]), payloads[i]))
            # geo bbox per BATCH: tile_geo_bbox is array-capable, so
            # one vectorized call replaces a per-row Python call in the
            # single-writer funnel (80M rows = minutes of driver CPU)
            if len(bk):
                zmin = min(zmin, int(zcol.min()))
                zmax = max(zmax, int(zcol.max()))
                tw, ts, te, tn = tile_geo_bbox(zcol, xcol, ycol)
                bw, bs, be, bn = (float(np.min(tw)), float(np.min(ts)),
                                  float(np.max(te)), float(np.max(tn)))
                geo_w = bw if geo_w is None else min(geo_w, bw)
                geo_s = bs if geo_s is None else min(geo_s, bs)
                geo_e = be if geo_e is None else max(geo_e, be)
                geo_n = bn if geo_n is None else max(geo_n, bn)
        flush_block()

        blocks_off = f.tell()
        blocks_blob = brotli_stored.compress(b"".join(block_defs))
        f.write(blocks_blob)
        blocks_len = len(blocks_blob)

        if geo_w is None:
            geo_w = geo_s = geo_e = geo_n = 0.0
            zmin = zmax = 0
        f.seek(0)
        f.write(
            _pack_header(tile_format, compression, zmin, zmax,
                         (geo_w, geo_s, geo_e, geo_n),
                         meta_off, len(meta_blob), blocks_off, blocks_len)
        )
    return len(block_defs)


def read_versatiles_header(path: str) -> dict:
    from .data_reader import open_data_reader

    return _unpack_header(open_data_reader(path).read(0, HEADER_LENGTH))


def read_versatiles_metadata(path: str) -> bytes:
    from .data_reader import open_data_reader

    reader = open_data_reader(path)
    header = _unpack_header(reader.read(0, HEADER_LENGTH))
    off, ln = header["meta_range"]
    blob = reader.read(off, ln)
    comp = header["compression"]
    if comp == "gzip":
        import gzip as _gzip

        blob = _gzip.decompress(blob)
    elif comp == "br":
        blob = brotli_stored.decompress(blob)
    return blob


def _block_table(path: str):
    """Header + decoded block index -> (header, Arrow table of blocks)."""
    from .data_reader import open_data_reader

    reader = open_data_reader(path)
    header = _unpack_header(reader.read(0, HEADER_LENGTH))
    off, ln = header["blocks_range"]
    blob = brotli_stored.decompress(reader.read(off, ln)) if ln else b""
    assert len(blob) % BLOCK_DEF_LENGTH == 0, "defective block index"
    cols = {k: [] for k in
            ("level", "bx", "by", "x0", "y0", "x1", "y1", "tiles_off", "tiles_len", "idx_len")}
    for i in range(0, len(blob), BLOCK_DEF_LENGTH):
        vals = _unpack_block_def(blob[i : i + BLOCK_DEF_LENGTH])
        for k, v in zip(cols, vals):
            cols[k].append(int(v))
    table = pa.table({k: pa.array(v, type=pa.int64()) for k, v in cols.items()})
    return header, table


class _FetchVersatilesBlocks:
    """map_batches stage: block-definition rows -> tile rows.

    Per block: one range read for the tile index, one for the whole
    clustered tiles span; tiles slice out of the span (dedup'd tiles
    share a slice). Re-opens its own reader from the picklable path."""

    def __init__(self, path: str):
        from .data_reader import open_data_reader

        self.reader = open_data_reader(path)

    def __call__(self, batch: pa.Table) -> pa.Table:
        zs, xs, ys, payloads = [], [], [], []
        for row in range(batch.num_rows):
            level = int(batch["level"][row].as_py())
            bx = int(batch["bx"][row].as_py())
            by = int(batch["by"][row].as_py())
            x0 = int(batch["x0"][row].as_py())
            y0 = int(batch["y0"][row].as_py())
            x1 = int(batch["x1"][row].as_py())
            y1 = int(batch["y1"][row].as_py())
            tiles_off = int(batch["tiles_off"][row].as_py())
            tiles_len = int(batch["tiles_len"][row].as_py())
            idx_len = int(batch["idx_len"][row].as_py())
            idx_blob = brotli_stored.decompress(
                self.reader.read(tiles_off + tiles_len, idx_len)
            )
            span = self.reader.read(tiles_off, tiles_len)
            w = x1 - x0 + 1
            n = len(idx_blob) // 12
            for li in range(n):
                off, ln = struct.unpack_from(">QI", idx_blob, li * 12)
                if ln == 0:
                    continue
                zs.append(level)
                xs.append(bx * 256 + x0 + (li % w))
                ys.append(by * 256 + y0 + (li // w))
                payloads.append(span[off : off + ln])
        return pa.table(
            {
                "z": pa.array(zs, type=pa.int64()),
                "x": pa.array(xs, type=pa.int64()),
                "y": pa.array(ys, type=pa.int64()),
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )


def read_versatiles(path: str, blocks_per_task: int = 4):
    """`.versatiles` archive -> Dataset of (z, x, y, payload)."""
    import ray.data as rd

    _header, blocks = _block_table(path)
    if blocks.num_rows == 0:
        empty64 = pa.array([], type=pa.int64())
        return rd.from_arrow(
            pa.table({"z": empty64, "x": empty64, "y": empty64,
                      "payload": pa.array([], type=pa.binary())})
        )
    num_blocks = max(1, (blocks.num_rows + blocks_per_task - 1) // blocks_per_task)
    return rd.from_arrow(blocks).repartition(num_blocks).map_batches(
        _FetchVersatilesBlocks,
        batch_format="pyarrow",
        fn_constructor_kwargs={"path": path},
        concurrency=(1, 8),
    )
