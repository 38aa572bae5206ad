"""Random-access tile readers: the `versatiles serve` fast path.

The reference serves `/tiles/{id}/{z}/{x}/{y}` by container random
access (block index + cached tile index,
versatiles/src/server/tile_server.rs, versatiles reader
LimitedCache — SURVEY.md §3.3). Here the analogues:

- PMTilesRandomAccess: header + directories parsed once (the decoded
  directory IS the reference's cached tile index), each get_tile is
  one range read into the data section;
- PyramidRandomAccess: the native partitioned-parquet layout probed
  by zoom partition + parquet row-group predicate pushdown on tkey.

Both are validation harnesses for written pyramids (read back single
tiles without scanning) and the building blocks a serving layer would
pool in actors.
"""

from __future__ import annotations

import gzip
import struct

import numpy as np

from ..core.coords import hilbert_index
from .pmtiles import COMPRESSION_GZIP, MAGIC, VERSION, _decode_directory


_EMPTY_IDS = np.zeros(0, dtype=np.int64)


def _sizeof_dir(v) -> int:
    entries, ids = v
    return 64 * len(entries) + ids.nbytes + 64


class PMTilesRandomAccess:
    """Open once, then O(log n) get_tile by binary search on tile ids.

    Works over local paths AND http(s):// URLs: every access is a
    range read through sources/data_reader (the reference's remote
    fast path, data_reader_http.rs + versatiles reader LimitedCache).
    """

    def __init__(self, path: str):
        from .data_reader import open_data_reader

        self.path = path
        self._reader = open_data_reader(path)
        header = self._reader.read(0, 127)
        assert header[0:7] == MAGIC and header[7] == VERSION
        self.header_bytes = header  # raw 127-byte header (spec layout)
        (root_off, root_len, _m_off, _m_len, self.leaf_off, _l_len,
         self.data_off, _d_len) = struct.unpack_from("<QQQQQQQQ", header, 8)
        self._internal = header[97]
        self.root = _decode_directory(
            self._maybe_gunzip(self._reader.read(root_off, root_len))
        )
        self._root_ids = np.asarray([e[0] for e in self.root], dtype=np.int64)
        # leaf offset -> decoded entries, byte-bounded LRU (reference
        # LimitedCache, versatiles reader.rs:135)
        from ..core.cache import LimitedCache

        self._leaf_cache = LimitedCache(size_of=_sizeof_dir)

    def _maybe_gunzip(self, b: bytes) -> bytes:
        return gzip.decompress(b) if self._internal == COMPRESSION_GZIP else b

    def _entries_for(self, tid: int):
        """-> (entries, ids): the id array is built ONCE per directory
        and cached beside the entries (the serve fast path must not
        rebuild a 16k-element numpy array per tile request)."""
        idx = int(np.searchsorted(self._root_ids, tid, side="right")) - 1
        if idx < 0:
            return [], _EMPTY_IDS
        entry = self.root[idx]
        if entry[3] == 0:  # leaf pointer
            off, ln = entry[1], entry[2]
            hit = self._leaf_cache.get(off)
            if hit is None:
                entries = _decode_directory(
                    self._maybe_gunzip(self._reader.read(self.leaf_off + off, ln))
                )
                ids = np.asarray([e[0] for e in entries], dtype=np.int64)
                hit = self._leaf_cache.put(off, (entries, ids))
            return hit
        return self.root, self._root_ids

    def get_tile(self, z: int, x: int, y: int):
        if not (0 <= x < (1 << z) and 0 <= y < (1 << z)):
            return None  # hilbert_index would alias out-of-range coords
        tid = int(hilbert_index(z, x, y))
        entries, ids = self._entries_for(tid)
        i = int(np.searchsorted(ids, tid, side="right")) - 1
        if i < 0:
            return None
        etid, off, ln, rl = entries[i]
        if not (etid <= tid < etid + max(rl, 1)):
            return None
        return self._reader.read(self.data_off + off, ln)


class VersatilesRandomAccess:
    """`.versatiles` container: block index parsed once; per-block
    tile indices decoded lazily and cached (the reference reader's
    LimitedCache, versatiles reader.rs:135,325-355). Each get_tile is
    one range read of exactly the tile's bytes."""

    def __init__(self, path: str):
        from .data_reader import open_data_reader
        from .versatiles import _block_table

        self.path = path
        self._reader = open_data_reader(path)
        self.header, blocks = _block_table(path)
        self._blocks = {}  # (level, bx, by) -> row dict
        for i in range(blocks.num_rows):
            row = {c: int(blocks[c][i].as_py()) for c in blocks.column_names}
            self._blocks[(row["level"], row["bx"], row["by"])] = row
        # (level,bx,by) -> decoded tile index bytes, byte-bounded LRU
        # (reference LimitedCache, versatiles reader.rs:135)
        from ..core.cache import LimitedCache

        self._idx_cache = LimitedCache()

    def get_tile(self, z: int, x: int, y: int):
        import struct as _struct

        from ..core import brotli_stored

        key = (z, x // 256, y // 256)
        blk = self._blocks.get(key)
        if blk is None:
            return None
        cx, cy = x % 256, y % 256
        if not (blk["x0"] <= cx <= blk["x1"] and blk["y0"] <= cy <= blk["y1"]):
            return None
        idx = self._idx_cache.get(key)
        if idx is None:
            idx = self._idx_cache.put(key, brotli_stored.decompress(
                self._reader.read(blk["tiles_off"] + blk["tiles_len"], blk["idx_len"])
            ))
        w = blk["x1"] - blk["x0"] + 1
        li = (cy - blk["y0"]) * w + (cx - blk["x0"])
        off, ln = _struct.unpack_from(">QI", idx, li * 12)
        if ln == 0:
            return None
        return self._reader.read(blk["tiles_off"] + off, ln)


class MBTilesRandomAccess:
    """SQLite point lookup with the XYZ->TMS y-flip
    (mbtiles reader.rs get_tile semantics)."""

    def __init__(self, path: str):
        import sqlite3

        self.con = sqlite3.connect(f"file:{path}?mode=ro", uri=True,
                                   check_same_thread=False)

    def get_tile(self, z: int, x: int, y: int):
        row = self.con.execute(
            "SELECT tile_data FROM tiles WHERE zoom_level=? AND tile_column=? "
            "AND tile_row=?",
            (z, x, (1 << z) - 1 - y),
        ).fetchone()
        return None if row is None else row[0]


class DirectoryRandomAccess:
    """z/x/y.ext file tree: get_tile is one os.path probe + read."""

    def __init__(self, out_dir: str):
        import glob
        import os

        self.out_dir = out_dir
        probe = glob.glob(os.path.join(out_dir, "*", "*", "*.*"))
        self.ext = probe[0].rsplit(".", 1)[1] if probe else "bin"

    def get_tile(self, z: int, x: int, y: int):
        import os

        p = os.path.join(self.out_dir, str(z), str(x), f"{y}.{self.ext}")
        if not os.path.isfile(p):
            return None
        with open(p, "rb") as f:
            return f.read()


def open_random_access(path: str):
    """Dispatch a container path to its random-access reader — the
    registry the serving layer uses (reference:
    container_registry.rs get_reader_from_str + tile_server fast path)."""
    import os

    if path.endswith(".pmtiles"):
        return PMTilesRandomAccess(path)
    if path.endswith(".versatiles"):
        return VersatilesRandomAccess(path)
    if path.endswith(".mbtiles"):
        return MBTilesRandomAccess(path)
    if os.path.isdir(path):
        if os.path.isdir(os.path.join(path, "z=0")) or any(
            d.startswith("z=") for d in os.listdir(path)
        ):
            return PyramidRandomAccess(path)
        return DirectoryRandomAccess(path)
    raise ValueError(f"no random-access reader for {path!r}")


class PyramidRandomAccess:
    """Native pyramid layout: per-zoom parquet probed with a tkey
    predicate (row-group pushdown does the index's job)."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir

    def get_tile(self, z: int, x: int, y: int):
        import os

        import pyarrow.dataset as pads

        from ..stages.assign import pack_tkey

        part = os.path.join(self.out_dir, f"z={z}")
        if not os.path.isdir(part):
            return None
        tkey = int(pack_tkey(np.int64(z), np.int64(x), np.int64(y)))
        dataset = pads.dataset(part, format="parquet")
        table = dataset.to_table(filter=pads.field("tkey") == tkey)
        if table.num_rows == 0:
            return None
        return {c: table[c][0].as_py() for c in table.column_names}
