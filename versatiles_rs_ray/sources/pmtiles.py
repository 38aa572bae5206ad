"""PMTiles v3 container: reader + single-writer sink.

Implements the public PMTiles v3 spec (protomaps): 127-byte header,
varint delta-encoded directories (gzip), Hilbert tile ids, optional
leaf directories, clustered tile data. The engine analogue of the
reference's pmtiles writer (versatiles_container/src/container/pmtiles/
writer.rs:78-130: Hilbert-sorted chunks, gzip directories/metadata) —
here the global ``sort("hilbert")`` replaces the traversal contract
and a single writer streams the sorted batches (SURVEY.md §7.4 hard
part 5: funnel only at the very end).

Tile ids use the engine's level-offset Hilbert index
(core/coords.hilbert_index, golden-matched to the reference's
tile_hilbert_index.rs) — identical to the PMTiles tileId construction
(cumulative 4^z offset + Hilbert position).
"""

from __future__ import annotations

import gzip
import json
import struct

import numpy as np
import pyarrow as pa

from ..core.coords import hilbert_index, hilbert_to_coord

MAGIC = b"PMTiles"
VERSION = 3
HEADER_SIZE = 127
MAX_DIR_ENTRIES = 16384

COMPRESSION_NONE = 1
COMPRESSION_GZIP = 2
TILETYPE_UNKNOWN = 0
TILETYPE_MVT = 1


def _write_varint(out: bytearray, v: int):
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, pos: int):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _encode_directory(entries) -> bytes:
    """entries: list of (tile_id, offset, length, run_length)."""
    out = bytearray()
    _write_varint(out, len(entries))
    last_id = 0
    for tid, _off, _ln, _rl in entries:
        _write_varint(out, tid - last_id)
        last_id = tid
    for _tid, _off, _ln, rl in entries:
        _write_varint(out, rl)
    for _tid, _off, ln, _rl in entries:
        _write_varint(out, ln)
    prev_off = prev_len = None
    for _tid, off, ln, _rl in entries:
        if prev_off is not None and off == prev_off + prev_len:
            _write_varint(out, 0)  # continuation
        else:
            _write_varint(out, off + 1)
        prev_off, prev_len = off, ln
    return bytes(out)


def _decode_directory(buf: bytes):
    pos = 0
    n, pos = _read_varint(buf, pos)
    tids = []
    last = 0
    for _ in range(n):
        d, pos = _read_varint(buf, pos)
        last += d
        tids.append(last)
    rls = []
    for _ in range(n):
        v, pos = _read_varint(buf, pos)
        rls.append(v)
    lens = []
    for _ in range(n):
        v, pos = _read_varint(buf, pos)
        lens.append(v)
    offs = []
    for i in range(n):
        v, pos = _read_varint(buf, pos)
        if v == 0:
            offs.append(offs[-1] + lens[i - 1])
        else:
            offs.append(v - 1)
    return list(zip(tids, offs, lens, rls))


def write_pmtiles(ds, path: str, metadata=None, tile_type=TILETYPE_UNKNOWN,
                  tile_compression=COMPRESSION_NONE, payload_col="payload"):
    """Hilbert-sort the tile table and write a PMTiles v3 archive."""

    def add_hilbert(batch: pa.Table) -> pa.Table:
        h = hilbert_index(
            np.asarray(batch["z"], dtype=np.int64),
            np.asarray(batch["x"], dtype=np.int64),
            np.asarray(batch["y"], dtype=np.int64),
        )
        return batch.append_column("_tid", pa.array(h, type=pa.int64()))

    sorted_ds = ds.map_batches(add_hilbert, batch_format="pyarrow").sort("_tid")

    entries = []
    data = bytearray()
    zmin, zmax = 31, 0
    for batch in sorted_ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
        tids = np.asarray(batch["_tid"], dtype=np.int64)
        zs = np.asarray(batch["z"], dtype=np.int64)
        if len(zs):
            zmin = min(zmin, int(zs.min()))
            zmax = max(zmax, int(zs.max()))
        for tid, payload in zip(tids.tolist(), batch[payload_col].to_pylist()):
            if entries:
                ptid, poff, plen, prl = entries[-1]
                # run-length coalesce: consecutive hilbert ids with an
                # IDENTICAL payload extend the previous entry (pmtiles
                # v3 dedup — what real writers emit for ocean tiles)
                if tid == ptid + prl and plen == len(payload) \
                        and data[poff:poff + plen] == payload:
                    entries[-1] = (ptid, poff, plen, prl + 1)
                    continue
            entries.append((tid, len(data), len(payload), 1))
            data.extend(payload)

    meta_bytes = gzip.compress(json.dumps(metadata or {}).encode(), mtime=0)

    if len(entries) <= MAX_DIR_ENTRIES:
        root = gzip.compress(_encode_directory(entries), mtime=0)
        leaves = b""
    else:
        # leaf directories: root entries with run_length=0 point at leaves
        root_entries = []
        leaves_buf = bytearray()
        for i in range(0, len(entries), MAX_DIR_ENTRIES):
            chunk = entries[i : i + MAX_DIR_ENTRIES]
            blob = gzip.compress(_encode_directory(chunk), mtime=0)
            root_entries.append((chunk[0][0], len(leaves_buf), len(blob), 0))
            leaves_buf.extend(blob)
        root = gzip.compress(_encode_directory(root_entries), mtime=0)
        leaves = bytes(leaves_buf)

    root_off = HEADER_SIZE
    meta_off = root_off + len(root)
    leaf_off = meta_off + len(meta_bytes)
    data_off = leaf_off + len(leaves)

    header = bytearray(HEADER_SIZE)
    header[0:7] = MAGIC
    header[7] = VERSION
    struct.pack_into("<QQQQQQQQ", header, 8,
                     root_off, len(root), meta_off, len(meta_bytes),
                     leaf_off, len(leaves), data_off, len(data))
    addressed = sum(e[3] for e in entries)  # total tiles incl. run-coalesced
    struct.pack_into("<QQQ", header, 72, addressed, len(entries), len(entries))
    header[96] = 1  # clustered
    header[97] = COMPRESSION_GZIP  # internal compression
    header[98] = tile_compression
    header[99] = tile_type
    header[100] = zmin if entries else 0
    header[101] = zmax if entries else 0
    struct.pack_into("<iiii", header, 102,
                     int(-180 * 1e7), int(-85.05112877 * 1e7),
                     int(180 * 1e7), int(85.05112877 * 1e7))
    header[118] = zmin if entries else 0
    struct.pack_into("<ii", header, 119, 0, 0)

    with open(path, "wb") as f:
        f.write(header)
        f.write(root)
        f.write(meta_bytes)
        f.write(leaves)
        f.write(data)
    return addressed


def read_pmtiles_entries(path: str):
    """Parse header + directories -> (entries list, data_off).

    Works over local paths AND http(s):// URLs (range reads only; the
    directory section is tiny — reference remote-source semantics,
    data_reader_http.rs)."""
    from .data_reader import open_data_reader

    reader = open_data_reader(path)
    header = reader.read(0, HEADER_SIZE)
    assert header[0:7] == MAGIC and header[7] == VERSION, "not a PMTiles v3 file"
    (root_off, root_len, _meta_off, _meta_len, leaf_off, _leaf_len,
     data_off, _data_len) = struct.unpack_from("<QQQQQQQQ", header, 8)
    internal = header[97]

    def _maybe_gunzip(b):
        return gzip.decompress(b) if internal == COMPRESSION_GZIP else b

    root = _decode_directory(_maybe_gunzip(reader.read(root_off, root_len)))
    entries = []
    for tid, off, ln, rl in root:
        if rl == 0:  # leaf pointer
            leaf = _decode_directory(_maybe_gunzip(reader.read(leaf_off + off, ln)))
            entries.extend(leaf)
        else:
            entries.append((tid, off, ln, rl))
    return entries, data_off


class _FetchPMTilesPayloads:
    """map_batches stage: (tid, off, ln) entry rows -> tile rows.

    Each task re-opens its own reader from the URL/path and issues ONE
    coalesced range read per batch when the batch's entries are dense
    (they are — the archive is clustered in Hilbert order), falling
    back to per-entry reads on sparse batches.
    """

    def __init__(self, path: str, data_off: int):
        from .data_reader import open_data_reader

        self.reader = open_data_reader(path)
        self.data_off = data_off

    def __call__(self, batch: pa.Table) -> pa.Table:
        tids = np.asarray(batch["tid"], dtype=np.int64)
        offs = np.asarray(batch["off"], dtype=np.int64)
        lens = np.asarray(batch["len"], dtype=np.int64)
        if len(tids) == 0:
            empty64 = pa.array([], type=pa.int64())
            return pa.table({"z": empty64, "x": empty64, "y": empty64,
                             "payload": pa.array([], type=pa.binary())})
        start = int(offs.min())
        end = int((offs + lens).max())
        if int(lens.sum()) * 2 >= end - start:  # dense -> one range read
            blob = self.reader.read(self.data_off + start, end - start)
            payloads = [
                blob[int(o) - start : int(o) - start + int(l)]
                for o, l in zip(offs, lens)
            ]
        else:  # sparse -> per-entry reads
            payloads = [
                self.reader.read(self.data_off + int(o), int(l))
                for o, l in zip(offs, lens)
            ]
        zs = np.empty(len(tids), dtype=np.int64)
        xs = np.empty(len(tids), dtype=np.int64)
        ys = np.empty(len(tids), dtype=np.int64)
        for i, tid in enumerate(tids.tolist()):
            zs[i], xs[i], ys[i] = hilbert_to_coord(tid)
        return pa.table(
            {
                "z": pa.array(zs, type=pa.int64()),
                "x": pa.array(xs, type=pa.int64()),
                "y": pa.array(ys, type=pa.int64()),
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )


def read_pmtiles(path: str, entries_per_block: int = 4096):
    """PMTiles archive -> Dataset of (z, x, y, payload).

    Distributed: the (small) directory is decoded on the driver, then
    entry blocks fan out as Dataset tasks that each range-read their
    own clustered byte span — no whole-archive driver read, and the
    same code path serves local files and http(s):// URLs.
    """
    import ray.data as rd

    entries, data_off = read_pmtiles_entries(path)
    # expand run-length entries: rl=N means tile ids tid..tid+N-1 all
    # share this payload span (pmtiles v3 dedup for e.g. ocean tiles);
    # both our writer (which coalesces identical consecutive payloads)
    # and foreign archives produce rl>1 entries
    tid = np.asarray([e[0] for e in entries], dtype=np.int64)
    off = np.asarray([e[1] for e in entries], dtype=np.int64)
    ln = np.asarray([e[2] for e in entries], dtype=np.int64)
    rl = np.maximum(np.asarray([e[3] for e in entries], dtype=np.int64), 1)
    if (rl > 1).any():
        total = int(rl.sum())
        starts = np.zeros(len(rl), dtype=np.int64)
        starts[1:] = np.cumsum(rl)[:-1]
        within = np.arange(total, dtype=np.int64) - np.repeat(starts, rl)
        tid = np.repeat(tid, rl) + within
        off = np.repeat(off, rl)
        ln = np.repeat(ln, rl)
    table = pa.table(
        {
            "tid": pa.array(tid, type=pa.int64()),
            "off": pa.array(off, type=pa.int64()),
            "len": pa.array(ln, type=pa.int64()),
        }
    )
    num_blocks = max(1, (table.num_rows + entries_per_block - 1) // entries_per_block)
    return rd.from_arrow(table).repartition(num_blocks).map_batches(
        _FetchPMTilesPayloads,
        batch_format="pyarrow",
        fn_constructor_kwargs={"path": path, "data_off": data_off},
        concurrency=(1, 8),
    )


def read_pmtiles_metadata(path: str) -> dict:
    from .data_reader import open_data_reader

    reader = open_data_reader(path)
    header = reader.read(0, HEADER_SIZE)
    meta_off, meta_len = struct.unpack_from("<QQ", header, 24)
    internal = header[97]
    blob = reader.read(meta_off, meta_len)
    if internal == COMPRESSION_GZIP:
        blob = gzip.decompress(blob)
    return json.loads(blob)
