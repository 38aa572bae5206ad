"""Tile-table containers: partitioned parquet (native), z/x/y directory,
mbtiles (sqlite), hilbert-ordered single file.

Ray-Data reformulations of the reference's writers
(versatiles_container/src/container/*/writer.rs, SURVEY.md §2.2):

- native layout: parquet partitioned per zoom level + `_manifest.jsonl`
  (the resumable primary sink — replaces the versatiles block format's
  role; blocks == row groups, block index == manifest);
- directory: `z/x/y.<ext>` files (directory/writer.rs semantics);
- mbtiles: sqlite `tiles(zoom_level, tile_column, tile_row, tile_data)`
  with the XYZ->TMS y flip (mbtiles/writer.rs:101-118) and batched
  transactions (4096 rows/txn, writer.rs:208), single writer funnel —
  same bottleneck the reference has (writer mutex, SURVEY.md §7.4);
- hilbert-ordered parquet: global sort by hilbert key then sequential
  single-writer append (pmtiles/writer.rs:111 analogue).
"""

from __future__ import annotations

import json
import os
import sqlite3

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def write_directory_tiles(ds, out_dir: str, payload_col="payload", ext="bin"):
    """`z/x/y.ext` files. Distributed: each batch writes its own files."""

    def write_batch(batch: pa.Table) -> pa.Table:
        z = np.asarray(batch["z"], dtype=np.int64)
        x = np.asarray(batch["x"], dtype=np.int64)
        y = np.asarray(batch["y"], dtype=np.int64)
        payload = batch[payload_col].to_pylist()
        for zi, xi, yi, data in zip(z.tolist(), x.tolist(), y.tolist(), payload):
            d = os.path.join(out_dir, str(zi), str(xi))
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, f"{yi}.{ext}"), "wb") as f:
                f.write(data if isinstance(data, bytes) else bytes(data))
        return pa.table({"written": pa.array([len(z)], type=pa.int64())})

    counts = ds.map_batches(write_batch, batch_format="pyarrow")
    return sum(r["written"] for r in counts.take_all())


def read_directory_tiles(out_dir: str, ext="bin"):
    """Read a z/x/y directory back into (z, x, y, payload) rows."""
    import ray.data as rd

    paths = []
    for root, _dirs, files in os.walk(out_dir):
        for fn in files:
            if fn.endswith("." + ext):
                paths.append(os.path.join(root, fn))

    def parse(batch: dict) -> pa.Table:
        zs, xs, ys, payloads = [], [], [], []
        for path, data in zip(batch["path"], batch["bytes"]):
            rel = os.path.relpath(path, out_dir)
            z, x, yext = rel.split(os.sep)
            zs.append(int(z))
            xs.append(int(x))
            ys.append(int(yext.split(".")[0]))
            payloads.append(data)
        return pa.table(
            {
                "z": pa.array(zs, type=pa.int64()),
                "x": pa.array(xs, type=pa.int64()),
                "y": pa.array(ys, type=pa.int64()),
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )

    ds = rd.read_binary_files(paths, include_paths=True)
    return ds.map_batches(parse, batch_format="numpy")


MBTILES_TXN_ROWS = 4096  # mbtiles/writer.rs:208


def write_mbtiles(ds, path: str, payload_col="payload", metadata=None):
    """Single-writer sqlite sink with TMS flip; driver-side funnel.

    sqlite is single-writer (like the reference's mutex-guarded
    writer); the upstream stays wide and funnels here via
    iter_batches. Returns rows written.
    """
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE metadata (name TEXT, value TEXT)")
    con.execute(
        "CREATE TABLE tiles (zoom_level INTEGER, tile_column INTEGER, "
        "tile_row INTEGER, tile_data BLOB)"
    )
    con.execute(
        "CREATE UNIQUE INDEX tile_index ON tiles (zoom_level, tile_column, tile_row)"
    )
    for k, v in (metadata or {}).items():
        con.execute("INSERT INTO metadata VALUES (?, ?)", (k, str(v)))
    rows = 0
    buffer = []
    for batch in ds.iter_batches(batch_size=MBTILES_TXN_ROWS, batch_format="pyarrow"):
        z = np.asarray(batch["z"], dtype=np.int64)
        y = np.asarray(batch["y"], dtype=np.int64)
        tms_row = (np.int64(1) << z) - 1 - y  # XYZ -> TMS (writer.rs:101-118)
        buffer = list(
            zip(
                z.tolist(),
                np.asarray(batch["x"], dtype=np.int64).tolist(),
                tms_row.tolist(),
                batch[payload_col].to_pylist(),
            )
        )
        con.executemany("INSERT INTO tiles VALUES (?, ?, ?, ?)", buffer)
        con.commit()
        rows += len(buffer)
    con.close()
    return rows


class _ReadMbtilesShard:
    """map_batches stage: (lo, hi) rowid-range rows -> tile rows.

    Each actor holds its own read-only sqlite connection; shards are
    disjoint rowid ranges so tasks never contend (sqlite is
    single-writer but many-reader)."""

    def __init__(self, path: str):
        # Ray actor pools may run __call__ on a different thread than
        # __init__; sqlite connections are thread-affine by default
        self.con = sqlite3.connect(f"file:{path}?mode=ro", uri=True, check_same_thread=False)

    def __call__(self, batch: pa.Table) -> pa.Table:
        zs, xs, tms_list, payloads = [], [], [], []
        for lo, hi in zip(
            np.asarray(batch["lo"], dtype=np.int64).tolist(),
            np.asarray(batch["hi"], dtype=np.int64).tolist(),
        ):
            for r in self.con.execute(
                "SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles "
                "WHERE rowid BETWEEN ? AND ?",
                (lo, hi),
            ):
                zs.append(r[0])
                xs.append(r[1])
                tms_list.append(r[2])
                payloads.append(r[3])
        z = np.asarray(zs, dtype=np.int64)
        tms = np.asarray(tms_list, dtype=np.int64)
        return pa.table(
            {
                "z": pa.array(z),
                "x": pa.array(np.asarray(xs, dtype=np.int64)),
                "y": pa.array((np.int64(1) << z) - 1 - tms if len(z) else z),
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )


def read_mbtiles(path: str, rows_per_shard: int = 65536):
    """Read an mbtiles file into (z, x, y, payload) with the TMS->XYZ flip.

    Sharded: the driver only reads the rowid extent; disjoint rowid
    ranges fan out as Dataset read tasks (mbtiles/reader.rs scans the
    whole table in one process — here the scan parallelizes and the
    driver never holds the archive)."""
    import ray.data as rd

    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    lo, hi = con.execute("SELECT min(rowid), max(rowid) FROM tiles").fetchone()
    con.close()
    if lo is None:
        empty64 = pa.array([], type=pa.int64())
        return rd.from_arrow(
            pa.table({"z": empty64, "x": empty64, "y": empty64,
                      "payload": pa.array([], type=pa.binary())})
        )
    bounds = list(range(int(lo), int(hi) + 1, rows_per_shard))
    spec = pa.table(
        {
            "lo": pa.array(bounds, type=pa.int64()),
            "hi": pa.array(
                [min(b + rows_per_shard - 1, int(hi)) for b in bounds], type=pa.int64()
            ),
        }
    )
    return rd.from_arrow(spec).repartition(len(bounds)).map_batches(
        _ReadMbtilesShard,
        batch_format="pyarrow",
        fn_constructor_kwargs={"path": path},
        concurrency=(1, 8),
    )


def write_tar_tiles(ds, path: str, payload_col="payload", ext="bin", metadata=None):
    """`z/x/y.ext` entries in a tar archive (tar/writer.rs semantics)
    + `tiles.json` metadata entry. Single-writer funnel like mbtiles."""
    import io
    import json
    import tarfile

    with tarfile.open(path, "w") as tar:
        if metadata is not None:
            data = json.dumps(metadata).encode()
            info = tarfile.TarInfo("tiles.json")
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
        rows = 0
        for batch in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
            z = np.asarray(batch["z"], dtype=np.int64)
            x = np.asarray(batch["x"], dtype=np.int64)
            y = np.asarray(batch["y"], dtype=np.int64)
            for zi, xi, yi, data in zip(
                z.tolist(), x.tolist(), y.tolist(), batch[payload_col].to_pylist()
            ):
                info = tarfile.TarInfo(f"{zi}/{xi}/{yi}.{ext}")
                info.size = len(data)
                tar.addfile(info, io.BytesIO(data))
                rows += 1
    return rows


class _FetchTarPayloads:
    """map_batches stage: tar-index rows (z,x,y,off,len) -> tile rows.

    Payload bytes come from range reads through sources/data_reader
    (coalesced per batch when dense) — works over http(s):// too, and
    the archive body never passes through the driver."""

    def __init__(self, path: str):
        from .data_reader import open_data_reader

        self.reader = open_data_reader(path)

    def __call__(self, batch: pa.Table) -> pa.Table:
        offs = np.asarray(batch["off"], dtype=np.int64)
        lens = np.asarray(batch["len"], dtype=np.int64)
        if len(offs) == 0:
            payloads = []
        else:
            start = int(offs.min())
            end = int((offs + lens).max())
            if int(lens.sum()) * 2 >= end - start:
                blob = self.reader.read(start, end - start)
                payloads = [
                    blob[int(o) - start : int(o) - start + int(l)]
                    for o, l in zip(offs, lens)
                ]
            else:
                payloads = [
                    self.reader.read(int(o), int(l)) for o, l in zip(offs, lens)
                ]
        return pa.table(
            {
                "z": batch["z"],
                "x": batch["x"],
                "y": batch["y"],
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )


def read_tar_tiles(path: str, ext="bin", entries_per_shard: int = 4096):
    """Read a tar tile archive back into (z, x, y, payload) rows.

    Sharded: the driver scans only the tar HEADERS (member name,
    data offset, size — tar/reader.rs builds the same index), then
    index blocks fan out as Dataset tasks that range-read their
    members' byte spans."""
    import tarfile

    import ray.data as rd

    # detect compression from the FILE MAGIC, not the extension — a
    # .tgz (or mislabeled .tar) still opens via tarfile's transparent
    # mode, and offset_data would index the decompressed stream
    with open(path, "rb") as _f:
        head = _f.read(6)
    compressed = (
        head[:2] == b"\x1f\x8b" or head[:3] == b"BZh"
        or head[:6] == b"\xfd7zXZ\x00"
    )
    zs, xs, ys, offs, lens, payloads = [], [], [], [], [], []
    with tarfile.open(path) as tar:
        for member in tar.getmembers():
            if not member.name.endswith("." + ext):
                continue
            z, x, yext = member.name.split("/")
            zs.append(int(z))
            xs.append(int(x))
            ys.append(int(yext.split(".")[0]))
            if compressed:
                # offset_data indexes the DECOMPRESSED stream — range
                # reads on the file would be wrong; extract inline
                payloads.append(tar.extractfile(member).read())
            else:
                offs.append(member.offset_data)
                lens.append(member.size)
    if compressed:
        return rd.from_arrow(
            pa.table(
                {
                    "z": pa.array(zs, type=pa.int64()),
                    "x": pa.array(xs, type=pa.int64()),
                    "y": pa.array(ys, type=pa.int64()),
                    "payload": pa.array(payloads, type=pa.binary()),
                }
            )
        )
    spec = pa.table(
        {
            "z": pa.array(zs, type=pa.int64()),
            "x": pa.array(xs, type=pa.int64()),
            "y": pa.array(ys, type=pa.int64()),
            "off": pa.array(offs, type=pa.int64()),
            "len": pa.array(lens, type=pa.int64()),
        }
    )
    num_blocks = max(1, (len(zs) + entries_per_shard - 1) // entries_per_shard)
    return rd.from_arrow(spec).repartition(num_blocks).map_batches(
        _FetchTarPayloads,
        batch_format="pyarrow",
        fn_constructor_kwargs={"path": path},
        concurrency=(1, 8),
    )


def write_hilbert_parquet(ds, path: str):
    """Hilbert-sorted single parquet file (pmtiles-order analogue).

    Global `sort("hilbert")` (the universal order translator,
    SURVEY.md §4 ordering row) then one sequential writer appends row
    groups in stream order.
    """
    sorted_ds = ds.sort("hilbert")
    writer = None
    rows = 0
    for batch in sorted_ds.iter_batches(batch_size=64 * 1024, batch_format="pyarrow"):
        if writer is None:
            writer = pq.ParquetWriter(path, batch.schema)
        writer.write_table(batch)
        rows += batch.num_rows
    if writer is not None:
        writer.close()
    return rows


def read_mbtiles_metadata(path: str) -> dict:
    """mbtiles metadata table -> TileJSON-shaped dict (mbtiles spec:
    the `json` row carries vector_layers etc.; numeric/tuple fields
    parsed like the reference's metadata ingestion)."""
    import sqlite3

    con = sqlite3.connect(path)
    rows = con.execute("SELECT name, value FROM metadata").fetchall()
    con.close()
    meta = {}
    for k, v in rows:
        if k == "json":
            try:
                meta.update(json.loads(v))
            except (ValueError, TypeError):
                meta[k] = v
        elif k in ("minzoom", "maxzoom"):
            meta[k] = int(v)
        elif k in ("bounds", "center"):
            meta[k] = [float(x) for x in str(v).split(",")]
        else:
            meta[k] = v
    return meta


def container_metadata(path: str) -> dict:
    """TileJSON-shaped metadata of any container (the surface behind
    `dev print-tilejson`, dev_tools/print_tilejson.rs)."""
    import os
    import tarfile

    if path.endswith(".mbtiles"):
        return read_mbtiles_metadata(path)
    if path.endswith(".pmtiles"):
        from .pmtiles import read_pmtiles_metadata

        return read_pmtiles_metadata(path) or {}
    if path.endswith(".versatiles"):
        from .versatiles import read_versatiles_metadata

        blob = read_versatiles_metadata(path)
        try:
            return json.loads(blob) if blob else {}
        except (ValueError, TypeError):
            return {}
    if os.path.isdir(path):
        p = os.path.join(path, "tiles.json")
        if os.path.exists(p):
            return json.loads(open(p).read())
        return {}
    if tarfile.is_tarfile(path):
        with tarfile.open(path) as tf:
            for m in tf.getmembers():
                if m.name.removeprefix("./") == "tiles.json":
                    return json.loads(tf.extractfile(m).read())
        return {}
    return {}
