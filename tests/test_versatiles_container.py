"""The versatiles binary container: write -> read-back equality,
block/index layout sanity, tile dedup, HTTP reads."""

import struct

import numpy as np
import pyarrow as pa

from versatiles_rs_ray.core import brotli_stored
from versatiles_rs_ray.core.bbox import TileBBoxPyramid
from versatiles_rs_ray.sources import versatiles as VT
from versatiles_rs_ray.sources.debug_tiles import json_debug_tiles


def test_brotli_stored_roundtrip():
    import os

    for data in [b"", b"x", b"hello" * 1000, os.urandom(70000)]:
        assert brotli_stored.decompress_stored(brotli_stored.compress_stored(data)) == data
    # entropy-coded stream is refused with a clear gate message
    import pytest

    with pytest.raises(NotImplementedError):
        brotli_stored.decompress_stored(b"\x1b\x00\x00")  # wbits!=16 short form


def test_versatiles_roundtrip(ray_session, tmp_path):
    ds = json_debug_tiles(TileBBoxPyramid.new_full(4, 0))  # 341 tiles
    path = str(tmp_path / "t.versatiles")
    n_blocks = VT.write_versatiles(
        ds, path, tile_format="json", metadata=b'{"name":"t"}'
    )
    assert n_blocks == 5  # z0..4 each fit one 256x256 block
    header = VT.read_versatiles_header(path)
    assert header["tile_format"] == "json"
    assert header["zoom_range"] == (0, 4)
    assert abs(header["geo_bbox"][0] + 180.0) < 1e-6
    assert VT.read_versatiles_metadata(path) == b'{"name":"t"}'

    back = VT.read_versatiles(path).to_pandas()
    assert len(back) == 341
    got = {(r.z, r.x, r.y): bytes(r.payload) for r in back.itertuples()}
    assert got[(4, 3, 7)] == b'{"x":3,"y":7,"z":4}'
    assert got[(0, 0, 0)] == b'{"x":0,"y":0,"z":0}'


def test_versatiles_magic_and_header_size(ray_session, tmp_path):
    ds = json_debug_tiles(TileBBoxPyramid.new_full(1, 1))
    path = str(tmp_path / "h.versatiles")
    VT.write_versatiles(ds, path)
    raw = open(path, "rb").read()
    assert raw[:14] == b"versatiles_v02"
    assert len(raw) > VT.HEADER_LENGTH
    # block index parses as stored brotli of 33-byte records
    h = VT._unpack_header(raw[:66])
    off, ln = h["blocks_range"]
    blob = brotli_stored.decompress(raw[off : off + ln])
    assert len(blob) % 33 == 0 and len(blob) // 33 == 1


def test_versatiles_small_tile_dedup(ray_session, tmp_path):
    """Identical small tiles within a block share one byte range
    (block_writer.rs:56-67 semantics)."""
    import ray.data as rd

    rows = [(5, x, y, b"SAME") for x in range(4) for y in range(4)]
    t = pa.table(
        {
            "z": pa.array([r[0] for r in rows], type=pa.int64()),
            "x": pa.array([r[1] for r in rows], type=pa.int64()),
            "y": pa.array([r[2] for r in rows], type=pa.int64()),
            "payload": pa.array([r[3] for r in rows], type=pa.binary()),
        }
    )
    path = str(tmp_path / "d.versatiles")
    VT.write_versatiles(rd.from_arrow(t), path)
    h = VT.read_versatiles_header(path)
    # tiles span holds ONE copy of b"SAME"
    _, blocks = VT._block_table(path)
    assert blocks.num_rows == 1
    assert int(blocks["tiles_len"][0].as_py()) == 4
    back = VT.read_versatiles(path).to_pandas()
    assert len(back) == 16 and all(bytes(p) == b"SAME" for p in back["payload"])


def test_versatiles_sparse_block_and_cross_block(ray_session, tmp_path):
    """Tiles straddling multiple 256-blocks at z9 + sparse coverage."""
    import ray.data as rd

    coords = [(9, 10, 20), (9, 300, 20), (9, 10, 300), (9, 310, 305), (9, 12, 22)]
    t = pa.table(
        {
            "z": pa.array([c[0] for c in coords], type=pa.int64()),
            "x": pa.array([c[1] for c in coords], type=pa.int64()),
            "y": pa.array([c[2] for c in coords], type=pa.int64()),
            "payload": pa.array([f"{c}".encode() for c in coords], type=pa.binary()),
        }
    )
    path = str(tmp_path / "s.versatiles")
    n_blocks = VT.write_versatiles(rd.from_arrow(t), path)
    assert n_blocks == 4  # (0,0) (1,0) (0,1) (1,1) block cells
    back = VT.read_versatiles(path).to_pandas()
    got = {(r.z, r.x, r.y): bytes(r.payload) for r in back.itertuples()}
    assert got == {c: f"{c}".encode() for c in coords}


def test_versatiles_over_http(ray_session, tmp_path):
    from tests.test_http_reader import _serve

    ds = json_debug_tiles(TileBBoxPyramid.new_full(3, 0))
    path = str(tmp_path / "r.versatiles")
    VT.write_versatiles(ds, path)
    local = VT.read_versatiles(path).to_pandas()
    with _serve(tmp_path) as base:
        url = f"{base}/r.versatiles"
        remote = VT.read_versatiles(url).to_pandas()
        key = lambda df: {(r.z, r.x, r.y): bytes(r.payload) for r in df.itertuples()}
        assert key(remote) == key(local) and len(local) == 85


def test_versatiles_container_registry(ray_session, tmp_path):
    from versatiles_rs_ray.pipelines.vpl import open_container, write_container

    ds = json_debug_tiles(TileBBoxPyramid.new_full(2, 0))
    path = str(tmp_path / "c.versatiles")
    write_container(ds, path)
    back = open_container(path).to_pandas()
    assert len(back) == 21


def test_brotli_native_entropy_roundtrip():
    """With the system libbrotli bound (core/native.py) the 'br' codec
    produces real entropy-coded streams, decodes its own output AND
    stored-mode streams, and actually compresses."""
    from versatiles_rs_ray.core import brotli_stored, native

    if not native.HAVE_BROTLI:  # pragma: no cover
        import pytest

        pytest.skip("libbrotli absent")
    data = b"versatiles tile payload " * 200
    enc = brotli_stored.compress(data)
    assert len(enc) < len(data) // 10  # genuinely entropy-coded
    assert brotli_stored.decompress(enc) == data
    stored = brotli_stored.compress_stored(data)
    assert brotli_stored.decompress(stored) == data
