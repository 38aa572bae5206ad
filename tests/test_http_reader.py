"""HTTP-range remote reads: pmtiles served over a local http.server is
read back byte-identical through the same reader code paths
(reference: data_reader_http.rs + registry http(s):// dispatch)."""

import contextlib
import functools
import http.server
import threading

import pytest

from versatiles_rs_ray.core.bbox import TileBBoxPyramid
from versatiles_rs_ray.sources import pmtiles
from versatiles_rs_ray.sources.data_reader import (
    FileDataReader,
    HttpDataReader,
    open_data_reader,
)
from versatiles_rs_ray.sources.debug_tiles import json_debug_tiles
from versatiles_rs_ray.sources.random_access import PMTilesRandomAccess


@contextlib.contextmanager
def _serve(directory):
    handler = functools.partial(
        http.server.SimpleHTTPRequestHandler, directory=str(directory)
    )
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{httpd.server_address[1]}"
    finally:
        httpd.shutdown()


def test_http_range_reader_matches_file(tmp_path):
    blob = bytes(range(256)) * 40
    (tmp_path / "blob.bin").write_bytes(blob)
    with _serve(tmp_path) as base:
        r = open_data_reader(f"{base}/blob.bin")
        assert isinstance(r, HttpDataReader)
        f = FileDataReader(str(tmp_path / "blob.bin"))
        assert isinstance(open_data_reader(str(tmp_path / "blob.bin")), FileDataReader)
        for off, ln in [(0, 10), (255, 2), (10000, 240), (len(blob) - 5, 5), (3, 0)]:
            assert r.read(off, ln) == f.read(off, ln) == blob[off : off + ln]
        assert r.size() == f.size() == len(blob)


def test_pmtiles_over_http(ray_session, tmp_path):
    ds = json_debug_tiles(TileBBoxPyramid.new_full(3, 0))
    path = str(tmp_path / "t.pmtiles")
    n = pmtiles.write_pmtiles(ds, path, metadata={"name": "remote"})
    local = pmtiles.read_pmtiles(path).to_pandas()
    with _serve(tmp_path) as base:
        url = f"{base}/t.pmtiles"
        assert pmtiles.read_pmtiles_metadata(url) == {"name": "remote"}
        remote = pmtiles.read_pmtiles(url).to_pandas()
        key = lambda df: {
            (r.z, r.x, r.y): bytes(r.payload) for r in df.itertuples()
        }
        assert key(remote) == key(local) and len(remote) == n

        # random access over HTTP: single-tile range reads
        ra = PMTilesRandomAccess(url)
        assert ra.get_tile(3, 2, 5) == b'{"x":2,"y":5,"z":3}'
        assert ra.get_tile(0, 0, 0) == b'{"x":0,"y":0,"z":0}'
        assert ra.get_tile(4, 0, 0) is None


def test_pmtiles_over_http_with_leaves(ray_session, tmp_path):
    old = pmtiles.MAX_DIR_ENTRIES
    pmtiles.MAX_DIR_ENTRIES = 64
    try:
        ds = json_debug_tiles(TileBBoxPyramid.new_full(4, 0))
        path = str(tmp_path / "leaf.pmtiles")
        pmtiles.write_pmtiles(ds, path)
    finally:
        pmtiles.MAX_DIR_ENTRIES = old
    with _serve(tmp_path) as base:
        url = f"{base}/leaf.pmtiles"
        ra = PMTilesRandomAccess(url)
        assert ra.get_tile(4, 15, 15) == b'{"x":15,"y":15,"z":4}'
        back = pmtiles.read_pmtiles(url).to_pandas()
        assert len(back) == 341


def test_open_container_dispatches_http(ray_session, tmp_path):
    from versatiles_rs_ray.pipelines.vpl import open_container

    ds = json_debug_tiles(TileBBoxPyramid.new_full(2, 0))
    path = str(tmp_path / "c.pmtiles")
    pmtiles.write_pmtiles(ds, path)
    with _serve(tmp_path) as base:
        got = open_container(f"{base}/c.pmtiles").to_pandas()
        assert len(got) == 21
