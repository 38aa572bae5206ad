"""End-to-end flagship story: interleaved docs -> tile assignment ->
real MVT point tiles -> .versatiles container -> HTTP tile server ->
fetch a tile back and decode its features.

This is the whole user-visible path in one test: every layer a
reference user touches (pipeline, container, serving) composed over
the engine's own stages, nothing mocked.
"""

import json
import urllib.error
import urllib.request

import numpy as np
import pyarrow.parquet as pq

from versatiles_rs_ray.core import mvt
from versatiles_rs_ray.server import TileServer
from versatiles_rs_ray.sources import docs as D
from versatiles_rs_ray.sources.versatiles import read_versatiles, write_versatiles
from versatiles_rs_ray.stages import assign
from versatiles_rs_ray.stages.vector import docs_to_mvt_tiles

ZOOM = 3


def test_docs_to_container_to_server(ray_session, sf_dir, tmp_path):
    docs = assign.assign_tiles(D.read_docs(sf_dir), ZOOM)
    tiles = docs_to_mvt_tiles(docs, ZOOM, num_partitions=4)
    path = str(tmp_path / "flagship.versatiles")
    n_blocks = write_versatiles(tiles, path, tile_format="mvt")
    assert n_blocks >= 1  # returns 256x256 block count

    # container round-trip: same tile set survives
    back = read_versatiles(path).to_pandas()
    n = len(back)
    assert n > 0

    # expected per-tile doc counts straight from the source table
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ids = np.sort(np.asarray(t["doc_id"], dtype=np.int64))
    lon, lat = D.derive_lonlat(ids)
    from versatiles_rs_ray.core.coords import lonlat_to_tile

    xs, ys = lonlat_to_tile(lon, lat, ZOOM)
    keys, counts = np.unique(
        (np.asarray(xs, dtype=np.int64) << 32) | np.asarray(ys, dtype=np.int64),
        return_counts=True,
    )
    expect = {(int(k >> 32), int(k & 0xFFFFFFFF)): int(c) for k, c in zip(keys, counts)}
    assert len(expect) == n

    srv = TileServer()
    srv.add_tile_source("flagship", path)
    url = srv.start()
    try:
        # index + tilejson surface
        with urllib.request.urlopen(f"{url}/tiles/index.json") as r:
            assert json.loads(r.read()) == ["flagship"]
        # fetch the three densest tiles; decode features; counts match
        top = sorted(expect.items(), key=lambda kv: -kv[1])[:3]
        for (x, y), cnt in top:
            with urllib.request.urlopen(f"{url}/tiles/flagship/{ZOOM}/{x}/{y}") as r:
                assert r.headers["Content-Type"] == "application/x-protobuf"
                tile = mvt.decode_tile(r.read())
            layer = tile["layers"][0]
            assert layer["name"] == "docs"
            assert len(layer["features"]) == cnt
        # a tile outside the pyramid 404s
        try:
            urllib.request.urlopen(f"{url}/tiles/flagship/{ZOOM}/999/999")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.shutdown()
