"""Random-access readers: single-tile lookups against written
containers (the serve fast path, SURVEY.md §3.3)."""

from versatiles_rs_ray.core.bbox import TileBBoxPyramid
from versatiles_rs_ray.sources import pmtiles
from versatiles_rs_ray.sources.debug_tiles import json_debug_tiles
from versatiles_rs_ray.sources.random_access import (
    PMTilesRandomAccess,
    PyramidRandomAccess,
)


def test_pmtiles_random_access(ray_session, tmp_path):
    ds = json_debug_tiles(TileBBoxPyramid.new_full(4, 0))
    path = str(tmp_path / "ra.pmtiles")
    pmtiles.write_pmtiles(ds, path)
    ra = PMTilesRandomAccess(path)
    assert ra.get_tile(4, 3, 7) == b'{"x":3,"y":7,"z":4}'
    assert ra.get_tile(0, 0, 0) == b'{"x":0,"y":0,"z":0}'
    assert ra.get_tile(5, 0, 0) is None  # level not present


def test_pmtiles_random_access_with_leaves(ray_session, tmp_path):
    old = pmtiles.MAX_DIR_ENTRIES
    pmtiles.MAX_DIR_ENTRIES = 64
    try:
        ds = json_debug_tiles(TileBBoxPyramid.new_full(4, 0))
        path = str(tmp_path / "leaf_ra.pmtiles")
        pmtiles.write_pmtiles(ds, path)
        ra = PMTilesRandomAccess(path)
        assert ra.get_tile(4, 15, 15) == b'{"x":15,"y":15,"z":4}'
        assert ra.get_tile(2, 1, 2) == b'{"x":1,"y":2,"z":2}'
        # leaf cache warm after first access of the same leaf
        assert len(ra._leaf_cache) >= 1
    finally:
        pmtiles.MAX_DIR_ENTRIES = old


def test_pyramid_random_access(ray_session, sf_dir, tmp_path):
    from versatiles_rs_ray.pipelines.pyramid import build_and_write_pyramid

    out = str(tmp_path / "pyr")
    build_and_write_pyramid(sf_dir, out, z_base=4, z_min=0)
    ra = PyramidRandomAccess(out)
    row = ra.get_tile(0, 0, 0)
    assert row["n_docs"] == 500
    assert ra.get_tile(4, 0, 0) is None or ra.get_tile(4, 0, 0)["n_docs"] >= 1
    assert ra.get_tile(9, 0, 0) is None  # level not written
