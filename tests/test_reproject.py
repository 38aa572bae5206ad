"""Reprojection actor pool: exact inverse-mapping checks against a
driver-side computation (the gradient-golden strategy of the
reference's GDAL tests, from_gdal/raster/operation.rs:271-343)."""

import numpy as np

from versatiles_rs_ray.core.bbox import TileBBoxPyramid
from versatiles_rs_ray.core.raster import to_array
from versatiles_rs_ray.sources.debug_tiles import coords_table
from versatiles_rs_ray.stages import reproject as RP


def test_max_zoom_for_source():
    assert RP.max_zoom_for_source(1024, 64) == 4
    assert RP.max_zoom_for_source(1000, 64) == 4  # ceil
    assert RP.max_zoom_for_source(64, 64) == 0


def test_reproject_matches_local(ray_session):
    import ray.data as rd

    source = RP.make_world_raster(256)
    ds = rd.from_arrow(coords_table(TileBBoxPyramid.new_full(2, 1)))
    out = RP.reproject_raster(ds, source, tile_size=32, concurrency=2).to_pandas()
    assert len(out) == 4 + 16
    local = RP.WGS84Reprojector(source, tile_size=32)
    for _, row in out.iterrows():
        got = to_array(row["payload"], 32, 32)
        want = local._reproject_one(row["z"], row["x"], row["y"])
        assert (got == want).all(), (row["z"], row["x"], row["y"])


def test_reproject_gradient_properties(ray_session):
    source = RP.make_world_raster(256)
    local = RP.WGS84Reprojector(source, tile_size=64)
    west = local._reproject_one(1, 0, 0)  # north-west quadrant
    east = local._reproject_one(1, 1, 0)
    # R channel ramps with longitude: west tile darker than east tile
    assert west[..., 0].mean() < east[..., 0].mean()
    # G ramps with latitude: northern tiles darker (lat high -> sy small)
    south = local._reproject_one(1, 0, 1)
    assert west[..., 1].mean() < south[..., 1].mean()
    # mercator: the z0 tile center row maps near the equator
    z0 = local._reproject_one(0, 0, 0)
    mid = z0[32, :, 1].mean()
    assert abs(mid - 127.5) < 12  # equator green ~ mid-ramp


def test_reuse_recycling(ray_session):
    source = RP.make_world_raster(64)
    local = RP.WGS84Reprojector(source, tile_size=16, max_uses=2)
    import pyarrow as pa

    batch = pa.table(
        {
            "z": pa.array([0], type=pa.int64()),
            "x": pa.array([0], type=pa.int64()),
            "y": pa.array([0], type=pa.int64()),
        }
    )
    a = local(batch)["payload"].to_pylist()
    for _ in range(4):  # crosses the recycle boundary
        b = local(batch)["payload"].to_pylist()
    assert a == b  # recycling is semantically a no-op
