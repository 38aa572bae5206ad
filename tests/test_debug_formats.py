import numpy as np
import pytest

from versatiles_rs_ray.core import mvt
from versatiles_rs_ray.core.raster import decode
from versatiles_rs_ray.sources.debug_tiles import (
    debug_raster_array, debug_vector_tile)


def test_debug_raster_semantics():
    # image.rs:14: checkerboard background, alpha 16 when requested
    a = debug_raster_array(4, 3, 2, use_alpha=True)
    assert a.shape == (512, 512, 4)
    assert a[0, 0, 0] == 255 and a[0, 0, 3] == 16  # (3+2)%2=1 -> white
    b = debug_raster_array(4, 2, 2, use_alpha=False)
    assert b.shape == (512, 512, 3) and b[0, 0, 0] == 0
    # text pixels present in the right color rows
    assert (a[195:252, 220:] == [127, 30, 16, 255]).all(axis=-1).any()
    assert (a[225:282, 220:] == [0, 92, 45, 255]).all(axis=-1).any()
    assert (a[255:312, 220:] == [30, 23, 98, 255]).all(axis=-1).any()


def test_debug_raster_roundtrip_codecs():
    arr = debug_raster_array(1, 1, 0, use_alpha=True)
    from versatiles_rs_ray.core.raster import encode
    png = encode(arr, "png")
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    back = decode(png, "png")
    assert np.array_equal(back, arr)  # PNG lossless


def test_debug_vector_structure():
    blob = debug_vector_tile(3, 5, 1)
    tile = mvt.decode_tile(blob)
    names = [l["name"] for l in tile["layers"]]
    assert names == ["background", "debug_z", "debug_x", "debug_y"]
    bg = tile["layers"][0]["features"][0]
    assert bg["type"] == 3
    zl = tile["layers"][1]
    assert zl["extent"] == 4096
    chars = [f["properties"]["char"] for f in zl["features"]]
    assert chars == ["z", ":", "3"]
    for i, f in enumerate(zl["features"]):
        assert f["properties"]["index"] == i
        assert f["type"] == 3 and len(f["geometry"]) >= 1
    xs = [f["properties"]["x"] for f in zl["features"]]
    assert xs == sorted(xs) and xs[0] == 100.0


def test_vpl_from_debug_formats(ray_session):
    from versatiles_rs_ray.pipelines.vpl import build_pipeline

    ds = build_pipeline('from_debug zmax="0" format="mvt"')
    rows = ds.take_all()
    assert len(rows) == 1
    tile = mvt.decode_tile(bytes(rows[0]["payload"]))
    assert [l["name"] for l in tile["layers"]][0] == "background"

    ds = build_pipeline('from_debug zmax="0" format="png"')
    row = ds.take_all()[0]
    assert bytes(row["payload"])[:8] == b"\x89PNG\r\n\x1a\n"
    assert row["format"] == "png"
