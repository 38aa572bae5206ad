"""Zonal statistics (stages/zonal): per-pixel brute-force equality for
rect and polygon zones, PNG decode path, partition invariance, edges."""

import numpy as np
import pyarrow as pa
import pytest

from versatiles_rs_ray.core.bbox import TileBBoxPyramid
from versatiles_rs_ray.core.coords import mercator_fraction
from versatiles_rs_ray.sources.debug_tiles import gradient_array, gradient_tiles
from versatiles_rs_ray.stages.zonal import ZonalStats, zonal_stats

Z, SIZE = 2, 32


def _brute(zones, z=Z, size=SIZE, band=2):
    """Scalar reference: every pixel center of every tile tested
    directly (rects half-open in mercator, polygons even-odd)."""
    n_t = float(1 << z)
    out = {}
    for x in range(1 << z):
        for y in range(1 << z):
            vals = gradient_array(z, x, y, size)[..., band].astype(np.int64)
            for r in range(size):
                gy = (y + (r + 0.5) / size) / n_t
                for c in range(size):
                    gx = (x + (c + 0.5) / size) / n_t
                    for zid, zone in zones.items():
                        arr = np.asarray(zone, dtype=np.float64)
                        if arr.shape == (4,):
                            mx0, my0 = mercator_fraction(arr[0], arr[3])
                            mx1, my1 = mercator_fraction(arr[2], arr[1])
                            hit = mx0 <= gx < mx1 and my0 <= gy < my1
                        else:
                            mx, my = mercator_fraction(arr[:, 0], arr[:, 1])
                            hit = False
                            for i in range(len(mx)):
                                x0, y0 = mx[i], my[i]
                                x1, y1 = (mx[(i + 1) % len(mx)],
                                          my[(i + 1) % len(my)])
                                if (y0 <= gy) != (y1 <= gy):
                                    xi = x0 + (gy - y0) * (x1 - x0) / (y1 - y0)
                                    if gx < xi:
                                        hit = not hit
                        if hit:
                            s = out.setdefault(zid, [0, 0, 1 << 62, -1])
                            v = int(vals[r, c])
                            s[0] += 1
                            s[1] += v
                            s[2] = min(s[2], v)
                            s[3] = max(s[3], v)
    return out


def _run(zones, ray_session, num_blocks=None):
    tiles = gradient_tiles(TileBBoxPyramid.new_full(Z, Z), size=SIZE,
                           override_num_blocks=num_blocks)
    df = zonal_stats(tiles, zones).to_pandas().set_index("zone")
    return {z: [int(r["n_px"]), int(r["sum_val"]), int(r["min_val"]),
                int(r["max_val"])] for z, r in df.iterrows()}


RECTS = {
    "q1": (-90.0, 0.0, 0.0, 66.0),
    "sliver": (5.0, -5.0, 7.0, 5.0),
    "all": (-180.0, -85.0, 180.0, 85.0),
}


def test_rect_zones_match_per_pixel_brute(ray_session):
    assert _run(RECTS, ray_session) == _brute(RECTS)


def test_polygon_zone_matches_per_pixel_brute(ray_session):
    zones = {"tri": [(-90.0, -40.0), (90.0, -40.0), (0.0, 65.0)]}
    assert _run(zones, ray_session) == _brute(zones)


def test_mixed_and_partition_invariance(ray_session):
    zones = dict(RECTS)
    zones["tri"] = [(-90.0, -40.0), (90.0, -40.0), (0.0, 65.0)]
    a = _run(zones, ray_session)
    b = _run(zones, ray_session, num_blocks=7)
    assert a == b == _brute(zones)


def test_empty_zone_emits_no_row(ray_session):
    # half-open: zero-width rect covers no pixel center
    out = _run({"empty": (10.0, 10.0, 10.0, 20.0), "all": RECTS["all"]},
               ray_session)
    assert "empty" not in out and "all" in out


def test_png_decoder_path(ray_session):
    import ray.data as rd

    from versatiles_rs_ray.core.png import encode_png

    arr = gradient_array(0, 0, 0, SIZE)
    ds = rd.from_arrow(pa.table({
        "z": pa.array([0], type=pa.int64()),
        "x": pa.array([0], type=pa.int64()),
        "y": pa.array([0], type=pa.int64()),
        "payload": pa.array([encode_png(arr)], type=pa.binary()),
        "width": pa.array([SIZE], type=pa.int64()),
        "height": pa.array([SIZE], type=pa.int64()),
    }))
    got = zonal_stats(ds, {"all": RECTS["all"]}, band=0,
                      decoder="png").to_pandas()
    want = arr[..., 0].astype(np.int64)
    assert int(got["n_px"][0]) == SIZE * SIZE
    assert int(got["sum_val"][0]) == int(want.sum())
    assert int(got["min_val"][0]) == int(want.min())
    assert int(got["max_val"][0]) == int(want.max())


def test_terrarium_elevation_zonal(ray_session):
    """Analytic-plane DEM encoded Terrarium -> zonal stats in exact
    1/256-m units: the decode inverts stages/terrain's encoding, so a
    constant-elevation tile yields sum == n * round(elev * 256)."""
    import ray.data as rd

    from versatiles_rs_ray.core.png import encode_png
    from versatiles_rs_ray.stages.terrain import terrarium_encode

    elev = np.full((SIZE, SIZE), 1234.5, dtype=np.float64)
    rgb = terrarium_encode(elev)
    rgba = np.dstack([rgb, np.full((SIZE, SIZE), 255, dtype=np.uint8)])
    ds = rd.from_arrow(pa.table({
        "z": pa.array([0], type=pa.int64()),
        "x": pa.array([0], type=pa.int64()),
        "y": pa.array([0], type=pa.int64()),
        "payload": pa.array([encode_png(rgba)], type=pa.binary()),
        "width": pa.array([SIZE], type=pa.int64()),
        "height": pa.array([SIZE], type=pa.int64()),
    }))
    got = zonal_stats(ds, {"all": RECTS["all"]}, band="terrarium",
                      decoder="png").to_pandas()
    v256 = int(round(1234.5 * 256))  # exact 1/256-m integer units
    assert int(got["n_px"][0]) == SIZE * SIZE
    assert int(got["sum_val"][0]) == SIZE * SIZE * v256
    assert int(got["min_val"][0]) == v256 == int(got["max_val"][0])


def test_zonal_cli_over_container(ray_session, tmp_path):
    """zonal CLI end-to-end: gradient tiles -> PNG mbtiles container
    -> subprocess `zonal` with magic-sniffed decode == the per-pixel
    brute force (PNG is lossless, so values survive the container)."""
    import json
    import subprocess
    import sys

    from versatiles_rs_ray.pipelines.vpl import build_pipeline, write_container

    src = str(tmp_path / "grad.mbtiles")
    ds = build_pipeline(f"from_gradient zmax={Z} size={SIZE} | "
                        "raster_format format=png")
    write_container(ds, src)
    zones_path = tmp_path / "zones.json"
    zones_path.write_text(json.dumps(
        {k: list(v) for k, v in RECTS.items()}))
    out = subprocess.run(
        [sys.executable, "-m", "versatiles_rs_ray", "--num-cpus", "4",
         "zonal", src, str(zones_path), "--level", str(Z), "--band", "2"],
        capture_output=True, text=True, cwd="/root/repo", timeout=240)
    assert out.returncode == 0, out.stderr[-2000:]
    doc = json.loads(out.stdout.strip().splitlines()[-1])
    got = {r["zone"]: [r["n_px"], r["sum_val"], r["min_val"], r["max_val"]]
           for r in doc["zones"]}
    assert got == _brute(RECTS)


def test_validation():
    with pytest.raises(ValueError):
        ZonalStats({}, band=0)
    with pytest.raises(ValueError):
        ZonalStats({"a": (0.0, 0.0, 1.0, 1.0)}, band="mapbox")
    with pytest.raises(ValueError):
        ZonalStats({"a": (0.0, 0.0, 1.0, 1.0)}, band=7)
    with pytest.raises(ValueError):
        ZonalStats({"a": (0.0, 0.0, 1.0, 1.0)}, decoder="gif")
    with pytest.raises(ValueError):
        ZonalStats({"a": [(0.0, 0.0), (1.0, 1.0)]})  # 2-vertex ring
