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


def test_srs_math_goldens():
    """core/srs.py transforms against independent computations."""
    from versatiles_rs_ray.core import srs

    # UTM: central meridian + equator is exactly (500000, 0)
    u31 = srs.get_srs(32631)
    e, n = u31.forward(3.0, 0.0)
    assert abs(float(e) - 500000.0) < 1e-6 and abs(float(n)) < 1e-6
    # northing on the CM == k0 * meridian arc (numerically integrated)
    a, f = 6378137.0, 1 / 298.257223563
    e2 = f * (2 - f)
    phi = np.linspace(0, np.radians(45.0), 200_001)
    arc = np.trapz(a * (1 - e2) / np.power(1 - e2 * np.sin(phi) ** 2, 1.5), phi)
    _, n45 = u31.forward(3.0, 45.0)
    assert abs(float(n45) - 0.9996 * arc) < 0.01  # metres
    # round-trip accuracy across the zone, both hemispheres
    lon, lat = np.meshgrid(np.linspace(0.5, 5.5, 5), np.linspace(-79, 79, 9))
    for code in (32631, 32731):
        u = srs.get_srs(code)
        lon2, lat2 = u.inverse(*u.forward(lon, lat))
        assert np.abs(lon2 - lon).max() < 1e-7 and np.abs(lat2 - lat).max() < 1e-7
    # southern false northing
    _, ns = srs.get_srs(32731).forward(3.0, -1.0)
    assert 9_800_000 < float(ns) < 10_000_000
    # web mercator round trip
    m = srs.get_srs(3857)
    lon2, lat2 = m.inverse(*m.forward(13.4, 52.5))
    assert abs(float(lon2) - 13.4) < 1e-9 and abs(float(lat2) - 52.5) < 1e-9
    # geotransform with rotation terms round-trips
    gt = srs.GeoTransform((100.0, 2.0, 0.3, 50.0, -0.1, -2.5))
    c, r = gt.crs_to_pixel(*gt.pixel_to_crs(12.5, 7.25))
    assert abs(float(c) - 12.5) < 1e-9 and abs(float(r) - 7.25) < 1e-9
    import pytest

    with pytest.raises(NotImplementedError):
        srs.get_srs(27700)  # not registered -> named gate


def test_srs_reprojector_matches_wgs84_path(ray_session):
    """SRSReprojector with an EPSG:4326 source + the matching
    geotransform reproduces the plate-carree fast path exactly."""
    from versatiles_rs_ray.core import srs

    source = RP.make_world_raster(128)
    h, w = source.shape[:2]
    gt = srs.GeoTransform.north_up(-180.0, 90.0, 360.0 / w, 180.0 / h)
    fast = RP.WGS84Reprojector(source, tile_size=32)
    gen = RP.SRSReprojector(source, gt, 4326, tile_size=32)
    for z, x, y in [(0, 0, 0), (1, 1, 0), (2, 3, 2)]:
        assert np.array_equal(gen._reproject_one(z, x, y), fast._reproject_one(z, x, y))


def test_srs_reprojector_utm_warp(ray_session):
    """Warp out of a UTM-31N source raster: tile pixels must carry the
    value encoding of their own easting/northing."""
    import ray.data as rd

    from versatiles_rs_ray.core import srs

    u = srs.get_srs(32631)
    # source window: 400km x 400km around (3E, ~36N..), 1km pixels
    e0, n0, px = 300000.0, 4400000.0, 1000.0
    w = h = 400
    cols, rows = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
    gt = srs.GeoTransform.north_up(e0, n0, px)
    ee, nn = gt.pixel_to_crs(cols, rows)
    source = np.stack(
        [
            ((ee - e0) / (w * px) * 255).astype(np.uint8),
            ((n0 - nn) / (h * px) * 255).astype(np.uint8),
            np.zeros((h, w), np.uint8),
            np.full((h, w), 255, np.uint8),
        ],
        axis=-1,
    )
    # a z8 tile (~1.4 deg wide) well inside the 400km window
    z = 8
    lon_c, lat_c = 2.8, 37.0
    xt = int((lon_c + 180.0) / 360.0 * (1 << z))
    yt = int(
        (1.0 - np.log(np.tan(np.radians(lat_c)) + 1 / np.cos(np.radians(lat_c))) / np.pi)
        / 2.0
        * (1 << z)
    )
    ds = rd.from_items([{"z": z, "x": xt, "y": yt}])
    out = RP.reproject_srs_raster(ds, source, gt.gt, 32631, tile_size=32).to_pandas()
    arr = to_array(out.iloc[0]["payload"], 32, 32)
    assert (arr[..., 3] == 255).all()  # fully inside coverage
    # verify a few pixels against the exact forward computation
    local = RP.SRSReprojector(source, gt.gt, 32631, tile_size=32)
    lon, lat = local._tile_lonlat(z, xt, yt)
    E, N = u.forward(lon.ravel(), lat.ravel())
    want_r = np.clip((E - e0) / (w * px) * 255, 0, 255).astype(np.int64)
    got_r = arr[..., 0].ravel().astype(np.int64)
    assert np.abs(got_r - want_r).max() <= 2  # 1km-pixel quantization
    # easting increases left->right, northing value increases top->bottom
    assert arr[16, 30, 0] > arr[16, 1, 0]
    assert arr[30, 16, 1] > arr[1, 16, 1]


def test_srs_reprojector_band_map_bilinear_and_coverage(ray_session):
    """Band remapping reorders channels; bilinear interpolates; pixels
    outside the source window are transparent."""
    from versatiles_rs_ray.core import srs

    # tiny 4326 source covering only the NE quadrant
    h, w = 64, 64
    src = np.zeros((h, w, 3), np.uint8)
    src[..., 0] = 10  # stored band order BGR
    src[..., 2] = 200
    gt = srs.GeoTransform.north_up(0.0, 85.0, 180.0 / w, 85.0 / h)
    rp = RP.SRSReprojector(src, gt, 4326, tile_size=32, band_mapping=(2, 1, 0))
    tile = rp._reproject_one(1, 1, 0)  # NE quadrant -> covered
    assert (tile[..., 0] == 200).all() and (tile[..., 2] == 10).all()
    nw = rp._reproject_one(1, 0, 0)  # west of the window -> transparent
    assert (nw[..., 3] == 0).all()
    # bilinear on a 2-value checker smooths between neighbours
    grad = np.zeros((h, w, 3), np.uint8)
    grad[:, 34:, :] = 200  # step between cols 33/34 straddles a sample point
    # tile_size=20 makes sample columns land between source pixels
    rp2 = RP.SRSReprojector(grad, gt, 4326, tile_size=20, resampling="bilinear")
    tile2 = rp2._reproject_one(1, 1, 0)
    vals = np.unique(tile2[..., 0])
    assert len(vals) > 2 and vals.min() == 0 and vals.max() == 200


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


def test_srs_laea_lcc_invariants_and_goldens():
    """EPSG:3035 (LAEA Europe) and EPSG:2154 (Lambert-93): validated
    by the projections' defining mathematical invariants — checks a
    wrong constant cannot pass — plus the IOGP Guidance Note 7-2
    LAEA worked example (50N 5E -> 3962799.45 E, 2999718.85 N)."""
    from versatiles_rs_ray.core import srs

    a, f = 6378137.0, 1.0 / 298.257222101
    e2 = 2.0 * f - f * f

    laea = srs.get_srs(3035)
    # false origin exact; published worked example to the cm
    x, y = laea.forward(10.0, 52.0)
    assert abs(float(x) - 4321000.0) < 1e-6 and abs(float(y) - 3210000.0) < 1e-6
    x, y = laea.forward(5.0, 50.0)
    assert abs(float(x) - 3962799.45) < 0.01
    assert abs(float(y) - 2999718.85) < 0.01

    lcc = srs.get_srs(2154)
    x, y = lcc.forward(3.0, 46.5)
    assert abs(float(x) - 700000.0) < 1e-6 and abs(float(y) - 6600000.0) < 1e-5

    # round-trips over each projection's service area
    for proj, lons, lats in (
        (laea, np.linspace(-10, 30, 9), np.linspace(35, 70, 8)),
        (lcc, np.linspace(-5, 10, 9), np.linspace(41, 51, 8)),
    ):
        LO, LA = np.meshgrid(lons, lats)
        lo2, la2 = proj.inverse(*proj.forward(LO, LA))
        assert np.abs(lo2 - LO).max() < 1e-9
        assert np.abs(la2 - LA).max() < 1e-9

    def jacobian(proj, lon, lat, h=1e-6):
        x1, y1 = proj.forward(lon + h, lat)
        x0, y0 = proj.forward(lon - h, lat)
        x3, y3 = proj.forward(lon, lat + h)
        x2, y2 = proj.forward(lon, lat - h)
        return np.array([[(x1 - x0), (x3 - x2)], [(y1 - y0), (y3 - y2)]],
                        dtype=float) / (2 * h * np.pi / 180.0)

    # LAEA: |det J| == ellipsoidal area element everywhere (equal-area)
    for lon, lat in [(5.0, 50.0), (25.0, 40.0), (-8.0, 65.0), (12.0, 55.0)]:
        J = jacobian(laea, lon, lat)
        phi = np.radians(lat)
        s = np.sin(phi)
        dA = a * a * (1 - e2) * np.cos(phi) / (1 - e2 * s * s) ** 2
        assert abs(abs(np.linalg.det(J)) / dA - 1.0) < 1e-6, (lon, lat)

    # LCC: conformal (equal scale along meridian/parallel) everywhere,
    # and scale == 1 exactly ON both standard parallels
    for lon, lat in [(3.0, 44.0), (3.0, 49.0), (-1.0, 46.5), (7.0, 42.0)]:
        J = jacobian(lcc, lon, lat)
        phi = np.radians(lat)
        s = np.sin(phi)
        nu = a / np.sqrt(1 - e2 * s * s)
        M = a * (1 - e2) / (1 - e2 * s * s) ** 1.5
        kpar = np.hypot(*J[:, 0]) / (nu * np.cos(phi))
        kmer = np.hypot(*J[:, 1]) / M
        assert abs(kpar / kmer - 1.0) < 1e-6, (lon, lat)
        if lat in (44.0, 49.0):
            assert abs(kpar - 1.0) < 1e-7, lat


def test_srs_reprojector_laea_warp(ray_session):
    """Warp out of an EPSG:3035 source through the actor pool — the
    European-grid raster path end to end."""
    import ray.data as rd

    from versatiles_rs_ray.core import srs

    p = srs.get_srs(3035)
    # 800km x 800km window around central Europe, 2km pixels
    e0, n0, px = 3800000.0, 3400000.0, 2000.0
    w = h = 400
    gt = srs.GeoTransform.north_up(e0, n0, px)
    cols, rows = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
    ee, nn = gt.pixel_to_crs(cols, rows)
    source = np.stack([
        ((ee - e0) / (w * px) * 255).astype(np.uint8),
        ((n0 - nn) / (h * px) * 255).astype(np.uint8),
        np.zeros((h, w), np.uint8),
        np.full((h, w), 255, np.uint8),
    ], axis=-1)
    z, lon_c, lat_c = 8, 10.0, 50.5
    xt = int((lon_c + 180.0) / 360.0 * (1 << z))
    yt = int((1.0 - np.log(np.tan(np.radians(lat_c))
                           + 1 / np.cos(np.radians(lat_c))) / np.pi)
             / 2.0 * (1 << z))
    ds = rd.from_items([{"z": z, "x": xt, "y": yt}])
    out = RP.reproject_srs_raster(ds, source, gt.gt, 3035, tile_size=32).to_pandas()
    arr = to_array(out.iloc[0]["payload"], 32, 32)
    assert (arr[..., 3] == 255).all()
    local = RP.SRSReprojector(source, gt.gt, 3035, tile_size=32)
    lon, lat = local._tile_lonlat(z, xt, yt)
    E, _ = p.forward(lon.ravel(), lat.ravel())
    want_r = np.clip((E - e0) / (w * px) * 255, 0, 255).astype(np.int64)
    assert np.abs(arr[..., 0].ravel().astype(np.int64) - want_r).max() <= 2


def test_srs_albers_and_new_lcc_families():
    """EPSG:5070/3577/3310 (Albers 9822) and EPSG:3034/3347 (LCC
    9802): the same defining-invariant validation as 3035/2154 —
    equal-area Jacobian for Albers with EXACT unit scale on both
    standard parallels, conformality for the LCC codes, round-trips
    over each service area, projection-center goldens."""
    from versatiles_rs_ray.core import srs

    a, f = 6378137.0, 1.0 / 298.257222101
    e2 = 2.0 * f - f * f

    conus = srs.get_srs(5070)
    aus = srs.get_srs(3577)
    cal = srs.get_srs(3310)
    lcc_eu = srs.get_srs(3034)
    lcc_ca = srs.get_srs(3347)

    # natural-origin goldens: forward(lon0, lat0) == (FE, FN)
    for proj, lon0, lat0, fe, fn in (
        (conus, -96.0, 23.0, 0.0, 0.0),
        (aus, 132.0, 0.0, 0.0, 0.0),
        (cal, -120.0, 0.0, 0.0, -4000000.0),
        (lcc_eu, 10.0, 52.0, 4000000.0, 2800000.0),
        (lcc_ca, -91.866667, 63.390675, 6200000.0, 3000000.0),
    ):
        x, y = proj.forward(lon0, lat0)
        assert abs(float(x) - fe) < 1e-5 and abs(float(y) - fn) < 1e-5

    # round-trips over each projection's service area
    for proj, lons, lats in (
        (conus, np.linspace(-125, -65, 9), np.linspace(24, 50, 8)),
        (aus, np.linspace(112, 155, 9), np.linspace(-44, -9, 8)),
        (cal, np.linspace(-125, -113, 7), np.linspace(32, 43, 6)),
        (lcc_eu, np.linspace(-10, 30, 9), np.linspace(35, 70, 8)),
        (lcc_ca, np.linspace(-140, -50, 9), np.linspace(42, 80, 8)),
    ):
        LO, LA = np.meshgrid(lons, lats)
        lo2, la2 = proj.inverse(*proj.forward(LO, LA))
        assert np.abs(lo2 - LO).max() < 1e-8
        assert np.abs(la2 - LA).max() < 1e-8

    def jacobian(proj, lon, lat, h=1e-6):
        x1, y1 = proj.forward(lon + h, lat)
        x0, y0 = proj.forward(lon - h, lat)
        x3, y3 = proj.forward(lon, lat + h)
        x2, y2 = proj.forward(lon, lat - h)
        return np.array([[(x1 - x0), (x3 - x2)], [(y1 - y0), (y3 - y2)]],
                        dtype=float) / (2 * h * np.pi / 180.0)

    # Albers: |det J| == ellipsoidal area element everywhere, and
    # scale == 1 exactly ON both standard parallels
    for proj, pts, parallels in (
        (conus, [(-96.0, 29.5), (-96.0, 45.5), (-120.0, 35.0),
                 (-75.0, 40.0)], (29.5, 45.5)),
        (aus, [(132.0, -18.0), (132.0, -36.0), (145.0, -30.0),
               (118.0, -22.0)], (-18.0, -36.0)),
        (cal, [(-120.0, 34.0), (-120.0, 40.5), (-117.0, 36.0)],
         (34.0, 40.5)),
    ):
        for lon, lat in pts:
            J = jacobian(proj, lon, lat)
            phi = np.radians(lat)
            s = np.sin(phi)
            dA = a * a * (1 - e2) * np.cos(phi) / (1 - e2 * s * s) ** 2
            assert abs(abs(np.linalg.det(J)) / dA - 1.0) < 1e-6, (
                proj.code, lon, lat)
            if lat in parallels:
                nu = a / np.sqrt(1 - e2 * s * s)
                kpar = np.hypot(*J[:, 0]) / (nu * np.cos(phi))
                assert abs(kpar - 1.0) < 1e-7, (proj.code, lat)

    # LCC codes: conformal everywhere, unit scale on their parallels
    for proj, pts, parallels in (
        (lcc_eu, [(10.0, 35.0), (10.0, 65.0), (-5.0, 45.0),
                  (25.0, 55.0)], (35.0, 65.0)),
        (lcc_ca, [(-92.0, 49.0), (-92.0, 77.0), (-120.0, 60.0),
                  (-60.0, 50.0)], (49.0, 77.0)),
    ):
        for lon, lat in pts:
            J = jacobian(proj, lon, lat)
            phi = np.radians(lat)
            s = np.sin(phi)
            nu = a / np.sqrt(1 - e2 * s * s)
            M = a * (1 - e2) / (1 - e2 * s * s) ** 1.5
            kpar = np.hypot(*J[:, 0]) / (nu * np.cos(phi))
            kmer = np.hypot(*J[:, 1]) / M
            assert abs(kpar / kmer - 1.0) < 1e-6, (proj.code, lon, lat)
            if lat in parallels:
                assert abs(kpar - 1.0) < 1e-7, (proj.code, lat)
