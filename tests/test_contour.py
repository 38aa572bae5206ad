"""Contour lines (stages/contour): marching-squares analytic goldens,
chaining invariants, saddle determinism, level generation, and the
from_contours VPL op end to end over a written GeoTIFF DEM."""

import json

import numpy as np
import pyarrow as pa
import pytest

from versatiles_rs_ray.stages.contour import (chain_segments,
                                              contour_segments,
                                              contour_lines, level_list)


def _chains(z, level):
    return chain_segments(*contour_segments(z, level))


def test_linear_ramp_exact_vertical_line():
    """z = x: the contour at L is the exact vertical line x = L (linear
    interpolation is exact for a linear field)."""
    z = np.tile(np.arange(8.0), (6, 1))
    for level in (0.5, 3.25, 6.75):
        chains = _chains(z, level)
        assert len(chains) == 1
        c = chains[0]
        assert np.all(c[:, 0] == level)
        assert list(c[:, 1]) == list(np.arange(6.0))  # spans every row


def test_horizontal_ramp_and_orientation():
    """z = y: the contour is horizontal; with inside (>= level) on the
    LEFT of the walk, the chain runs in -x direction (inside is the
    +y half-plane, which lies left when walking west in x-right/y-down
    pixel space)."""
    z = np.tile(np.arange(6.0), (8, 1)).T
    chains = _chains(z, 2.5)
    assert len(chains) == 1
    c = chains[0]
    assert np.all(c[:, 1] == 2.5)
    assert c[0, 0] > c[-1, 0]  # walks toward -x
    # and the ramp-up case keeps higher ground on the same side
    z2 = z[::-1]  # z = 7-y: inside is now the -y half-plane
    c2 = _chains(z2, 2.5)[0]
    assert c2[0, 0] < c2[-1, 0]  # flips direction with the gradient


def test_cone_closed_ring_radius():
    yy, xx = np.mgrid[0:41, 0:41]
    z = 25.0 - np.hypot(xx - 20, yy - 20)
    for level in (8.0, 12.0, 16.0):
        chains = _chains(z, level)
        assert len(chains) == 1
        c = chains[0]
        assert np.allclose(c[0], c[-1])  # closed ring
        r = np.hypot(c[:, 0] - 20, c[:, 1] - 20)
        want = 25.0 - level
        assert np.all(np.abs(r - want) < 0.15)  # chord/interp error only


def test_two_separate_peaks_two_rings():
    yy, xx = np.mgrid[0:30, 0:60]
    z = np.maximum(10.0 - np.hypot(xx - 15, yy - 15),
                   10.0 - np.hypot(xx - 45, yy - 15))
    chains = _chains(z, 5.0)
    assert len(chains) == 2
    for c in chains:
        assert np.allclose(c[0], c[-1])


def test_chaining_consumes_every_segment_once():
    rng = np.random.default_rng(4)
    z = rng.normal(size=(25, 25)).cumsum(0).cumsum(1)
    level = float(np.median(z))
    segs = contour_segments(z, level)
    chains = chain_segments(*segs)
    n_segments = len(segs[0])
    assert sum(len(c) - 1 for c in chains) == n_segments
    for c in chains:  # consecutive points connect
        assert len(c) >= 2


def test_saddle_determinism_both_polarities():
    lo = np.array([[1.0, 0.0], [0.0, 1.0]])   # center 0.5
    a = contour_segments(lo, 0.6)             # center < level
    b = contour_segments(lo, 0.4)             # center >= level
    assert len(a[0]) == 2 and len(b[0]) == 2
    assert [tuple(map(float, s)) for s in zip(*a[:4])] != \
        [tuple(map(float, s)) for s in zip(*b[:4])]
    # re-running is bit-identical
    a2 = contour_segments(lo, 0.6)
    for x, y in zip(a, a2):
        assert np.array_equal(x, y)


def test_level_list_gdal_semantics():
    assert level_list(-3.2, 7.9, interval=2.5) == [-2.5, 0.0, 2.5, 5.0, 7.5]
    assert level_list(0.0, 10.0, interval=5.0, base=1.0) == [1.0, 6.0]
    assert level_list(0, 1, levels=[0.25, 0.75]) == [0.25, 0.75]
    with pytest.raises(ValueError, match="interval"):
        level_list(0, 1)
    with pytest.raises(ValueError, match="2-D"):
        contour_segments(np.zeros((1, 5)), 0.0)


def test_from_contours_vpl_end_to_end(ray_session, tmp_path):
    """DEM GeoTIFF -> from_contours -> MVT linestring tiles with
    elevation properties; decoded ring approximates the cone circle."""
    from versatiles_rs_ray.core import mvt
    from versatiles_rs_ray.pipelines.vpl import build_pipeline
    from versatiles_rs_ray.sources.geotiff import write_tiff

    yy, xx = np.mgrid[0:41, 0:41]
    z = 25.0 - 0.8 * np.hypot(xx - 20, yy - 20)
    # world: lon [0, 41] deg, lat [41, 0] (north-up geotransform)
    path = str(tmp_path / "cone.tif")
    (tmp_path / "cone.tif").write_bytes(write_tiff(
        np.round(z).astype(np.int16)[..., None],
        geotransform=(0.0, 1.0, 0.0, 41.0, 0.0, -1.0), epsg=4326))
    ds = build_pipeline(
        f"from_contours filename={path} levels=10,15 zmin=3 zmax=4")
    rows = ds.to_pandas()
    assert len(rows) > 0
    assert set(rows["z"].unique()) <= {3, 4}
    seen_levels = set()
    for _, r in rows.iterrows():
        tile = mvt.decode_tile(bytes(r["payload"]))
        for layer in tile["layers"]:
            assert layer["name"] == "contours"
            for feat in layer["features"]:
                assert feat["type"] == mvt.GEOM_LINESTRING
                seen_levels.add(feat["properties"]["elevation"])
    assert seen_levels == {10.0, 15.0}
