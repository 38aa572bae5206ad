"""Rectangle clipping (core/clip): Liang-Barsky lines vs brute
segment-sampling, Sutherland-Hodgman rings vs area/containment
ground truth, tiling integration (clipped tiles carry only local
geometry and non-intersecting bbox tiles disappear)."""

import numpy as np
import pytest

from versatiles_rs_ray.core.clip import clip_line, clip_parts, clip_ring

R = (0.0, 0.0, 10.0, 10.0)


def _inside(p, eps=1e-9):
    return (-eps <= p[0] <= 10 + eps) and (-eps <= p[1] <= 10 + eps)


def test_line_fully_inside_passthrough():
    pts = np.array([(1.0, 1.0), (5.0, 5.0), (9.0, 2.0)])
    out = clip_line(pts, *R)
    assert len(out) == 1 and np.allclose(out[0], pts)


def test_line_crossing_splits_and_interpolates():
    pts = np.array([(-5.0, 5.0), (15.0, 5.0)])
    out = clip_line(pts, *R)
    assert len(out) == 1
    assert np.allclose(out[0], [(0.0, 5.0), (10.0, 5.0)])


def test_line_exits_and_reenters_two_pieces():
    pts = np.array([(1.0, 1.0), (1.0, 15.0), (9.0, 15.0), (9.0, 1.0)])
    out = clip_line(pts, *R)
    assert len(out) == 2
    for piece in out:
        assert all(_inside(p) for p in piece)
    assert np.allclose(out[0], [(1.0, 1.0), (1.0, 10.0)])
    assert np.allclose(out[1], [(9.0, 10.0), (9.0, 1.0)])


def test_line_fully_outside_empty():
    assert clip_line(np.array([(20.0, 20.0), (30.0, 30.0)]), *R) == []
    # outside but bbox-overlapping diagonal corner miss
    assert clip_line(np.array([(-1.0, 4.0), (4.0, -1.0)]), *R) != []  # cuts corner
    assert clip_line(np.array([(-1.0, 12.0), (-0.5, 20.0)]), *R) == []


def test_line_dense_sampling_agreement():
    rng = np.random.RandomState(5)
    for _ in range(30):
        pts = rng.uniform(-8, 18, size=(6, 2))
        pieces = clip_line(pts, *R)
        # every clipped vertex is inside the rect
        for piece in pieces:
            assert all(_inside(p) for p in piece)
        # total clipped length == inside-length measured by sampling
        def seg_inside_len(a, b):
            t = np.linspace(0, 1, 20001)
            q = a[None] + t[:, None] * (b - a)[None]
            m = ((q[:, 0] >= 0) & (q[:, 0] <= 10)
                 & (q[:, 1] >= 0) & (q[:, 1] <= 10))
            return m.mean() * np.hypot(*(b - a))

        want = sum(seg_inside_len(pts[i], pts[i + 1])
                   for i in range(len(pts) - 1))
        got = sum(np.hypot(*(p[i + 1] - p[i]))
                  for p in pieces for i in range(len(p) - 1))
        assert got == pytest.approx(want, abs=0.02)


def _area(ring):
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def test_ring_inside_passthrough_and_outside_none():
    sq = np.array([(2.0, 2.0), (8.0, 2.0), (8.0, 8.0), (2.0, 8.0)])
    assert np.allclose(clip_ring(sq, *R), sq)
    assert clip_ring(sq + 100.0, *R) is None


def test_ring_overlap_area_exact():
    # square straddling the right edge: clipped area = visible half
    sq = np.array([(6.0, 2.0), (14.0, 2.0), (14.0, 8.0), (6.0, 8.0)])
    out = clip_ring(sq, *R)
    assert _area(out) == pytest.approx(4.0 * 6.0)
    assert out[:, 0].max() == 10.0


def test_ring_covers_rect_becomes_rect():
    big = np.array([(-5.0, -5.0), (15.0, -5.0), (15.0, 15.0), (-5.0, 15.0)])
    out = clip_ring(big, *R)
    assert _area(out) == pytest.approx(100.0)


def test_ring_random_convex_area_agreement():
    rng = np.random.RandomState(11)
    for _ in range(20):
        ang = np.sort(rng.uniform(0, 2 * np.pi, 8))
        c = rng.uniform(-2, 12, 2)
        rad = rng.uniform(1, 9)
        ring = np.stack([c[0] + rad * np.cos(ang),
                         c[1] + rad * np.sin(ang)], axis=1)
        out = clip_ring(ring, *R)
        # Monte-Carlo-free ground truth: pixel-grid containment
        gx, gy = np.meshgrid(np.linspace(0.005, 9.995, 1000),
                             np.linspace(0.005, 9.995, 1000))
        # convex polygon containment via cross products
        inside = np.ones(gx.shape, dtype=bool)
        n = len(ring)
        for i in range(n):
            a, b = ring[i], ring[(i + 1) % n]
            inside &= ((b[0] - a[0]) * (gy - a[1])
                       - (b[1] - a[1]) * (gx - a[0])) >= 0
        want = inside.mean() * 100.0
        got = 0.0 if out is None else _area(out)
        assert got == pytest.approx(want, abs=0.15)


def test_clip_parts_points_filter():
    pts = [np.array([(1.0, 1.0), (11.0, 5.0), (5.0, 5.0)])]
    out = clip_parts(pts, True, False, *R)
    assert len(out) == 1 and len(out[0]) == 2


def test_tiling_ships_only_local_vertices(ray_session):
    """A long line across many z4 tiles: every emitted tile's MVT
    coords stay within the buffered extent, and a bbox-only tile
    (corner miss) emits nothing."""
    import pyarrow as pa
    import ray.data as rd

    from versatiles_rs_ray.core import mvt
    from versatiles_rs_ray.sources.geojson import features_to_mvt_tiles

    import json

    geom = {"type": "LineString",
            "coordinates": [[-170.0, 2.0], [170.0, 2.5]]}
    ds = rd.from_arrow(pa.table({
        "lon": pa.array([0.0], type=pa.float64()),
        "lat": pa.array([0.0], type=pa.float64()),
        "geom_type": pa.array(["LineString"]),
        "geometry": pa.array([json.dumps(geom)]),
        "properties": pa.array(["{}"]),
    }))
    tiles = features_to_mvt_tiles(ds, 4).take_all()
    assert len(tiles) >= 14  # spans most of the equator row
    for t in tiles:
        tile = mvt.decode_tile(t["payload"])
        for layer in tile["layers"]:
            for f in layer["features"]:
                for part in f["geometry"]:
                    arr = np.asarray(part, dtype=np.float64)
                    assert arr.min() >= -64 - 1
                    assert arr.max() <= 4096 + 64 + 1
                    # local geometry only: a whole-feature copy would
                    # span the full mercator width (~65k units/tile)
                    assert arr[:, 0].ptp() <= 4096 + 2 * 64 + 2
