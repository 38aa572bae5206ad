"""True point-in-polygon join (stages/join.PolygonJoin /
polygon_join_bucketed): even-odd semantics vs a scalar reference,
non-convex notches, horizontal edges, broadcast==bucketed equality."""

import numpy as np
import pyarrow as pa
import pytest

from versatiles_rs_ray.stages.join import (PolygonJoin, _ray_cast,
                                           polygon_join_bucketed)


def _scalar_pip(px, py, verts):
    """Independent even-odd reference (classic PNPOLY loop)."""
    inside = False
    m = len(verts)
    for i in range(m):
        x1, y1 = verts[i]
        x2, y2 = verts[(i + 1) % m]
        if (y1 > py) != (y2 > py):
            if px < x1 + (py - y1) * (x2 - x1) / (y2 - y1):
                inside = not inside
    return inside


def _docs_ds(lon, lat):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_num": pa.array(range(len(lon)), type=pa.int64()),
        "lon": pa.array(lon, type=pa.float64()),
        "lat": pa.array(lat, type=pa.float64()),
    }))


def _polys_ds(polys):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "poly_id": pa.array([p[0] for p in polys], type=pa.int64()),
        "xs": pa.array([[v[0] for v in p[1]] for p in polys],
                       type=pa.list_(pa.float64())),
        "ys": pa.array([[v[1] for v in p[1]] for p in polys],
                       type=pa.list_(pa.float64())),
    }))


TRIANGLE = [(0.0, 0.0), (10.0, 0.0), (5.0, 10.0)]
# arrowhead: concave notch at (5, 4) — points in the notch are OUTSIDE
ARROW = [(0.0, 0.0), (10.0, 0.0), (5.0, 4.0), (10.0, 8.0), (0.0, 8.0)]


def test_ray_cast_matches_scalar_reference():
    rng = np.random.default_rng(5)
    px = rng.uniform(-2, 12, 400)
    py = rng.uniform(-2, 12, 400)
    for verts in (TRIANGLE, ARROW):
        vx = np.array([v[0] for v in verts])
        vy = np.array([v[1] for v in verts])
        got = _ray_cast(px, py, vx, vy)
        want = np.array([_scalar_pip(x, y, verts) for x, y in zip(px, py)])
        assert (got == want).all()


def test_concave_notch():
    vx = np.array([v[0] for v in ARROW])
    vy = np.array([v[1] for v in ARROW])
    # (7, 4) sits in the notch (outside); (2, 4) is in the body
    got = _ray_cast(np.array([7.0, 2.0]), np.array([4.0, 4.0]), vx, vy)
    assert list(got) == [False, True]


def test_horizontal_edges_are_safe():
    square = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]
    vx = np.array([v[0] for v in square])
    vy = np.array([v[1] for v in square])
    px = np.array([5.0, 5.0, 15.0, 5.0])
    py = np.array([5.0, 0.0, 5.0, 10.0])  # inside, on bottom edge, right, on top
    got = _ray_cast(px, py, vx, vy)
    assert got[0] and not got[2]
    # boundary rows must not crash; semantics are even-odd's standard
    # half-open behavior (bottom edge in, top edge out)
    assert bool(got[1]) is True and bool(got[3]) is False


def test_broadcast_join(ray_session):
    rng = np.random.default_rng(9)
    lon = rng.uniform(-20, 20, 300)
    lat = rng.uniform(-20, 20, 300)
    polys = [(7, TRIANGLE), (8, [(v[0] - 15, v[1] - 15) for v in ARROW])]
    out = PolygonJoin(polys)(pa.table({
        "doc_num": pa.array(range(300), type=pa.int64()),
        "lon": pa.array(lon), "lat": pa.array(lat)}))
    got = set(zip(out["doc_num"].to_pylist(), out["poly_id"].to_pylist()))
    want = set()
    for pid, verts in polys:
        for i, (x, y) in enumerate(zip(lon, lat)):
            if _scalar_pip(x, y, verts):
                want.add((i, pid))
    assert got == want
    assert len(want) > 10  # fixture actually exercises containment


@pytest.mark.parametrize("zoom", [1, 3, 5])
def test_bucketed_equals_broadcast(ray_session, zoom):
    rng = np.random.default_rng(11)
    lon = rng.uniform(-170, 170, 500)
    lat = rng.uniform(-60, 60, 500)
    polys = [(1, [(-150, -50), (-30, -45), (-95, 45)]),
             (2, [(10, -20), (80, -50), (60, 10), (80, 55)]),
             (3, [(-60, -30), (60, -30), (60, 30), (-60, 30)])]
    ds = _docs_ds(lon, lat)
    broad = PolygonJoin(polys)
    b = ds.map_batches(broad, batch_format="pyarrow").to_pandas()
    k = polygon_join_bucketed(ds, _polys_ds(polys), zoom=zoom,
                              num_partitions=8).to_pandas()
    sb = set(zip(b["doc_num"], b["poly_id"]))
    sk = set(zip(k["doc_num"], k["poly_id"]))
    assert sb == sk and len(sb) > 50
    assert len(k) == len(sk)  # each pair exactly once


def test_validation():
    with pytest.raises(ValueError, match=">=3"):
        PolygonJoin([(1, [(0, 0), (1, 1)])])
