"""STR-packed R-tree (core/strtree): brute-force equality, packing
invariants, and the indexed join paths (PolygonJoin / RectJoin with
use_index) against their scan-path twins."""

import numpy as np
import pyarrow as pa
import pytest

from versatiles_rs_ray.core.strtree import STRtree


def _rand_boxes(rng, n, extent=100.0, wmax=5.0):
    c = rng.uniform(0, extent, (n, 2))
    w = rng.uniform(0.05, wmax, (n, 2))
    return np.column_stack([c - w, c + w])


@pytest.mark.parametrize("n", [0, 1, 2, 15, 16, 17, 257, 4096])
@pytest.mark.parametrize("cap", [2, 7, 16])
def test_query_points_equals_bruteforce(n, cap):
    rng = np.random.default_rng(n * 31 + cap)
    boxes = _rand_boxes(rng, n)
    t = STRtree(boxes, leaf_cap=cap)
    px = rng.uniform(-5, 105, 500)
    py = rng.uniform(-5, 105, 500)
    qi, ii = t.query_points(px, py)
    got = set(zip(qi.tolist(), ii.tolist()))
    want = set()
    for j in range(n):
        m = ((px >= boxes[j, 0]) & (px <= boxes[j, 2])
             & (py >= boxes[j, 1]) & (py <= boxes[j, 3]))
        want |= {(int(i), j) for i in np.flatnonzero(m)}
    assert got == want


@pytest.mark.parametrize("n", [0, 3, 40, 1000])
def test_query_boxes_equals_bruteforce(n):
    rng = np.random.default_rng(n + 7)
    boxes = _rand_boxes(rng, n)
    t = STRtree(boxes, leaf_cap=8)
    qb = _rand_boxes(rng, 64, wmax=2.0)
    qi, ii = t.query_boxes(qb)
    got = set(zip(qi.tolist(), ii.tolist()))
    want = set()
    for q in range(len(qb)):
        m = ((qb[q, 0] <= boxes[:, 2]) & (qb[q, 2] >= boxes[:, 0])
             & (qb[q, 1] <= boxes[:, 3]) & (qb[q, 3] >= boxes[:, 1]))
        want |= {(q, int(j)) for j in np.flatnonzero(m)}
    assert got == want


def test_inclusive_boundaries_and_validation():
    t = STRtree(np.array([[0.0, 0.0, 1.0, 1.0]]))
    qi, ii = t.query_points([0.0, 1.0, 1.0000001], [1.0, 0.0, 0.5])
    assert set(zip(qi.tolist(), ii.tolist())) == {(0, 0), (1, 0)}
    with pytest.raises(ValueError, match="N, 4"):
        STRtree(np.zeros((3, 3)))
    with pytest.raises(ValueError, match="leaf_cap"):
        STRtree(np.zeros((3, 4)), leaf_cap=1)


def test_build_is_deterministic():
    rng = np.random.default_rng(5)
    boxes = _rand_boxes(rng, 500)
    a, b = STRtree(boxes), STRtree(boxes)
    assert np.array_equal(a.perm, b.perm)
    for la, lb in zip(a.levels, b.levels):
        for k in ("x0", "y0", "x1", "y1", "start", "end"):
            assert np.array_equal(la[k], lb[k])


def _rand_polys(rng, n):
    polys = []
    for pid in range(n):
        cx, cy = rng.uniform(-170, 170), rng.uniform(-80, 80)
        m = rng.integers(3, 8)
        ang = np.sort(rng.uniform(0, 2 * np.pi, m))
        r = rng.uniform(0.5, 4.0, m)
        polys.append((pid, np.column_stack(
            [cx + r * np.cos(ang), cy + r * np.sin(ang)])))
    return polys


def test_polygon_join_indexed_equals_scan():
    from versatiles_rs_ray.stages.join import PolygonJoin

    rng = np.random.default_rng(9)
    polys = _rand_polys(rng, 200)  # above INDEX_THRESHOLD
    batch = pa.table({
        "doc_num": pa.array(np.arange(3000, dtype=np.int64)),
        "lon": pa.array(rng.uniform(-180, 180, 3000)),
        "lat": pa.array(rng.uniform(-85, 85, 3000)),
    })
    auto = PolygonJoin(polys)
    assert auto.tree is not None  # 200 >= threshold -> indexed
    scan = PolygonJoin(polys, use_index=False)
    assert scan.tree is None
    a = auto(batch).to_pandas().sort_values(["doc_num", "poly_id"])
    s = scan(batch).to_pandas().sort_values(["doc_num", "poly_id"])
    assert len(a) > 0  # the fixture actually joins something
    assert a.reset_index(drop=True).equals(s.reset_index(drop=True))


def test_rect_join_indexed_equals_scan_halfopen():
    from versatiles_rs_ray.stages.join import RectJoin

    rng = np.random.default_rng(13)
    rects = [(i, *np.sort(rng.uniform(0, 1, 2)), *np.sort(rng.uniform(0, 1, 2)))
             for i in range(150)]
    rects = [(i, a, c, b, d) for (i, a, b, c, d) in rects]
    lon = rng.uniform(-180, 180, 2000)
    lat = rng.uniform(-85, 85, 2000)
    batch = pa.table({
        "doc_num": pa.array(np.arange(2000, dtype=np.int64)),
        "lon": pa.array(lon), "lat": pa.array(lat),
    })
    idx = RectJoin(rects)
    assert idx.tree is not None
    scan = RectJoin(rects, use_index=False)
    a = idx(batch).to_pandas()[["doc_num", "rect_id"]] \
        .sort_values(["doc_num", "rect_id"]).reset_index(drop=True)
    s = scan(batch).to_pandas()[["doc_num", "rect_id"]] \
        .sort_values(["doc_num", "rect_id"]).reset_index(drop=True)
    assert len(a) > 0 and a.equals(s)

    # half-open edge: a doc exactly ON mx1/my1 must NOT join (the
    # inclusive tree candidate is discarded by the exact re-check)
    from versatiles_rs_ray.core import coords

    r = [(0, 0.25, 0.25, 0.5, 0.5)]
    j = RectJoin(r, use_index=True)
    assert j.tree is not None
    # invert mercator fraction 0.5, 0.25 to lon/lat
    lon_on = np.array([0.5 * 360.0 - 180.0])   # mx == 0.5 exactly
    my = np.array([0.25])
    lat_in = np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * my))))
    b = pa.table({"doc_num": pa.array([1], type=pa.int64()),
                  "lon": pa.array(lon_on), "lat": pa.array(lat_in)})
    mx_chk, _ = coords.mercator_fraction(lon_on, lat_in)
    assert mx_chk[0] == 0.5
    assert j(b).num_rows == 0
