"""idw_grid (stages/interpolate): exact equality vs a scalar reference
of the same quantized kernel, radius cutoff, partition invariance,
block-boundary coverage, validation."""

import numpy as np
import pyarrow as pa
import pytest

from versatiles_rs_ray.stages.interpolate import (D2_QUANT, SCALE, VAL_MICRO,
                                                  idw_grid)

BBOX = (-20.0, -10.0, 28.0, 14.0)
NX, NY = 24, 12


def _ref(x, y, v, bbox, nx, ny, radius):
    x0, y0, x1, y1 = bbox
    dx, dy = (x1 - x0) / nx, (y1 - y0) / ny
    out = {}
    for gx in range(nx):
        for gy in range(ny):
            cx = x0 + (gx + 0.5) * dx
            cy = y0 + (gy + 0.5) * dy
            den = num = 0
            for i in range(len(x)):
                d2 = (x[i] - cx) * (x[i] - cx) + (y[i] - cy) * (y[i] - cy)
                if d2 <= radius * radius:
                    w = SCALE // (1 + int(np.floor(d2 * D2_QUANT)))
                    den += w
                    num += w * int(v[i])
            if den:
                out[(gx, gy)] = (den, num, num * VAL_MICRO // den)
    return out


def _pts(n, seed):
    rng = np.random.default_rng(seed)
    x = rng.uniform(BBOX[0] - 5, BBOX[2] + 5, n)
    y = rng.uniform(BBOX[1] - 5, BBOX[3] + 5, n)
    v = rng.integers(0, 5000, n).astype(np.int64)
    return x, y, v


def _ds(x, y, v, parts=None):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "lon": pa.array(x, type=pa.float64()),
        "lat": pa.array(y, type=pa.float64()),
        "val": pa.array(v, type=pa.int64()),
    }))
    return ds.repartition(parts) if parts else ds


def _got(tbl):
    return {(gx, gy): (d, n, m) for gx, gy, d, n, m in zip(
        tbl["gx"].to_pylist(), tbl["gy"].to_pylist(),
        tbl["den"].to_pylist(), tbl["num"].to_pylist(),
        tbl["value_micro"].to_pylist())}


@pytest.mark.parametrize("radius,seed", [(3.0, 1), (8.0, 2), (0.7, 3)])
def test_matches_scalar_reference(ray_session, radius, seed):
    x, y, v = _pts(120, seed)
    got = pa.concat_tables([pa.table(b) for b in idw_grid(
        _ds(x, y, v), "val", BBOX, NX, NY, radius)
        .iter_batches(batch_format="pyarrow")])
    assert _got(got) == _ref(x, y, v, BBOX, NX, NY, radius)


def test_partition_invariance(ray_session):
    x, y, v = _pts(150, 7)
    a = idw_grid(_ds(x, y, v), "val", BBOX, NX, NY, 4.0).to_pandas()
    b = idw_grid(_ds(x, y, v, parts=6), "val", BBOX, NX, NY, 4.0,
                 num_partitions=5).to_pandas()
    key = ["gx", "gy"]
    cols = key + ["den", "num", "value_micro"]
    assert a.sort_values(key)[cols].reset_index(drop=True).equals(
        b.sort_values(key)[cols].reset_index(drop=True))


def test_single_point_radius(ray_session):
    # one point: only pixels within the radius get rows, value is the
    # point's value exactly (weighted mean of one point)
    x = np.array([BBOX[0] + 1.0])
    y = np.array([BBOX[1] + 1.0])
    v = np.array([321], dtype=np.int64)
    got = idw_grid(_ds(x, y, v), "val", BBOX, NX, NY, 2.5).to_pandas()
    assert len(got) > 0
    assert (got["value_micro"] == 321 * VAL_MICRO).all()
    ref = _ref(x, y, v, BBOX, NX, NY, 2.5)
    assert len(got) == len(ref)


def test_validation(ray_session):
    x, y, v = _pts(5, 1)
    with pytest.raises(ValueError):
        idw_grid(_ds(x, y, v), "val", BBOX, 0, NY, 1.0)
    with pytest.raises(ValueError):
        idw_grid(_ds(x, y, v), "val", BBOX, NX, NY, -1.0)
    with pytest.raises(ValueError):
        idw_grid(_ds(x, y, v), "val", (5, 5, 5, 6), NX, NY, 1.0)
