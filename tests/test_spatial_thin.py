"""spatial_thin (stages/assign): per-tile density cap equality vs a
scalar reference of the same Knuth-priority rule, cap semantics,
partition invariance, int-key routing through quota_per_key."""

import numpy as np
import pyarrow as pa
import pytest

from versatiles_rs_ray.core import coords
from versatiles_rs_ray.stages.assign import spatial_thin
from versatiles_rs_ray.stages.curate import _SHUFFLE_MULT


def _pts(n, seed):
    rng = np.random.default_rng(seed)
    ids = rng.permutation(n).astype(np.int64)
    lon = rng.uniform(-179, 179, n)
    lat = rng.uniform(-80, 80, n)
    return ids, lon, lat


def _ds(ids, lon, lat, parts=None):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "doc_num": pa.array(ids, type=pa.int64()),
        "lon": pa.array(lon, type=pa.float64()),
        "lat": pa.array(lat, type=pa.float64()),
    }))
    return ds.repartition(parts) if parts else ds


def _ref(ids, lon, lat, zoom, k):
    x, y = coords.lonlat_to_tile(lon, lat, zoom)
    pri = ids.astype(np.uint64) * np.uint64(_SHUFFLE_MULT)
    keep = set()
    for tx, ty in {(int(a), int(b)) for a, b in zip(x, y)}:
        m = np.flatnonzero((x == tx) & (y == ty))
        order = m[np.argsort(pri[m], kind="stable")][:k]
        keep.update(int(ids[i]) for i in order)
    return keep


@pytest.mark.parametrize("zoom,k", [(2, 3), (3, 1), (1, 10)])
def test_matches_reference(ray_session, zoom, k):
    ids, lon, lat = _pts(300, 5)
    got = spatial_thin(_ds(ids, lon, lat), zoom, k).to_pandas()
    assert set(got["doc_num"]) == _ref(ids, lon, lat, zoom, k)
    # cap holds per tile
    assert got.groupby(["x", "y"]).size().max() <= k


def test_partition_invariance(ray_session):
    ids, lon, lat = _pts(250, 9)
    a = spatial_thin(_ds(ids, lon, lat), 2, 5).to_pandas()
    b = spatial_thin(_ds(ids, lon, lat, parts=7), 2, 5,
                     num_partitions=3).to_pandas()
    cols = ["doc_num", "z", "x", "y"]
    assert a.sort_values("doc_num")[cols].reset_index(drop=True).equals(
        b.sort_values("doc_num")[cols].reset_index(drop=True))


def test_zoom_in_superset(ray_session):
    # the tippecanoe contract: the same priority rule at a higher cap
    # keeps every previously-kept feature
    ids, lon, lat = _pts(200, 3)
    small = spatial_thin(_ds(ids, lon, lat), 2, 2).to_pandas()
    big = spatial_thin(_ds(ids, lon, lat), 2, 6).to_pandas()
    assert set(small["doc_num"]) <= set(big["doc_num"])


def test_validation(ray_session):
    ids, lon, lat = _pts(5, 1)
    with pytest.raises(ValueError):
        spatial_thin(_ds(ids, lon, lat), 2, 0)
