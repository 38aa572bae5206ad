"""DBSCAN (stages/cluster): equality vs a scalar reference of the
same deterministic contract (min-id cluster labels, min-label border
assignment), pair-generation exactness vs brute force, partition
invariance, degenerate inputs."""

import collections

import numpy as np
import pyarrow as pa
import pytest

from versatiles_rs_ray.stages.cluster import dbscan, eps_pairs


def _ref_dbscan(ids, x, y, eps, min_pts):
    n = len(ids)
    dx = x[:, None] - x[None, :]
    dy = y[:, None] - y[None, :]
    adj = (dx * dx + dy * dy <= eps * eps) & ~np.eye(n, dtype=bool)
    deg = adj.sum(1)
    core = deg + 1 >= min_pts
    lbl = {}
    for s in range(n):
        if not core[s] or ids[s] in lbl:
            continue
        seen = [s]
        q = collections.deque([s])
        while q:
            u = q.popleft()
            for v in np.flatnonzero(adj[u] & core):
                if v not in seen:
                    seen.append(v)
                    q.append(v)
        m = min(ids[v] for v in seen)
        for v in seen:
            lbl[ids[v]] = m
    out = {}
    for i in range(n):
        if core[i]:
            out[ids[i]] = (lbl[ids[i]], 1)
        else:
            cn = [lbl[ids[j]] for j in np.flatnonzero(adj[i] & core)]
            out[ids[i]] = (min(cn) if cn else -1, 0)
    return out


def _pts_ds(ids, x, y, parts=None):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "doc_num": pa.array(ids, type=pa.int64()),
        "lon": pa.array(x, type=pa.float64()),
        "lat": pa.array(y, type=pa.float64()),
    }))
    return ds.repartition(parts) if parts else ds


def _rand(n, seed, span=80.0):
    rng = np.random.default_rng(seed)
    ids = rng.permutation(n).astype(np.int64) * 7 + 3
    return ids, rng.uniform(-span, span, n), rng.uniform(-span / 2, span / 2, n)


def _got_map(tbl):
    return {d: (c, k) for d, c, k in zip(tbl["doc_num"].to_pylist(),
                                         tbl["cluster"].to_pylist(),
                                         tbl["is_core"].to_pylist())}


@pytest.mark.parametrize("eps,min_pts,seed", [(6.0, 3, 1), (10.0, 4, 2),
                                              (3.0, 2, 3), (25.0, 6, 4)])
def test_matches_scalar_reference(ray_session, eps, min_pts, seed):
    ids, x, y = _rand(220, seed)
    got = pa.concat_tables(
        [pa.table(b) for b in dbscan(_pts_ds(ids, x, y), eps, min_pts)
         .iter_batches(batch_format="pyarrow")])
    want = _ref_dbscan(ids, x, y, eps, min_pts)
    assert _got_map(got) == want


def test_eps_pairs_exact(ray_session):
    ids, x, y = _rand(150, 7)
    eps = 8.0
    got = pa.concat_tables(
        [pa.table(b) for b in eps_pairs(_pts_ds(ids, x, y), eps)
         .iter_batches(batch_format="pyarrow")])
    pairs = set(zip(got["doc_a"].to_pylist(), got["doc_b"].to_pylist()))
    assert len(pairs) == got.num_rows  # exactly-once emission
    dx = x[:, None] - x[None, :]
    dy = y[:, None] - y[None, :]
    adj = (dx * dx + dy * dy <= eps * eps) & ~np.eye(len(ids), dtype=bool)
    want = {(int(ids[i]), int(ids[j])) for i, j in zip(*np.nonzero(adj))}
    assert pairs == want


def test_partition_invariance(ray_session):
    ids, x, y = _rand(200, 11)
    a = dbscan(_pts_ds(ids, x, y), 7.0, 3).to_pandas()
    b = dbscan(_pts_ds(ids, x, y, parts=9), 7.0, 3,
               num_partitions=5).to_pandas()
    key = ["doc_num", "cluster", "is_core"]
    assert a.sort_values("doc_num")[key].reset_index(drop=True).equals(
        b.sort_values("doc_num")[key].reset_index(drop=True))


def test_min_pts_one_all_core(ray_session):
    # min_pts=1: every point is a core singleton unless linked
    ids = np.array([5, 9], dtype=np.int64)
    x = np.array([0.0, 50.0])
    y = np.array([0.0, 0.0])
    got = _got_map(pa.concat_tables(
        [pa.table(b) for b in dbscan(_pts_ds(ids, x, y), 1.0, 1)
         .iter_batches(batch_format="pyarrow")]))
    assert got == {5: (5, 1), 9: (9, 1)}


def test_all_noise(ray_session):
    ids, x, y = _rand(50, 13, span=5000.0)
    got = dbscan(_pts_ds(ids, x, y), 0.5, 3).to_pandas()
    assert (got["cluster"] == -1).all() and (got["is_core"] == 0).all()
    assert len(got) == 50


def test_validation(ray_session):
    ids, x, y = _rand(5, 17)
    with pytest.raises(ValueError):
        dbscan(_pts_ds(ids, x, y), -1.0, 3)
    with pytest.raises(ValueError):
        dbscan(_pts_ds(ids, x, y), 1.0, 0)


def test_dense_cell_chunks_within_group(ray_session, monkeypatch):
    """One over-dense grid cell must split across PAIR_CHUNK slices
    (the chunk loop walks the flattened pair-index space, not group
    boundaries) and still emit the exact pair set."""
    from versatiles_rs_ray.stages import cluster as cl

    monkeypatch.setattr(cl, "PAIR_CHUNK", 7)
    rng = np.random.default_rng(3)
    n = 40
    ids = np.arange(n, dtype=np.int64) * 3 + 1
    # everything inside one eps-cell -> a single group of ~n*9n pairs
    x = rng.uniform(0.0, 0.5, n)
    y = rng.uniform(0.0, 0.5, n)
    eps = 5.0
    got = pa.concat_tables(
        [pa.table(b) for b in eps_pairs(_pts_ds(ids, x, y), eps)
         .iter_batches(batch_format="pyarrow")])
    pairs = set(zip(got["doc_a"].to_pylist(), got["doc_b"].to_pylist()))
    assert len(pairs) == got.num_rows
    dx = x[:, None] - x[None, :]
    dy = y[:, None] - y[None, :]
    adj = (dx * dx + dy * dy <= eps * eps) & ~np.eye(n, dtype=bool)
    want = {(int(ids[i]), int(ids[j])) for i, j in zip(*np.nonzero(adj))}
    assert pairs == want


def _bi_ds(ids, x, y, idn="doc_num", parts=None):
    import ray.data as rd

    t = pa.table({idn: pa.array(ids, type=pa.int64()),
                  "lon": pa.array(x, type=pa.float64()),
                  "lat": pa.array(y, type=pa.float64())})
    ds = rd.from_arrow(t)
    return ds.repartition(parts) if parts else ds


def _bi_want(ids_l, xl, yl, ids_r, xr, yr, eps):
    dx = xl[:, None] - xr[None, :]
    dy = yl[:, None] - yr[None, :]
    adj = dx * dx + dy * dy <= eps * eps
    return {(int(ids_l[i]), int(ids_r[j])) for i, j in zip(*np.nonzero(adj))}


def test_within_join_matches_brute(ray_session):
    from versatiles_rs_ray.stages.cluster import within_join

    rng = np.random.default_rng(5)
    nl, nr = 180, 40
    il = np.arange(nl, dtype=np.int64) * 2
    ir = np.arange(nr, dtype=np.int64) * 2 + 1
    xl, yl = rng.uniform(-60, 60, nl), rng.uniform(-30, 30, nl)
    xr, yr = rng.uniform(-60, 60, nr), rng.uniform(-30, 30, nr)
    for eps in (4.0, 11.0):
        got = within_join(_bi_ds(il, xl, yl), _bi_ds(ir, xr, yr),
                          eps).to_pandas()
        pairs = set(zip(got["left_id"], got["right_id"]))
        assert len(pairs) == len(got)  # exactly-once emission
        assert pairs == _bi_want(il, xl, yl, ir, xr, yr, eps)


def test_within_join_partition_invariance_and_chunking(ray_session,
                                                       monkeypatch):
    from versatiles_rs_ray.stages import cluster as cl

    monkeypatch.setattr(cl, "PAIR_CHUNK", 5)
    rng = np.random.default_rng(9)
    nl, nr = 70, 30
    il = np.arange(nl, dtype=np.int64)
    ir = np.arange(nr, dtype=np.int64) + 1000
    xl, yl = rng.uniform(0, 1.0, nl), rng.uniform(0, 1.0, nl)  # one cell
    xr, yr = rng.uniform(0, 1.0, nr), rng.uniform(0, 1.0, nr)
    eps = 3.0
    a = cl.within_join(_bi_ds(il, xl, yl), _bi_ds(ir, xr, yr),
                       eps).to_pandas()
    b = cl.within_join(_bi_ds(il, xl, yl, parts=7),
                       _bi_ds(ir, xr, yr, parts=3), eps,
                       num_partitions=5).to_pandas()
    pa_set = set(zip(a["left_id"], a["right_id"]))
    assert pa_set == set(zip(b["left_id"], b["right_id"]))
    assert pa_set == _bi_want(il, xl, yl, ir, xr, yr, eps)


def test_within_join_empty_right(ray_session):
    from versatiles_rs_ray.stages.cluster import within_join

    il = np.array([1, 2], dtype=np.int64)
    got = within_join(
        _bi_ds(il, np.array([0.0, 1.0]), np.array([0.0, 1.0])),
        _bi_ds(np.array([], dtype=np.int64), np.array([]),
               np.array([])), 5.0)
    assert got.count() == 0


def test_within_join_validation(ray_session):
    from versatiles_rs_ray.stages.cluster import within_join

    il = np.array([1], dtype=np.int64)
    ds = _bi_ds(il, np.array([0.0]), np.array([0.0]))
    with pytest.raises(ValueError):
        within_join(ds, ds, 0.0)


def test_cluster_stats_query_matches_scalar(ray_session):
    """cluster_stats composition vs a scalar recompute over the same
    derived points (sf0.001)."""
    import sys

    sys.path.insert(0, "tools")
    import duckdb
    from selfcheck import canon

    from versatiles_rs_ray import queries as Q

    sf = "/root/testdata/sf0.001"
    mine = Q.QUERIES["cluster_stats"](sf).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = con.execute(Q.ORACLES["cluster_stats"]).fetchdf()
    assert len(mine) == len(want) and len(mine) > 0
    import pandas as pd

    pd.testing.assert_frame_equal(canon(mine), canon(want))
