"""triangle_stats (stages/graph): per-node triangle counts and
clustering coefficients vs the A^3-diagonal reference, known small
graphs, partition invariance, triangle-free graphs."""

import numpy as np
import pyarrow as pa

from versatiles_rs_ray.stages.graph import CLUS_MICRO, triangle_stats


def _pairs_ds(adj, ids, parts=None):
    import ray.data as rd

    i, j = np.nonzero(adj)
    ds = rd.from_arrow(pa.table({
        "doc_a": pa.array(ids[i], type=pa.int64()),
        "doc_b": pa.array(ids[j], type=pa.int64()),
    }))
    return ds.repartition(parts) if parts else ds


def _ref(adj, ids):
    deg = adj.sum(1)
    tri2 = np.diag(adj.astype(np.int64) @ adj @ adj)  # = 2*T per node
    out = {}
    for k in range(len(ids)):
        if deg[k] == 0:
            continue
        d = int(deg[k])
        cnt = int(tri2[k])
        clus = (cnt * CLUS_MICRO) // (d * (d - 1)) if d >= 2 else 0
        out[int(ids[k])] = (d, cnt // 2, clus)
    return out


def _rand_adj(n, p, seed):
    rng = np.random.default_rng(seed)
    a = rng.random((n, n)) < p
    a = np.triu(a, 1)
    return (a | a.T)


def _got(ds):
    tabs = [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    if not tabs:
        return {}
    t = pa.concat_tables(tabs)
    return {d: (g, tr, c) for d, g, tr, c in zip(
        t["doc_num"].to_pylist(), t["deg"].to_pylist(),
        t["triangles"].to_pylist(), t["clus_micro"].to_pylist())}


def test_known_graphs(ray_session):
    # K4: every node deg 3, 3 triangles each, coefficient 1
    ids = np.array([3, 7, 11, 20], dtype=np.int64)
    adj = ~np.eye(4, dtype=bool)
    got = _got(triangle_stats(_pairs_ds(adj, ids)))
    assert got == {int(i): (3, 3, CLUS_MICRO) for i in ids}
    # path a-b-c: no triangles, middle coefficient 0
    ids = np.array([1, 2, 3], dtype=np.int64)
    adj = np.array([[0, 1, 0], [1, 0, 1], [0, 1, 0]], dtype=bool)
    got = _got(triangle_stats(_pairs_ds(adj, ids)))
    assert got == {1: (1, 0, 0), 2: (2, 0, 0), 3: (1, 0, 0)}


def test_matches_matrix_reference(ray_session):
    for seed, p in ((1, 0.08), (2, 0.2)):
        ids = (np.arange(60, dtype=np.int64) * 13 + 5)
        adj = _rand_adj(60, p, seed)
        got = _got(triangle_stats(_pairs_ds(adj, ids)))
        assert got == _ref(adj, ids)


def test_partition_invariance(ray_session):
    ids = np.arange(80, dtype=np.int64) + 100
    adj = _rand_adj(80, 0.12, 9)
    a = _got(triangle_stats(_pairs_ds(adj, ids)))
    b = _got(triangle_stats(_pairs_ds(adj, ids, parts=7),
                            num_partitions=5))
    assert a == b


def test_empty_graph(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "doc_a": pa.array([], type=pa.int64()),
        "doc_b": pa.array([], type=pa.int64())}))
    assert _got(triangle_stats(ds)) == {}


def test_degree_cap_hub_graph(ray_session, caplog):
    """Zipf-ish hub graph: a hub wired to everyone plus a K3 among
    leaves. With max_degree below the hub degree, hub-incident edges
    are removed before the wedge pass, so the result equals the EXACT
    reference on the hub-free subgraph (degrees still full-graph) —
    a true lower bound everywhere — and the skip is logged loudly.
    With the cap above the hub degree (and with cap=None) the exact
    full-graph reference holds."""
    import logging

    n = 12
    adj = np.zeros((n, n), dtype=bool)
    adj[0, 1:] = adj[1:, 0] = True          # node 0: hub, deg 11
    for a, b in ((1, 2), (2, 3), (1, 3)):   # K3 among leaves 1,2,3
        adj[a, b] = adj[b, a] = True
    ids = np.arange(n, dtype=np.int64) + 50
    ref = _ref(adj, ids)

    with caplog.at_level(logging.WARNING,
                         logger="versatiles_rs_ray.stages.graph"):
        got = _got(triangle_stats(_pairs_ds(adj, ids), max_degree=5))
    assert any("max_degree=5" in r.message for r in caplog.records)
    # Expected: triangle counts of the hub-free subgraph (only the
    # leaf K3 survives), degrees from the FULL graph, clus_micro from
    # the surviving count over the full-graph degree.
    sub = adj.copy()
    sub[0, :] = sub[:, 0] = False
    deg_full = adj.sum(1)
    tri2_sub = np.diag(sub.astype(np.int64) @ sub @ sub)
    from versatiles_rs_ray.stages.graph import CLUS_MICRO as MIC
    for k in range(n):
        d, cnt = int(deg_full[k]), int(tri2_sub[k])
        clus = (cnt * MIC) // (d * (d - 1)) if d >= 2 else 0
        assert got[50 + k] == (d, cnt // 2, clus), k
        assert got[50 + k][1] <= ref[50 + k][1]  # true lower bound

    # cap above every degree == exact everywhere; None == exact.
    assert _got(triangle_stats(_pairs_ds(adj, ids), max_degree=64)) == ref
    assert _got(triangle_stats(_pairs_ds(adj, ids), max_degree=None)) == ref
