"""SemDeDup (stages/embed.semantic_dedup): brute-force flag equality,
keep-lowest-id rule, cluster isolation, trained-centroid variant."""

import numpy as np
import pyarrow as pa
import pytest

from versatiles_rs_ray.stages import embed


def _ds(mat):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "vec_id": pa.array(range(len(mat)), type=pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              type=pa.list_(pa.float64())),
    }))


def _brute(mat, n_cells, tau):
    m = np.asarray(mat, dtype=np.float64)
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
    cent = np.zeros((n_cells, m.shape[1]))
    cnt = np.zeros(n_cells)
    for i, r in enumerate(m):
        cent[i % n_cells] += r
        cnt[i % n_cells] += 1
    cent /= np.maximum(cnt, 1.0)[:, None]
    cn = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-300)
    cell = np.argmax(mn @ cn.T, axis=1)
    dup = np.zeros(len(m), dtype=bool)
    for i in range(len(m)):
        for j in range(i):
            if cell[j] == cell[i] and mn[i] @ mn[j] >= tau:
                dup[i] = True
                break
    return cell, dup


@pytest.mark.parametrize("tau", [0.3, 0.8, 0.99])
def test_brute_force_equality(ray_session, tau):
    rng = np.random.default_rng(7)
    base = rng.normal(size=(12, 16))
    # paraphrase-shaped corpus: each base vector plus small-noise copies
    mat = np.concatenate([base, base + 0.05 * rng.normal(size=base.shape),
                          rng.normal(size=(20, 16))])
    got = embed.semantic_dedup(_ds(mat), n_cells=4, dim=16, threshold=tau,
                               num_partitions=4).to_pandas()
    got = got.sort_values("vec_id").reset_index(drop=True)
    cell, dup = _brute(mat, 4, tau)
    assert (got["cell"].to_numpy() == cell).all()
    assert (got["is_dup"].to_numpy() == dup).all()


def test_near_copies_flagged_originals_kept(ray_session):
    rng = np.random.default_rng(3)
    base = rng.normal(size=(8, 32))
    noisy = base + 1e-3 * rng.normal(size=base.shape)
    mat = np.concatenate([base, noisy])
    got = embed.semantic_dedup(_ds(mat), n_cells=2, dim=32, threshold=0.98,
                               num_partitions=4).to_pandas()
    got = got.sort_values("vec_id").reset_index(drop=True)
    # each near-copy (ids 8..15) shares a cell with its original
    # (ids 0..7, lower id) at cosine ~1 -> flagged; originals survive
    # because no two base directions are close at n=8 / d=32
    assert not got["is_dup"][:8].any()
    assert got["is_dup"][8:].all()


def test_trained_centroids_variant(ray_session):
    rng = np.random.default_rng(11)
    mat = rng.normal(size=(40, 16))
    cent = embed.ivf_train(_ds(mat), n_centroids=4, dim=16, iters=2)
    out = embed.semantic_dedup(_ds(mat), n_cells=4, dim=16, threshold=0.9,
                               centroids=cent, num_partitions=4).to_pandas()
    assert len(out) == 40
    assert set(out.columns) == {"vec_id", "cell", "is_dup"}
    # cells must agree with the engine's own assignment rule
    asgn = embed.ivf_assign(_ds(mat), cent).to_pandas()
    merged = out.merge(asgn[["vec_id", "ivf_cell"]], on="vec_id")
    assert (merged["cell"] == merged["ivf_cell"]).all()


def test_dups_only_within_cluster(ray_session):
    # identical vectors forced into DIFFERENT cells by vec_id % n_cells
    # centroid seeding can still co-assign them (same cosine to every
    # centroid); craft orthogonal cluster directions instead
    a = np.eye(4)[0] * 5
    b = np.eye(4)[1] * 5
    mat = np.stack([a, b, a, b])  # cells from fixed_centroids: 0,1,0,1
    got = embed.semantic_dedup(_ds(mat), n_cells=2, dim=4, threshold=0.99,
                               num_partitions=2).to_pandas()
    got = got.sort_values("vec_id").reset_index(drop=True)
    assert list(got["is_dup"]) == [False, False, True, True]
    assert got["cell"][0] == got["cell"][2]
    assert got["cell"][1] == got["cell"][3]
