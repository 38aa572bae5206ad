"""Hashed tf-idf (stages/tfidf): brute-force weight equality, dense ==
exploded consistency, embedding-stack integration, edge cases."""

import numpy as np
import pyarrow as pa
import pytest

from versatiles_rs_ray.stages.tfidf import hashed_tfidf, tfidf_vectors

DOCS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "cats and dogs and cats",
    "",
    "completely unrelated prose about engines",
]


def _ds(docs):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "text": pa.array(docs, type=pa.string()),
    }))


def _fnv(s: str) -> int:
    h = 14695981039346656037
    for b in s.encode():
        h = ((h ^ b) * 1099511628211) % (1 << 64)
    return h


def _brute(docs, dim):
    rows = {}
    df = np.zeros(dim, dtype=np.int64)
    n_docs = 0
    per_doc = []
    for i, d in enumerate(docs):
        toks = d.split()
        if not toks:
            per_doc.append(None)
            continue
        n_docs += 1
        tf = {}
        for t in toks:
            b = _fnv(t) % dim
            tf[b] = tf.get(b, 0) + 1
        for b in tf:
            df[b] += 1
        per_doc.append((i, tf))
    idf = np.log((n_docs + 1.0) / (df + 1.0)) + 1.0
    for e in per_doc:
        if e is None:
            continue
        i, tf = e
        for b, c in sorted(tf.items()):
            rows[(i, b)] = (c, int(np.floor(1e6 * (c * idf[b]) + 0.5)))
    return rows


@pytest.mark.parametrize("dim", [8, 64, 1024])
def test_brute_force_equality(ray_session, dim):
    out = hashed_tfidf(_ds(DOCS), dim=dim).to_pandas()
    want = _brute(DOCS, dim)
    got = {(int(r.doc_id), int(r.bucket)): (int(r.tf), int(r.w_micro))
           for r in out.itertuples()}
    assert got == want


def test_dense_matches_exploded(ray_session):
    dim = 32
    exp = hashed_tfidf(_ds(DOCS), dim=dim).to_pandas()
    dense = tfidf_vectors(_ds(DOCS), dim=dim).to_pandas()
    dv = {int(r.vec_id): np.asarray(r.embedding) for r in dense.itertuples()}
    assert set(dv) == set(exp["doc_id"])  # empty doc emits no vector
    for r in exp.itertuples():
        assert dv[int(r.doc_id)][int(r.bucket)] == r.w_micro / 1e6
    # zero everywhere the exploded rows don't cover
    nnz = exp.groupby("doc_id").size()
    for i, v in dv.items():
        assert (v != 0).sum() == nnz[i]


def test_feeds_embedding_stack(ray_session):
    vec = tfidf_vectors(_ds(DOCS), dim=32)
    from versatiles_rs_ray.stages import embed

    flags = embed.semantic_dedup(vec, n_cells=2, dim=32, threshold=0.999,
                                 num_partitions=2).to_pandas()
    assert len(flags) == 4  # the empty doc has no vector
    # tf-idf of distinct docs is not near-identical at this threshold
    assert not flags["is_dup"].any()


def test_validation_and_empty(ray_session):
    with pytest.raises(ValueError, match="dim"):
        hashed_tfidf(_ds(DOCS), dim=0)
    out = hashed_tfidf(_ds(["", "   "]), dim=16)
    assert out.count() == 0
