"""Logistic-regression document classifier (stages/classify):
reference-equality under identical quantization, partitioning
invariance, convergence/accuracy on separable data, scoring edges."""

import numpy as np
import pyarrow as pa
import pytest

from versatiles_rs_ray.stages.classify import (_doc_features, score_logreg,
                                               train_logreg)

_Q = 1e8

POS = ["wiki style encyclopedic prose with citations and structure",
       "well formed encyclopedic article text with careful citations",
       "structured reference prose citations encyclopedic neutral tone",
       "encyclopedic neutral article with structure and references"]
NEG = ["buy cheap pills now click here casino bonus",
       "click casino bonus now cheap pills buy buy",
       "casino pills cheap click bonus now here spam",
       "spam spam click here buy now casino cheap"]


def _tbl(docs, labels):
    return pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "text": pa.array(docs, type=pa.string()),
        "label": pa.array(labels, type=pa.int64()),
    })


def _ds(tbl, blocks=1):
    import ray.data as rd

    if blocks == 1:
        return rd.from_arrow(tbl)
    step = max(1, tbl.num_rows // blocks)
    return rd.from_arrow_refs([__import__("ray").put(tbl.slice(i, step))
                               for i in range(0, tbl.num_rows, step)])


def _ref_train(docs, labels, dim, iters, lr, l2):
    """Single-process reference applying the IDENTICAL per-block
    quantization (one block = whole corpus)."""
    tbl = _tbl(docs, labels)
    x, has = _doc_features(tbl, "text", dim)
    x = x[np.asarray(has)]
    y = np.asarray(labels, dtype=np.float64)[np.asarray(has)]
    w, b = np.zeros(dim), 0.0
    hist = []
    q = lambda v: np.floor(v * _Q + 0.5).astype(np.int64)  # noqa: E731
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(x @ w + b)))
        err = p - y
        gw = q(err[:, None] * x).sum(axis=0, dtype=np.int64)
        gb = int(q(err).sum())
        pc = np.clip(p, 1e-15, 1 - 1e-15)
        loss = int(q(-(y * np.log(pc) + (1 - y) * np.log(1 - pc))).sum())
        n = len(y)
        hist.append(loss / _Q / n)
        w = w - lr * (gw / _Q / n + l2 * w)
        b = b - lr * (gb / _Q / n)
    return w, b, hist


def test_matches_reference_exactly(ray_session):
    docs, labels = POS + NEG, [1] * 4 + [0] * 4
    got_w, got_b, got_h = train_logreg(_ds(_tbl(docs, labels)), "label",
                                       dim=64, iters=8, lr=2.0)
    ref_w, ref_b, ref_h = _ref_train(docs, labels, 64, 8, 2.0, 1e-4)
    assert got_h == ref_h and got_b == ref_b
    assert (got_w == ref_w).all()


def test_partitioning_invariance(ray_session):
    docs, labels = POS * 3 + NEG * 3, [1] * 12 + [0] * 12
    tbl = _tbl(docs, labels)
    one = train_logreg(_ds(tbl, blocks=1), "label", dim=128, iters=6)
    many = train_logreg(_ds(tbl, blocks=6), "label", dim=128, iters=6)
    assert (one[0] == many[0]).all() and one[1] == many[1]
    assert one[2] == many[2]


def test_converges_and_separates(ray_session):
    docs, labels = POS * 4 + NEG * 4, [1] * 16 + [0] * 16
    w, b, hist = train_logreg(_ds(_tbl(docs, labels)), "label",
                              dim=256, iters=40, lr=4.0)
    assert hist[-1] < hist[0] / 2  # loss halves
    scores = score_logreg(_ds(_tbl(docs, labels)), w, b).to_pandas()
    scores = scores.sort_values("doc_id").reset_index(drop=True)
    p = scores["p_micro"].to_numpy() / 1e6
    assert (p[:16] > 0.5).all() and (p[16:] < 0.5).all()
    # held-out shuffled paraphrases classify correctly too
    unseen = ["neutral encyclopedic citations prose article",
              "cheap casino spam click pills"]
    up = score_logreg(_ds(_tbl(unseen, [1, 0])), w, b).to_pandas()
    up = up.sort_values("doc_id")["p_micro"].to_numpy() / 1e6
    assert up[0] > 0.5 > up[1]


def test_empty_doc_scores_bias(ray_session):
    w = np.zeros(32)
    out = score_logreg(_ds(_tbl(["", "something"], [0, 1])), w, 0.0,
                       ).to_pandas().sort_values("doc_id")
    assert int(out.iloc[0]["p_micro"]) == 500000  # sigmoid(0)


def test_validation(ray_session):
    with pytest.raises(ValueError, match="iters"):
        train_logreg(_ds(_tbl(POS, [1] * 4)), "label", iters=0)
    with pytest.raises(ValueError, match="no labeled rows"):
        train_logreg(_ds(_tbl(["", "  "], [0, 1])), "label", iters=1)


def test_momentum_matches_reference_and_accelerates(ray_session):
    docs, labels = POS * 2 + NEG * 2, [1] * 8 + [0] * 8
    tbl = _tbl(docs, labels)

    def ref_momentum(dim, iters, lr, l2, mu):
        x, has = _doc_features(tbl, "text", dim)
        x = x[np.asarray(has)]
        y = np.asarray(labels, dtype=np.float64)[np.asarray(has)]
        w, b, vw, vb = np.zeros(dim), 0.0, np.zeros(dim), 0.0
        hist = []
        q = lambda v: np.floor(v * _Q + 0.5).astype(np.int64)  # noqa: E731
        for _ in range(iters):
            p = 1.0 / (1.0 + np.exp(-(x @ w + b)))
            err = p - y
            gw = q(err[:, None] * x).sum(axis=0, dtype=np.int64)
            gb = int(q(err).sum())
            pc = np.clip(p, 1e-15, 1 - 1e-15)
            loss = int(q(-(y * np.log(pc)
                           + (1 - y) * np.log(1 - pc))).sum())
            n = len(y)
            hist.append(loss / _Q / n)
            vw = mu * vw + (gw / _Q / n + l2 * w)
            vb = mu * vb + gb / _Q / n
            w, b = w - lr * vw, b - lr * vb
        return w, b, hist

    got = train_logreg(_ds(tbl), "label", dim=64, iters=10, lr=1.0,
                       momentum=0.9)
    want = ref_momentum(64, 10, 1.0, 1e-4, 0.9)
    assert got[2] == want[2] and got[1] == want[1]
    assert (got[0] == want[0]).all()
    # momentum reaches a lower loss than plain GD in the same budget
    plain = train_logreg(_ds(tbl), "label", dim=64, iters=10, lr=1.0)
    assert got[2][-1] < plain[2][-1]


def test_with_length_feature(ray_session):
    # labels determined purely by length: bag features are identical
    # distributions, so only the dense length coordinate can separate
    short = ["alpha beta gamma delta"] * 6
    long_ = [" ".join(["alpha beta gamma delta"] * 12)] * 6
    docs, labels = short + long_, [0] * 6 + [1] * 6
    w, b, hist = train_logreg(_ds(_tbl(docs, labels)), "label", dim=32,
                              iters=60, lr=4.0, with_length=True,
                              momentum=0.9)
    assert len(w) == 33
    out = score_logreg(_ds(_tbl(docs, labels)), w, b,
                       with_length=True).to_pandas()
    p = out.sort_values("doc_id")["p_micro"].to_numpy() / 1e6
    assert (p[:6] < 0.5).all() and (p[6:] > 0.5).all()
