"""Model-based document classification — the fastText-style quality /
domain filter of modern pretraining pipelines (CCNet's LM is one
quality signal; a trained linear classifier over hashed bag-of-words
features is the other — "wiki-like" filtering a la GPT-3/LLaMA data
recipes).

Logistic regression over FNV-hashed, L2-normalized log(1+tf) features,
trained by full-batch gradient descent where each iteration is ONE
map_batches pass emitting a per-block gradient partial of ``dim``
int64s. Each DOCUMENT's gradient contribution is quantized to integer
units before summing, so every aggregate crossing a block boundary is
an int64 sum of per-doc integers: bit-identical no matter how many
blocks, what order they arrive in, or what cluster size ran the job
(the engine-wide summation-determinism contract; per-BLOCK rounding
would tie the result to the partitioning — tests pin the invariance).
The quantization is part of the optimizer's definition, not an
approximation to hide: the reference implementation in tests applies
the identical rounding and matches exactly.

Scale shape: training is iters × one streaming corpus pass (no
materialization, no shuffle — the model, dim doubles, ships in the
task closure); scoring is one pass. For corpus-scale training where
iters × passes is too dear, train on a sampled split (docs_sample /
dataset_split are the companions) and score the full corpus — the
standard recipe.

Reference has no classifier surface (graft-new, SURVEY.md §2
beyond-reference list).
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

from .curate import _fnv_vec
from .text import _per_doc_sum, _split_tokens

_Q = 1e8  # gradient quantization (micro would lose small-corpus grads)


def _doc_features(batch: pa.Table, column: str, dim: int,
                  with_length: bool = False):
    """Per-doc hashed log(1+tf), L2-normalized: (n_docs, D) float64
    + a mask of docs that had tokens; D = dim, or dim+1 when
    ``with_length`` appends log1p(n_tokens)/10 as a dense feature
    (L2 normalization of the bag erases document length — the signal
    heuristic quality rules lean on — so distillation targets need it
    back as its own coordinate; appended AFTER normalization).
    Per-doc math only — identical under any batching."""
    flat, tlen, offs = _split_tokens(batch[column])
    keep = tlen > 0
    n_words = _per_doc_sum(keep.astype(np.int64), offs)
    words = flat.filter(pa.array(keep)) if not keep.all() else flat
    n = batch.num_rows
    x = np.zeros((n, dim), dtype=np.float64)
    has = n_words > 0
    if len(words):
        arr = (words.combine_chunks()
               if isinstance(words, pa.ChunkedArray) else words)
        enc = arr.dictionary_encode()
        bucket_of = (_fnv_vec(enc.dictionary) % np.uint64(dim)).astype(np.int64)
        bucket = bucket_of[np.asarray(enc.indices, dtype=np.int64)]
        doc = np.repeat(np.arange(n, dtype=np.int64), n_words)
        np.add.at(x, (doc, bucket), 1.0)
        x = np.log1p(x)
        norm = np.linalg.norm(x, axis=1, keepdims=True)
        norm[norm == 0] = 1.0
        x /= norm
    if with_length:
        x = np.concatenate(
            [x, (np.log1p(n_words.astype(np.float64)) / 10.0)[:, None]],
            axis=1)
    return x, has


def _grad_partial(batch: pa.Table, column: str, label_col: str,
                  dim: int, w: np.ndarray, b: float,
                  with_length: bool = False) -> pa.Table:
    """One row per block: quantized gradient partial (dim+1 int64 for
    w and bias) + n and quantized loss. sigma computed in float64;
    everything crossing block boundaries is integer."""
    x, has = _doc_features(batch, column, dim, with_length=with_length)
    y = np.asarray(batch[label_col], dtype=np.float64)
    x, y = x[has], y[has]
    z = x @ w + b
    p = 1.0 / (1.0 + np.exp(-z))
    err = p - y
    # quantize PER DOCUMENT, then integer-sum: any regrouping of docs
    # into blocks yields the same totals (per-BLOCK rounding would tie
    # the result to the partitioning)
    q = lambda v: np.floor(v * _Q + 0.5).astype(np.int64)  # noqa: E731
    gw = q(err[:, None] * x).sum(axis=0, dtype=np.int64)
    gb = int(q(err).sum())
    pc = np.clip(p, 1e-15, 1 - 1e-15)
    loss = int(q(-(y * np.log(pc) + (1 - y) * np.log(1 - pc))).sum())
    return pa.table({
        "gw": pa.array([gw.tolist()], type=pa.list_(pa.int64())),
        "gb": pa.array([gb], type=pa.int64()),
        "n": pa.array([int(len(y))], type=pa.int64()),
        "loss": pa.array([loss], type=pa.int64()),
    })


def train_logreg(ds, label_col: str, dim: int = 1024, iters: int = 20,
                 lr: float = 1.0, l2: float = 1e-4,
                 column: str = "text", with_length: bool = False,
                 momentum: float = 0.0):
    """Train the classifier: returns (w, b, history) where history is
    the per-iteration mean log-loss. ``label_col`` must hold 0/1.
    Deterministic under any partitioning (integer-summed quantized
    gradients; fixed zero init). ``momentum`` enables heavy-ball
    acceleration (v = mu*v + g; the driver-side update is pure float64
    on already-deterministic integer gradient sums, so determinism is
    unaffected)."""
    if iters < 1:
        raise ValueError(f"train_logreg: iters must be >= 1, got {iters}")
    D = dim + (1 if with_length else 0)
    w = np.zeros(D, dtype=np.float64)
    b = 0.0
    vw = np.zeros(D, dtype=np.float64)
    vb = 0.0
    history = []
    for _ in range(iters):
        parts = ds.map_batches(
            functools.partial(_grad_partial, column=column,
                              label_col=label_col, dim=dim, w=w, b=b,
                              with_length=with_length),
            batch_format="pyarrow").to_pandas()
        if not len(parts) or parts["n"].sum() == 0:
            raise ValueError("train_logreg: no labeled rows with tokens")
        gw = np.zeros(D, dtype=np.int64)
        for row in parts["gw"]:
            gw += np.asarray(row, dtype=np.int64)
        gb = int(parts["gb"].sum())
        n = int(parts["n"].sum())
        loss = int(parts["loss"].sum()) / _Q / n
        history.append(loss)
        vw = momentum * vw + (gw / _Q / n + l2 * w)
        vb = momentum * vb + (gb / _Q / n)
        w = w - lr * vw
        b = b - lr * vb
    return w, b, history


def score_logreg(ds, w: np.ndarray, b: float, column: str = "text",
                 id_col: str = "doc_id", with_length: bool = False):
    """Score every document: (id_col, p_micro) with p = sigmoid(x.w+b)
    quantized to micro-units (docs without tokens score the bias;
    ``with_length`` must match training)."""
    dim = len(w) - (1 if with_length else 0)

    def score(batch: pa.Table, _w=np.asarray(w, dtype=np.float64),
              _b=float(b)) -> pa.Table:
        x, _ = _doc_features(batch, column, dim, with_length=with_length)
        p = 1.0 / (1.0 + np.exp(-(x @ _w + _b)))
        return pa.table({
            id_col: batch[id_col],
            "p_micro": pa.array(np.floor(p * 1e6 + 0.5).astype(np.int64),
                                type=pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")
