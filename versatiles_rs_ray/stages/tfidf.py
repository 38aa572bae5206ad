"""Hashed tf-idf document vectors — the text -> embedding bridge.

Feature hashing (Weinberger et al. 2009): every token FNV-1a-hashes
into one of ``dim`` buckets; a document's vector is the bucket-wise
tf * idf with smooth idf = ln((N+1)/(df+1)) + 1 (the scikit-learn
formulation). The vectors feed the engine's embedding stack
(semantic_dedup / cosine_topk / IVF / PQ) — all of which normalize
internally for cosine, so the weights here stay UNNORMALIZED: every
emitted component is a product of two exactly-reproducible doubles
(no cross-term float sum), which is what lets the SQL oracle match
bit-for-bit after micro-quantization.

Scale shape — ZERO shuffles:

- pass A streams the corpus once emitting per-block (df partial, doc
  count) rows of ``dim`` integers; the driver reduces them to one
  idf array (dim doubles — KBs, closure-shipped);
- pass B streams again, computing per-doc bucket tf by one
  (doc, bucket) unique per batch and multiplying by idf.

The two passes are the classic count-then-weight trade: no corpus
materialization, no exchange, df exactness by construction (a doc
never straddles blocks). Reference has no text-vector surface
(graft-new, SURVEY.md §2 beyond-reference list).
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

from .curate import _fnv_vec
from .text import _per_doc_sum, _split_tokens


def _doc_buckets(batch: pa.Table, column: str, dim: int):
    """flat (doc_row, bucket) pairs for every token occurrence."""
    flat, tlen, offs = _split_tokens(batch[column])
    keep = tlen > 0
    n_words = _per_doc_sum(keep.astype(np.int64), offs)
    words = flat.filter(pa.array(keep)) if not keep.all() else flat
    if len(words) == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.zeros(len(n_words), np.int64))
    arr = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
    enc = arr.dictionary_encode()
    bucket_of = (_fnv_vec(enc.dictionary) % np.uint64(dim)).astype(np.int64)
    bucket = bucket_of[np.asarray(enc.indices, dtype=np.int64)]
    doc = np.repeat(np.arange(len(n_words), dtype=np.int64), n_words)
    return doc, bucket, n_words


def _df_partial(batch: pa.Table, column: str, dim: int) -> pa.Table:
    """One row per block: (df partial over dim buckets, #docs with
    tokens) — exact because documents never straddle blocks."""
    doc, bucket, n_words = _doc_buckets(batch, column, dim)
    df = np.zeros(dim, dtype=np.int64)
    if len(doc):
        key = np.unique(doc * dim + bucket)
        np.add.at(df, (key % dim).astype(np.int64), 1)
    return pa.table({
        "df": pa.array([df.tolist()], type=pa.list_(pa.int64())),
        "n_docs": pa.array([int((n_words > 0).sum())], type=pa.int64()),
    })


def _weight_batch(batch: pa.Table, column: str, id_col: str, dim: int,
                  idf: np.ndarray) -> pa.Table:
    empty = pa.table({id_col: pa.array([], type=pa.int64()),
                      "bucket": pa.array([], type=pa.int64()),
                      "tf": pa.array([], type=pa.int64()),
                      "w_micro": pa.array([], type=pa.int64())})
    doc, bucket, _ = _doc_buckets(batch, column, dim)
    if len(doc) == 0:
        return empty
    key, tf = np.unique(doc * dim + bucket, return_counts=True)
    d, b = key // dim, key % dim
    w = tf.astype(np.float64) * idf[b]
    ids = np.asarray(batch[id_col], dtype=np.int64)[d]
    return pa.table({
        id_col: pa.array(ids, type=pa.int64()),
        "bucket": pa.array(b, type=pa.int64()),
        "tf": pa.array(tf.astype(np.int64), type=pa.int64()),
        "w_micro": pa.array(np.floor(w * 1e6 + 0.5).astype(np.int64),
                            type=pa.int64()),
    })


def _idf(ds, column: str, dim: int) -> np.ndarray:
    """Smooth idf array (dim doubles of driver state): one streaming
    df pass reduced to per-block dim-length partials, then
    ln((N+1)/(df+1)) + 1 — the single formula both the exploded and
    dense variants (and the SQL oracle) must agree on."""
    parts = ds.map_batches(
        functools.partial(_df_partial, column=column, dim=dim),
        batch_format="pyarrow").to_pandas()
    df = np.zeros(dim, dtype=np.int64)
    n_docs = 0
    for row_df, nd in zip(parts["df"], parts["n_docs"]):
        df += np.asarray(row_df, dtype=np.int64)
        n_docs += int(nd)
    return np.log((n_docs + 1.0) / (df + 1.0)) + 1.0


def hashed_tfidf(ds, dim: int = 256, column: str = "text",
                 id_col: str = "doc_id"):
    """Exploded hashed tf-idf: one row per (doc, nonzero bucket) with
    the exact token count ``tf`` and ``w_micro`` = floor(1e6 * tf *
    idf + 0.5). Docs with no tokens emit nothing."""
    if dim < 1:
        raise ValueError(f"hashed_tfidf: dim must be >= 1, got {dim}")
    idf = _idf(ds, column, dim)
    return ds.map_batches(
        functools.partial(_weight_batch, column=column, id_col=id_col,
                          dim=dim, idf=idf),
        batch_format="pyarrow")


def tfidf_vectors(ds, dim: int = 256, column: str = "text",
                  id_col: str = "doc_id"):
    """Dense list<float> variant shaped for the embedding stack:
    (id_col -> vec_id, embedding). Components are the same w_micro
    weights scaled back to floats (so cosine over these vectors is
    cosine over the exact exploded weights); consumers normalize."""
    # weight inside the SAME batch as the explode (a doc's rows would
    # otherwise straddle map_batches re-batching boundaries)
    if dim < 1:
        raise ValueError(f"tfidf_vectors: dim must be >= 1, got {dim}")
    idf = _idf(ds, column, dim)

    def densify(batch: pa.Table, _dim=dim, _idf=idf) -> pa.Table:
        t = _weight_batch(batch, column=column, id_col=id_col,
                          dim=_dim, idf=_idf)
        if t.num_rows == 0:
            return pa.table({
                "vec_id": pa.array([], type=pa.int64()),
                "embedding": pa.array([], type=pa.list_(pa.float64())),
            })
        ids = np.asarray(t[id_col], dtype=np.int64)
        uniq, inv = np.unique(ids, return_inverse=True)
        m = np.zeros((len(uniq), _dim), dtype=np.float64)
        m[inv, np.asarray(t["bucket"], dtype=np.int64)] = (
            np.asarray(t["w_micro"], dtype=np.int64) / 1e6)
        return pa.table({
            "vec_id": pa.array(uniq, type=pa.int64()),
            "embedding": pa.array(list(m), type=pa.list_(pa.float64())),
        })

    return ds.map_batches(densify, batch_format="pyarrow")
