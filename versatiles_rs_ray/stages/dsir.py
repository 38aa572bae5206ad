"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023).

The published recipe for picking pretraining documents that *look
like* a target domain: fit two bag-of-hashed-n-gram models — one over
a (small) target corpus, one over the raw pool — and weight every raw
document by its log importance ratio

    log w(doc) = sum over gram occurrences of
                 [ ln p_target(bucket) - ln p_raw(bucket) ]

with unigram + bigram features hashed into ``dim`` buckets and
add-``smooth`` (Laplace) smoothing on both distributions, then select
top-``k`` under Gumbel perturbation (Gumbel-top-k IS sampling without
replacement proportional to w — the paper's "importance resampling").

Engine shape — ZERO shuffles (the tfidf two-pass contract):

- pass A streams each corpus once, reducing to per-block bucket-count
  partials (one ``dim``-length int64 row per block) that the driver
  sums into two ``dim``-length arrays — KBs of driver state, bounded
  by ``dim`` not rows;
- the per-bucket log-ratios quantize to INTEGER micro-nats on the
  driver, so every document's weight is an order-independent int64
  sum — bit-stable under any partitioning and exactly mirrorable in
  SQL (the lm/pmi/bm25 quantization contract);
- pass B re-streams the raw pool attaching ``w_micro`` per document
  (a pure map — resumable, no materialization);
- selection adds a deterministic Gumbel draw from the Knuth
  multiplicative hash of the id (seedable; the same hash family as
  ``systematic_sample``) and keeps top-k via per-block prune + a
  bounded driver merge (blocks x k rows, never the corpus).

The paper scores fixed-size chunks so document length does not
dominate the ratio; feed :func:`~.text.chunk_documents` output when
pool documents vary wildly in length. ``n_grams`` rides along so
consumers can length-normalize.

Reference parity: the reference engine has no data-selection surface
(graft-new; SURVEY.md §2 "beyond the reference" list).
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

from .curate import _fnv_vec
from .text import _per_doc_sum, _split_tokens

_KNUTH = np.uint64(2654435761)
_MOD32 = np.uint64(4294967296)


def _gram_occurrences(batch: pa.Table, column: str, dim: int):
    """(doc_row, bucket) for every unigram AND bigram occurrence.

    One Arrow whitespace split; bigrams materialize by one vectorized
    binary_join over shifted token views with a doc-boundary mask
    (the _ngram_partial construction) — no per-row Python. Returns
    (doc_rows, buckets, n_docs); hashing runs once per DISTINCT gram
    in the batch via dictionary_encode.
    """
    import pyarrow.compute as pc

    flat, tlen, offs = _split_tokens(batch[column])
    keep = tlen > 0
    n_words = _per_doc_sum(keep.astype(np.int64), offs)
    words = flat.filter(pa.array(keep)) if not keep.all() else flat
    n_docs = len(n_words)
    if len(words) == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64), n_docs)
    doc = np.repeat(np.arange(n_docs, dtype=np.int64), n_words)
    rows, buckets = [], []

    def emit(grams, docs_n):
        arr = grams.combine_chunks() if isinstance(
            grams, pa.ChunkedArray) else grams
        enc = arr.dictionary_encode()
        bucket_of = (_fnv_vec(enc.dictionary) % np.uint64(dim)).astype(np.int64)
        rows.append(docs_n)
        buckets.append(bucket_of[np.asarray(enc.indices, dtype=np.int64)])

    emit(words, doc)
    if len(words) >= 2:
        grams = pc.binary_join_element_wise(
            words.slice(0, len(words) - 1), words.slice(1, len(words) - 1),
            " ")
        same = doc[:-1] == doc[1:]
        if same.any():
            if not same.all():
                grams = grams.filter(pa.array(same))
            emit(grams, doc[:-1][same])
    return (np.concatenate(rows), np.concatenate(buckets), n_docs)


def _bucket_partial(batch: pa.Table, column: str, dim: int) -> pa.Table:
    """One row per block: the block's gram-occurrence counts over the
    ``dim`` hash buckets (exact — occurrences never straddle blocks)."""
    _, buckets, _ = _gram_occurrences(batch, column, dim)
    cnt = np.zeros(dim, dtype=np.int64)
    if len(buckets):
        np.add.at(cnt, buckets, 1)
    return pa.table({"cnt": pa.array([cnt.tolist()], type=pa.list_(pa.int64()))})


def bucket_counts(ds, dim: int, column: str = "text") -> np.ndarray:
    """Corpus gram-occurrence histogram over ``dim`` hash buckets,
    reduced to ONE driver array (dim int64s — KBs; the tfidf df-pass
    reduction, bounded by ``dim`` regardless of corpus size)."""
    parts = ds.map_batches(
        functools.partial(_bucket_partial, column=column, dim=dim),
        batch_format="pyarrow").to_pandas()
    cnt = np.zeros(dim, dtype=np.int64)
    for row in parts["cnt"]:
        cnt += np.asarray(row, dtype=np.int64)
    return cnt


def log_ratio_micro(target_cnt: np.ndarray, raw_cnt: np.ndarray,
                    smooth: float = 1.0) -> np.ndarray:
    """Per-bucket importance log-ratio, quantized to integer
    micro-nats BEFORE any per-document sum:

        r[b] = floor(1e6 * (ln((ct+s)/(Tt+s*dim))
                            - ln((cr+s)/(Tr+s*dim))) + 0.5)

    The float chain is written identically in the SQL oracle (same
    association, same libm ln), so doc weights — int64 sums of these —
    reproduce bit-for-bit at any partitioning.
    """
    if smooth <= 0:
        raise ValueError(f"dsir: smooth must be > 0, got {smooth}")
    dim = len(target_cnt)
    tt = float(target_cnt.sum())
    tr = float(raw_cnt.sum())
    lt = np.log((target_cnt + smooth) / (tt + smooth * dim))
    lr = np.log((raw_cnt + smooth) / (tr + smooth * dim))
    return np.floor(1e6 * (lt - lr) + 0.5).astype(np.int64)


def _weight_batch(batch: pa.Table, column: str, id_col: str, dim: int,
                  r_micro: np.ndarray) -> pa.Table:
    doc_rows, buckets, n_docs = _gram_occurrences(batch, column, dim)
    w = np.zeros(n_docs, dtype=np.int64)
    n_feat = np.zeros(n_docs, dtype=np.int64)
    if len(doc_rows):
        np.add.at(w, doc_rows, r_micro[buckets])
        np.add.at(n_feat, doc_rows, 1)
    return pa.table({
        id_col: batch[id_col],
        "n_grams": pa.array(n_feat, type=pa.int64()),
        "w_micro": pa.array(w, type=pa.int64()),
    })


def dsir_weights(raw_ds, target_ds, dim: int = 256, column: str = "text",
                 id_col: str = "doc_id", smooth: float = 1.0):
    """Per-document DSIR importance log-weights of the raw pool
    against the target corpus: (id_col, n_grams, w_micro) for EVERY
    raw document (featureless docs carry weight 0 — an empty product).
    Streaming: two bounded count passes + one pure scoring map."""
    if dim < 1:
        raise ValueError(f"dsir: dim must be >= 1, got {dim}")
    tc = bucket_counts(target_ds, dim, column=column)
    rc = bucket_counts(raw_ds, dim, column=column)
    r = log_ratio_micro(tc, rc, smooth=smooth)
    return raw_ds.map_batches(
        functools.partial(_weight_batch, column=column, id_col=id_col,
                          dim=dim, r_micro=r),
        batch_format="pyarrow")


def gumbel_micro(ids: np.ndarray, seed: int = 0) -> np.ndarray:
    """Deterministic standard-Gumbel draw per id, in integer
    micro-units: u = (knuth32(id + seed) + 0.5) / 2^32 in (0,1),
    g = floor(1e6 * -ln(-ln(u)) + 0.5). The Knuth multiplicative
    hash is the engine's sampling family (``systematic_sample``);
    the +0.5 centering keeps u strictly inside (0,1) so the double
    ln never hits an infinity."""
    h = ((ids.astype(np.uint64) + np.uint64(seed)) * _KNUTH) % _MOD32
    u = (h.astype(np.float64) + 0.5) / 4294967296.0
    return np.floor(1e6 * -np.log(-np.log(u)) + 0.5).astype(np.int64)


def _topk_block(batch: pa.Table, id_col: str, k: int,
                seed: int) -> pa.Table:
    ids = np.asarray(batch[id_col], dtype=np.int64)
    g = gumbel_micro(ids, seed=seed)
    w = np.asarray(batch["w_micro"], dtype=np.int64)
    score = w + g
    order = np.lexsort((ids, -score))[:k]
    return pa.table({
        id_col: pa.array(ids[order], type=pa.int64()),
        "n_grams": batch["n_grams"].take(pa.array(order)),
        "w_micro": pa.array(w[order], type=pa.int64()),
        "g_micro": pa.array(g[order], type=pa.int64()),
        "score_micro": pa.array(score[order], type=pa.int64()),
    })


def dsir_select(raw_ds, target_ds, k: int, dim: int = 256,
                column: str = "text", id_col: str = "doc_id",
                smooth: float = 1.0, seed: int = 0) -> pa.Table:
    """Gumbel-top-k DSIR selection: the ``k`` raw documents sampled
    (without replacement, proportional to their importance weight —
    the Gumbel-max trick) for target-domain continued pretraining.

    Ties break ascending on id (SQL ORDER BY score DESC, id). Returns
    a k-row Arrow table (bounded by construction): per-block top-k
    prune inside the scoring map, then one driver merge over
    blocks x k candidate rows — the corpus itself never leaves the
    stream. ``seed`` decorrelates the Gumbel hash from any sampling /
    split hash applied to the same ids upstream."""
    if k < 1:
        raise ValueError(f"dsir_select: k must be >= 1, got {k}")
    scored = dsir_weights(raw_ds, target_ds, dim=dim, column=column,
                          id_col=id_col, smooth=smooth)
    cand = scored.map_batches(
        functools.partial(_topk_block, id_col=id_col, k=k, seed=seed),
        batch_format="pyarrow")
    merged = pa.concat_tables(
        [pa.table(b) for b in cand.iter_batches(batch_format="pyarrow")])
    if merged.num_rows == 0:
        return merged
    ids = np.asarray(merged[id_col], dtype=np.int64)
    score = np.asarray(merged["score_micro"], dtype=np.int64)
    order = np.lexsort((ids, -score))[:k]
    return merged.take(pa.array(order, type=pa.int64()))
