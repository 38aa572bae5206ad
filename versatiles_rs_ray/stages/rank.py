"""Distributed BM25 ranking over the documents corpus — the relevance
-scoring leg of the text-curation toolbox (SURVEY.md §2.7-adjacent;
the reference has no ranking op, this is engine-side breadth like the
dedup/ANN family).

Okapi BM25 with the Lucene idf variant (always positive):

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    s(d, q) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

Scale shape — TWO streaming passes, no corpus materialization:

1. ``QueryTermCounter`` (task map_batches): Arrow-vectorized tokenize
   (utf8_lower + split_pattern_regex + bincount over list-parent
   indices) -> narrow (doc_num, dl, tf_i...) rows for every doc.
   Corpus statistics (N, sum_dl, df per term) reduce from one
   per-block partial row each — the driver only ever sees
   O(blocks x terms) numbers.
2. The same counter feeds ``Bm25Scorer`` with the pass-1 stats as
   plain broadcast floats: hit rows score in one numpy expression,
   every block keeps its local top-k, and the driver reduces
   blocks x k rows to the global top-k (bounded by construction).

Recomputing the tokenize in pass 2 is deliberate: the alternative —
materializing per-doc counts — is O(corpus) object-store pressure at
10^12 docs, while the extra pass is pure compute that pipelines.

Determinism contract (oracle parity): the final score is quantized to
integer micro-units (floor(score * 1e6 + 0.5)) and ranked by
(score_micro DESC, doc_num) so ordering never compares raw floats.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

BM25_K1 = 1.2
BM25_B = 0.75
TOKEN_PATTERN = "[^a-z0-9]+"  # must match the oracle's split regex


def _tokenize_counts(text_col, terms):
    """text column -> (dl, tf[n_terms x rows]) via Arrow kernels +
    bincount; no per-row Python."""
    import pyarrow.compute as pc

    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    n = len(text_col)
    toks = pc.split_pattern_regex(pc.utf8_lower(text_col), TOKEN_PATTERN)
    flat = toks.flatten()
    parents = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
    nonempty = np.asarray(
        pc.fill_null(pc.not_equal(flat, pa.scalar("")), False))
    # null texts produce no tokens (flatten skips them): dl = 0
    dl = np.bincount(parents[nonempty], minlength=n).astype(np.int64)
    tf = np.zeros((len(terms), n), dtype=np.int64)
    for k, t in enumerate(terms):
        hit = np.asarray(
            pc.fill_null(pc.equal(flat, pa.scalar(t)), False))
        idx = parents[hit & nonempty]
        if len(idx):
            tf[k] = np.bincount(idx, minlength=n)
    return dl, tf


class QueryTermCounter:
    """map_batches fn: docs -> (doc_num, dl, tf_0..tf_{k-1}) for every
    document (narrow int64 rows)."""

    def __init__(self, terms):
        self.terms = tuple(terms)

    def __call__(self, batch: pa.Table) -> pa.Table:
        dl, tf = _tokenize_counts(batch["text"], self.terms)
        cols = {"doc_num": batch["doc_num"],
                "dl": pa.array(dl, type=pa.int64())}
        for k in range(len(self.terms)):
            cols[f"tf_{k}"] = pa.array(tf[k], type=pa.int64())
        return pa.table(cols)


def _stats_partial(batch: pa.Table) -> pa.Table:
    """counts block -> ONE partial row (n, sum_dl, df_0..)."""
    n_terms = len(batch.column_names) - 2
    cols = {"n": pa.array([len(batch)], type=pa.int64()),
            "sum_dl": pa.array([int(np.asarray(batch["dl"]).sum())],
                               type=pa.int64())}
    for k in range(n_terms):
        tf = np.asarray(batch[f"tf_{k}"])
        cols[f"df_{k}"] = pa.array([int((tf > 0).sum())], type=pa.int64())
    return pa.table(cols)


def corpus_stats(counts_ds, n_terms: int):
    """(N, sum_dl, df[terms]) from per-block partials; the driver
    reduces O(blocks) rows."""
    parts = counts_ds.map_batches(
        _stats_partial, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    sum_dl = int(parts["sum_dl"].sum())
    df = np.array([int(parts[f"df_{k}"].sum()) for k in range(n_terms)],
                  dtype=np.int64)
    return n, sum_dl, df


class Bm25Scorer:
    """map_batches fn over counts rows: score hit rows, keep the
    block-local top-k by (score_micro DESC, doc_num)."""

    def __init__(self, n: int, sum_dl: int, df: np.ndarray, k: int,
                 k1: float = BM25_K1, b: float = BM25_B):
        self.idf = np.log1p((n - df + 0.5) / (df + 0.5))
        self.avgdl = sum_dl / n if n else 1.0
        self.k = k
        self.k1 = k1
        self.b = b

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_terms = len(self.idf)
        tf = np.stack([np.asarray(batch[f"tf_{k}"], dtype=np.float64)
                       for k in range(n_terms)])
        dl = np.asarray(batch["dl"], dtype=np.float64)
        norm = self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)
        # sum in term-index order (matches the oracle's per-term rows;
        # the micro quantization absorbs association-order ulps)
        score = np.zeros(len(batch), dtype=np.float64)
        for k in range(n_terms):
            score += self.idf[k] * tf[k] * (self.k1 + 1.0) / (tf[k] + norm)
        micro = np.floor(score * 1e6 + 0.5).astype(np.int64)
        doc = np.asarray(batch["doc_num"], dtype=np.int64)
        hits = np.flatnonzero(tf.sum(axis=0) > 0)
        # block-local top-k: ascending (-score, doc) lexsort
        order = hits[np.lexsort((doc[hits], -micro[hits]))][: self.k]
        return pa.table({
            "doc_num": pa.array(doc[order], type=pa.int64()),
            "score_micro": pa.array(micro[order], type=pa.int64()),
        })


def bm25_topk(docs_ds, terms, k: int = 50):
    """Global BM25 top-k as a pandas frame (doc_num, score_micro,
    rank). Driver gather is blocks x k rows — bounded."""
    terms = tuple(terms)

    def _count(batch: pa.Table) -> pa.Table:
        return QueryTermCounter(terms)(batch)

    counts = docs_ds.map_batches(_count, batch_format="pyarrow")
    n, sum_dl, df = corpus_stats(counts, len(terms))
    scorer = Bm25Scorer(n, sum_dl, df, k)
    partials = counts.map_batches(
        scorer, batch_format="pyarrow").to_pandas()
    if partials.empty:  # no hits anywhere: stable empty schema
        import pandas as pd

        partials = pd.DataFrame({
            "doc_num": pd.Series([], dtype="int64"),
            "score_micro": pd.Series([], dtype="int64")})
    partials = partials.sort_values(
        ["score_micro", "doc_num"], ascending=[False, True],
        kind="mergesort").head(k).reset_index(drop=True)
    partials["rank"] = np.arange(1, len(partials) + 1, dtype=np.int64)
    return partials
