"""Embedding similarity search: brute-force cosine top-k + LSH buckets.

Baseline: broadcast query matrix, per-batch numpy matmul partial top-k,
tiny final merge — no shuffle, scales linearly in candidates. Scale
path: signed-random-projection LSH buckets for near-dup and candidate
pruning (recall measured against the brute-force baseline in tests).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from . import topk as topk_kernel


def _to_matrix(col, dim: int = 0) -> np.ndarray:
    """List column -> (n, d) float32. Ray Data emits EMPTY blocks for
    empty inputs; reshape(-1) can't infer d from 0 rows, so empty
    batches return (0, ``dim``) — callers that do dimension-sensitive
    math (GEMMs, per-cell sums) pass their known dim."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.zeros((0, dim), dtype=np.float32)
    lengths = np.asarray(col.value_lengths())
    assert len(np.unique(lengths)) <= 1, "ragged embedding column"
    flat = np.asarray(col.values, dtype=np.float32)
    return flat.reshape(len(col), -1)


class CosineTopKPartial:
    """Per-batch partial top-k cosine scores against broadcast queries."""

    def __init__(self, q_ids, q_matrix, k, exclude_self=True):
        self.q_ids = np.asarray(q_ids, dtype=np.int64)
        topk_kernel.check_unique_qids(self.q_ids, "CosineTopKPartial")
        q = np.asarray(q_matrix, dtype=np.float32)
        qnorm = np.linalg.norm(q, axis=1, keepdims=True)
        qnorm[qnorm == 0] = 1.0  # zero-norm query: sims 0, not NaN
        self.qn = q / qnorm
        self.k = k
        self.exclude_self = exclude_self

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Streaming top-k over NEGATED similarities via the shared
        threshold-mask kernel (stages/topk.streaming_topk); this class
        only supplies the GEMM chunk scorer and maps the kernel output
        to (q_id, vec_id, sim). Minimizing -sim with (score, id)
        tie-breaking keeps the (sim desc, id asc) contract exact."""
        ids = np.asarray(batch["vec_id"], dtype=np.int64)
        m = _to_matrix(batch["embedding"])
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mn = m / norms

        def score(sl):
            sims = (self.qn @ mn[sl].T).astype(np.float64)  # (Q, W)
            return np.negative(sims, out=sims)

        res = topk_kernel.streaming_topk(
            ids, self.q_ids, self.k, score, exclude_self=self.exclude_self)
        if res is None:
            empty64 = pa.array([], type=pa.int64())
            return pa.table({"q_id": empty64, "vec_id": empty64,
                             "sim": pa.array([], type=pa.float64())})
        qs, cs, vs = res
        return pa.table(
            {
                "q_id": pa.array(self.q_ids[qs], type=pa.int64()),
                "vec_id": pa.array(cs, type=pa.int64()),
                "sim": pa.array(-vs, type=pa.float64()),
            }
        )


def _batch_topk(df: pd.DataFrame, k: int) -> pd.DataFrame:
    df = df.sort_values(["q_id", "sim", "vec_id"], ascending=[True, False, True], kind="mergesort")
    return df.groupby("q_id", sort=False).head(k)


def cosine_topk(embeddings_ds, q_ids, q_matrix, k, exclude_self=True):
    """Exact brute-force cosine top-k: (q_id, vec_id, rank).

    Tree-reduce: per-batch partial top-k -> combiner pass -> tiny
    driver finish (same shape as stages/join.knn_join; no shuffle).
    """
    partials = embeddings_ds.map_batches(
        CosineTopKPartial(q_ids, q_matrix, k, exclude_self), batch_format="pyarrow"
    )
    # driver gather is blocks x Q x k rows (tiny); see stages/join.py on
    # why there is deliberately no coalescing combiner stage here.
    df = partials.to_pandas()
    if df.empty:  # empty input: Ray yields a column-less frame
        return pd.DataFrame({"q_id": pd.Series([], dtype="int64"),
                             "vec_id": pd.Series([], dtype="int64"),
                             "rank": pd.Series([], dtype="int64")})
    final = _batch_topk(df, k).reset_index(drop=True)
    final["rank"] = final.groupby("q_id", sort=False).cumcount() + 1
    return final[["q_id", "vec_id", "rank"]]


def _near_dup_block(table: pa.Table, threshold: float) -> pa.Table:
    """One exchange partition (whole buckets, co-located by the hash
    route) -> near-dup pairs. Buckets resolve as runs of one argsort;
    the only loop is over bucket RUNS (dozens per partition), each a
    single dense matmul — no per-row Python."""
    empty = pa.table(
        {
            "vec_a": pa.array([], type=pa.int64()),
            "vec_b": pa.array([], type=pa.int64()),
            "cosine": pa.array([], type=pa.float64()),
        }
    )
    if table.num_rows < 2:
        return empty
    bucket = np.asarray(table["bucket"], dtype=np.int64)
    ids = np.asarray(table["vec_id"], dtype=np.int64)
    m = _to_matrix(table["embedding"]).astype(np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mn = m / norms
    order = np.argsort(bucket, kind="stable")
    b_s, ids_s, mn_s = bucket[order], ids[order], mn[order]
    starts = np.flatnonzero(np.r_[True, b_s[1:] != b_s[:-1]])
    bounds = np.append(starts, len(b_s))
    la, lb, lc = [], [], []
    for i in range(len(starts)):
        s, e = bounds[i], bounds[i + 1]
        if e - s < 2:
            continue
        sub_ids, sub = ids_s[s:e], mn_s[s:e]
        sims = sub @ sub.T
        ia, ib = np.triu_indices(e - s, k=1)
        keep = sims[ia, ib] >= threshold
        a, b = sub_ids[ia[keep]], sub_ids[ib[keep]]
        la.append(np.minimum(a, b))
        lb.append(np.maximum(a, b))
        lc.append(sims[ia[keep], ib[keep]])
    if not la:
        return empty
    return pa.table(
        {
            "vec_a": pa.array(np.concatenate(la), type=pa.int64()),
            "vec_b": pa.array(np.concatenate(lb), type=pa.int64()),
            "cosine": pa.array(np.concatenate(lc), type=pa.float64()),
        }
    )


def cosine_near_dup_pairs(embeddings_ds, threshold: float, nbits=10, seed=42,
                          dim=None, num_partitions: int = 16):
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b, cosine >= t).

    LSH-bucketed: SRP bucket per vector -> hash exchange on bucket ->
    exact cosine within buckets, one vectorized kernel per partition
    (replacing the earlier groupby(bucket).map_groups pandas path).
    A vector lives in exactly one bucket, so each unordered pair
    appears once. At scale the bucket count (nbits) is the recall/cost
    knob; recall vs brute force is tested.
    """
    import functools

    from .exchange import hash_exchange

    if dim is None:
        first = embeddings_ds.take(1)
        if not first:
            raise ValueError("cosine_near_dup_pairs: cannot infer dim from "
                             "an empty dataset; pass dim=")
        dim = len(first[0]["embedding"])
    srp = SrpBuckets(dim, nbits=nbits, seed=seed)

    def bucketize(batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch["embedding"])
        return batch.append_column("bucket", pa.array(srp.bucket_of(m), type=pa.int64()))

    bucketed = embeddings_ds.map_batches(bucketize, batch_format="pyarrow")
    return hash_exchange(
        bucketed,
        "bucket",
        functools.partial(_near_dup_block, threshold=threshold),
        num_partitions=num_partitions,
    )


class SrpBuckets:
    """Signed-random-projection LSH: nbits hyperplanes -> bucket id.

    Deterministic (seeded); the IVF/LSH scale path for ANN: bucket the
    corpus once, probe only matching (or neighboring) buckets.
    """

    def __init__(self, dim, nbits=16, seed=42):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, nbits)).astype(np.float32)

    def bucket_of(self, m: np.ndarray) -> np.ndarray:
        m = np.asarray(m, dtype=np.float32)
        if m.shape[0] == 0:  # empty block: no GEMM
            return np.zeros(0, dtype=np.int64)
        signs = (m @ self.planes) > 0
        weights = (1 << np.arange(signs.shape[1], dtype=np.int64))
        return (signs.astype(np.int64) * weights).sum(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch["embedding"])
        return batch.append_column("bucket", pa.array(self.bucket_of(m), type=pa.int64()))


def lsh_topk(embeddings_ds, q_ids, q_matrix, k, dim, nbits=12, seed=42):
    """Approximate top-k: probe only candidates in each query's bucket.

    Returns the same (q_id, vec_id, rank) contract as cosine_topk; the
    recall/speed trade-off is controlled by nbits. Implemented as a
    bucket filter before the same partial-topk kernel (so candidates
    shrink ~2^nbits-fold while the merge stays identical).
    """
    srp = SrpBuckets(dim, nbits=nbits, seed=seed)
    q_buckets = srp.bucket_of(np.asarray(q_matrix, dtype=np.float32))
    wanted = np.unique(q_buckets)

    def keep_buckets(batch: pa.Table) -> pa.Table:
        b = srp.bucket_of(_to_matrix(batch["embedding"]))
        return batch.filter(pa.array(np.isin(b, wanted)))

    # candidates shrink to the UNION of all query buckets (not per-bucket
    # matching): with few queries that is a ~2^nbits-fold cut; with many
    # queries the union widens and this degrades gracefully toward the
    # brute-force scan. The oracle encodes the same union semantics.
    filtered = embeddings_ds.map_batches(keep_buckets, batch_format="pyarrow")
    return cosine_topk(filtered, q_ids, q_matrix, k)


# ---- IVF (inverted-file) ANN — the coarse-quantizer scale path ---------


def _nearest_cell(m: np.ndarray, cn: np.ndarray) -> np.ndarray:
    """Nearest centroid by cosine (the ONE cell-assignment rule —
    train, assign and probe all route through it). When the centroids
    are float64 (fixed_centroids path) the whole computation runs in
    double, matching the SQL oracle's arithmetic."""
    if m.shape[0] == 0:  # empty block: no GEMM
        return np.zeros(0, dtype=np.int64)
    if cn.dtype == np.float64:
        m = m.astype(np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return np.argmax((m / norms) @ cn.T, axis=1).astype(np.int64)


def ivf_train(embeddings_ds, n_centroids, dim, iters=2, seed=42):
    """Deterministic distributed k-means coarse quantizer.

    Init = seeded gaussian directions (data-independent, so identical
    on every node with no sampling round); each Lloyd iteration is one
    map_batches pass emitting per-centroid partial sums (n_centroids x
    (dim+1) floats per block — tiny) combined on the driver. Empty
    cells keep their previous centroid. Returns (n_centroids, dim)
    L2-normalized centroids.
    """
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((n_centroids, dim)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)

    for _ in range(iters):
        cn = c  # capture current centroids (broadcast in the closure)

        def partial_sums(batch: pa.Table, cn=cn) -> pa.Table:
            m = _to_matrix(batch["embedding"], dim=cn.shape[1])
            cell = _nearest_cell(m, cn)
            sums = np.zeros((len(cn), m.shape[1]), dtype=np.float64)
            np.add.at(sums, cell, m.astype(np.float64))
            cnt = np.bincount(cell, minlength=len(cn)).astype(np.float64)
            return pa.table(
                {
                    "cid": pa.array(np.arange(len(cn)), type=pa.int64()),
                    "sum": pa.array(list(sums), type=pa.list_(pa.float64())),
                    "cnt": pa.array(cnt, type=pa.float64()),
                }
            )

        parts = embeddings_ds.map_batches(partial_sums, batch_format="pyarrow").to_pandas()
        sums = np.zeros((n_centroids, dim), dtype=np.float64)
        cnts = np.zeros(n_centroids, dtype=np.float64)
        for cid, s, k in zip(parts["cid"], parts["sum"], parts["cnt"]):
            sums[cid] += np.asarray(s)
            cnts[cid] += k
        nz = cnts > 0
        newc = c.astype(np.float64).copy()
        newc[nz] = sums[nz] / cnts[nz, None]
        n = np.linalg.norm(newc, axis=1, keepdims=True)
        n[n == 0] = 1.0
        c = (newc / n).astype(np.float32)
    return c


def fixed_centroids(embeddings_ds, n_cells, dim):
    """Closed-form coarse quantizer: centroid c = L2-normalized mean of
    the embeddings with ``vec_id % n_cells == c``.

    Non-iterative, hence SQL-expressible — the `embedding_ivf_fixed`
    oracle reproduces it exactly, putting the whole IVF probe path
    (assign -> nprobe prune -> exact refine) under the DuckDB gate that
    the k-means-trained variant can't have. One map_batches pass of
    per-cell partial sums (n_cells x (dim+1) floats per block — tiny),
    combined on the driver; float64 throughout so the oracle's
    double-precision arithmetic sees the same centroid values.
    """
    def partial_sums(batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch["embedding"], dim=dim).astype(np.float64)
        cell = np.asarray(batch["vec_id"], dtype=np.int64) % n_cells
        sums = np.zeros((n_cells, dim), dtype=np.float64)
        np.add.at(sums, cell, m)
        cnt = np.bincount(cell, minlength=n_cells).astype(np.float64)
        return pa.table(
            {
                "cid": pa.array(np.arange(n_cells), type=pa.int64()),
                "sum": pa.array(list(sums), type=pa.list_(pa.float64())),
                "cnt": pa.array(cnt, type=pa.float64()),
            }
        )

    parts = embeddings_ds.map_batches(partial_sums, batch_format="pyarrow").to_pandas()
    sums = np.zeros((n_cells, dim), dtype=np.float64)
    cnts = np.zeros(n_cells, dtype=np.float64)
    for cid, s, c in zip(parts["cid"], parts["sum"], parts["cnt"]):
        sums[cid] += np.asarray(s)
        cnts[cid] += c
    cent = sums / np.maximum(cnts, 1.0)[:, None]
    n = np.linalg.norm(cent, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return cent / n  # float64 (callers decide the kernel dtype)


def ivf_assign(embeddings_ds, centroids):
    """Add the IVF cell id column (nearest centroid by cosine).

    Preserves a float64 centroid dtype (fixed_centroids path: the
    assignment then runs in double, matching the SQL oracle's
    arithmetic); float32 k-means centroids stay float32."""
    cn = np.asarray(centroids)
    if cn.dtype != np.float64:
        cn = cn.astype(np.float32)

    def add_cell(batch: pa.Table) -> pa.Table:
        cell = _nearest_cell(_to_matrix(batch["embedding"]), cn)
        return batch.append_column("ivf_cell", pa.array(cell, type=pa.int64()))

    return embeddings_ds.map_batches(add_cell, batch_format="pyarrow")


def ivf_topk(embeddings_ds, q_ids, q_matrix, k, dim, n_centroids=16, nprobe=4,
             iters=2, seed=42, centroids=None):
    """Approximate top-k through an IVF coarse quantizer.

    Candidates are pruned to the union of every query's ``nprobe``
    nearest cells, then refined by the exact partial-top-k kernel —
    candidate volume shrinks ~n_centroids/nprobe-fold while the merge
    stays identical to cosine_topk. Same (q_id, vec_id, rank)
    contract; recall vs the brute-force baseline is tested
    (tests/test_embed.py). At scale: train once, persist centroids,
    partition the corpus by ivf_cell so probes read only matching
    partitions (prune at the read).
    """
    if centroids is None:
        centroids = ivf_train(embeddings_ds, n_centroids, dim, iters=iters, seed=seed)
    cn = np.asarray(centroids)
    if cn.dtype != np.float64:
        cn = cn.astype(np.float32)
    q = np.asarray(q_matrix, dtype=cn.dtype)
    qnorm = np.linalg.norm(q, axis=1, keepdims=True)
    qnorm[qnorm == 0] = 1.0  # zero-norm query: sims 0, not NaN
    qn = q / qnorm
    sims = qn @ cn.T
    nprobe = min(nprobe, cn.shape[0])
    probe = np.argpartition(-sims, nprobe - 1, axis=1)[:, :nprobe]
    wanted = np.unique(probe)

    def keep_cells(batch: pa.Table) -> pa.Table:
        cell = np.asarray(batch["ivf_cell"], dtype=np.int64)
        keep = batch.filter(pa.array(np.isin(cell, wanted)))
        return keep.drop_columns(["ivf_cell"])

    filtered = ivf_assign(embeddings_ds, cn).map_batches(keep_cells, batch_format="pyarrow")
    return cosine_topk(filtered, q_ids, q_matrix, k)


# ---- per-label centroids (classifier prototypes) ------------------------

# Quantization scale for ORDER-INDEPENDENT exact centroid sums: float32
# inputs are dyadic rationals, and every |v| >= 2^-22 times 2^45 is an
# exact int64, so partial sums commute bit-exactly with any grouping —
# including DuckDB's (the oracle). 2^45 * rows_per_label must stay
# under 2^63: exact to ~2^17 rows per label end-to-end (the driver
# combine stays int64). Beyond that, shrink the scale or switch the
# combine to python ints; the oracle bound is the same.
CENTROID_SCALE = 1 << 45


def _label_centroid_partial(batch: pa.Table) -> pa.Table:
    if batch.num_rows == 0:  # Ray Data emits empty blocks for empty inputs
        e64 = pa.array([], type=pa.int64())
        return pa.table({"label": e64, "dim": e64, "qsum": e64, "n": e64})
    m = _to_matrix(batch["embedding"]).astype(np.float64)
    q = np.rint(m * CENTROID_SCALE).astype(np.int64)
    labels = np.asarray(batch["label"], dtype=np.int64)
    order = np.argsort(labels, kind="stable")
    ls = labels[order]
    starts = np.flatnonzero(np.r_[True, ls[1:] != ls[:-1]])
    sums = np.add.reduceat(q[order], starts, axis=0)  # (L, dim)
    counts = np.diff(np.append(starts, len(ls)))
    L, dim = sums.shape
    return pa.table({
        "label": pa.array(np.repeat(ls[starts], dim), type=pa.int64()),
        "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), L)),
        "qsum": pa.array(sums.ravel(), type=pa.int64()),
        "n": pa.array(np.repeat(counts, dim), type=pa.int64()),
    })


def label_centroids(embeddings_ds) -> pa.Table:
    """Per-label mean embedding (one row per (label, dim)).

    Combiner shape: each batch emits L x dim partial rows (tiny), the
    driver merges the partials — a classic pre-aggregated global
    aggregate, no shuffle. The quantized integer sums make the result
    BIT-EXACT and summation-order-independent, so the DuckDB oracle
    (same quantization in SQL) matches by hash.
    """
    parts = embeddings_ds.map_batches(
        _label_centroid_partial, batch_format="pyarrow"
    ).to_pandas()
    agg = parts.groupby(["label", "dim"], sort=True).agg(
        qsum=("qsum", "sum"), n=("n", "sum")).reset_index()
    centroid = agg["qsum"].to_numpy(dtype=np.float64) / (
        agg["n"].to_numpy(dtype=np.float64) * float(CENTROID_SCALE))
    return pa.table({
        "label": pa.array(agg["label"].to_numpy(), type=pa.int64()),
        "dim": pa.array(agg["dim"].to_numpy(), type=pa.int64()),
        "centroid": pa.array(centroid, type=pa.float64()),
        "n": pa.array(agg["n"].to_numpy(), type=pa.int64()),
    })


# ---- product quantization (IVF-PQ): the compressed-vector scale path ------
#
# At 10^12 vectors the raw float32 matrix (dim*4 bytes/vec) cannot live
# in worker memory; PQ codes (m_sub bytes/vec) can. The engine keeps
# the same deterministic-training contract as ivf_train: seeded
# data-independent init, per-block partial sums, driver combines only
# (m_sub * ksub * dsub) floats per iteration.


def pq_train(embeddings_ds, dim, m_sub=4, ksub=16, iters=3, seed=42):
    """Per-subspace k-means codebooks: split dim into m_sub contiguous
    subspaces of dim/m_sub, train ksub centroids in each — ONE
    map_batches pass per Lloyd iteration trains every subspace at once
    (partials are (m_sub*ksub) x (dsub+1) floats per block). Returns
    float32 (m_sub, ksub, dsub) codebooks; assignment metric is L2 on
    the raw (un-normalized) subvectors, the standard PQ contract."""
    if dim % m_sub:
        raise ValueError(f"pq_train: dim {dim} not divisible by m_sub {m_sub}")
    dsub = dim // m_sub
    rng = np.random.default_rng(seed)
    books = rng.standard_normal((m_sub, ksub, dsub)).astype(np.float32)

    for _ in range(iters):
        bk = books

        def partials(batch: pa.Table, bk=bk) -> pa.Table:
            m = _to_matrix(batch["embedding"], dim=dim)
            sums = np.zeros((m_sub, ksub, dsub), dtype=np.float64)
            cnts = np.zeros((m_sub, ksub), dtype=np.float64)
            if m.shape[0]:
                for s in range(m_sub):
                    sub = m[:, s * dsub:(s + 1) * dsub]
                    code = _pq_nearest(sub, bk[s])
                    np.add.at(sums[s], code, sub.astype(np.float64))
                    cnts[s] += np.bincount(code, minlength=ksub)
            return pa.table({
                "sub": pa.array(np.repeat(np.arange(m_sub), ksub), type=pa.int64()),
                "cid": pa.array(np.tile(np.arange(ksub), m_sub), type=pa.int64()),
                "sum": pa.array(list(sums.reshape(m_sub * ksub, dsub)),
                                type=pa.list_(pa.float64())),
                "cnt": pa.array(cnts.reshape(-1), type=pa.float64()),
            })

        parts = embeddings_ds.map_batches(partials, batch_format="pyarrow").to_pandas()
        sums = np.zeros((m_sub, ksub, dsub), dtype=np.float64)
        cnts = np.zeros((m_sub, ksub), dtype=np.float64)
        for s, cid, sm, c in zip(parts["sub"], parts["cid"],
                                 parts["sum"], parts["cnt"]):
            sums[s, cid] += np.asarray(sm)
            cnts[s, cid] += c
        new = books.astype(np.float64).copy()
        nz = cnts > 0
        new[nz] = sums[nz] / cnts[nz][:, None]
        books = new.astype(np.float32)
    return books


def _pq_nearest(sub: np.ndarray, book: np.ndarray) -> np.ndarray:
    """Nearest codeword by L2: ||x-c||^2 = ||x||^2 - 2x.c + ||c||^2,
    the ||x||^2 term is constant per row — one GEMM + argmin."""
    d = -2.0 * (sub @ book.T) + (book * book).sum(axis=1)[None, :]
    return np.argmin(d, axis=1).astype(np.int64)


def pq_encode(embeddings_ds, books):
    """Add the ``pq_code`` column (m_sub uint8 codewords per vector) —
    the representation a 100-TB index actually stores/shuffles."""
    bk = np.asarray(books, dtype=np.float32)
    m_sub, ksub, dsub = bk.shape

    def enc(batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch["embedding"], dim=m_sub * dsub)
        codes = np.zeros((m.shape[0], m_sub), dtype=np.uint8)
        for s in range(m_sub):
            codes[:, s] = _pq_nearest(m[:, s * dsub:(s + 1) * dsub], bk[s])
        return batch.append_column(
            "pq_code", pa.array(list(codes), type=pa.list_(pa.uint8())))

    return embeddings_ds.map_batches(enc, batch_format="pyarrow")


def pq_topk(embeddings_ds, q_ids, q_matrix, k, books, refine=4):
    """Asymmetric-distance (ADC) top-k over PQ codes with exact
    refinement: per block, approximate scores are ONE LUT gather-sum
    per subspace (no float matmul against the corpus), the top
    ``refine * k`` ADC candidates per (block, query) are re-scored
    with exact cosine, and block partials merge on the driver
    (blocks x Q x k rows — the cosine_topk contract). refine=0 ranks
    purely by ADC (pure compressed-domain search)."""
    bk = np.asarray(books, dtype=np.float32)
    m_sub, ksub, dsub = bk.shape
    q = np.asarray(q_matrix, dtype=np.float32)
    qn = np.linalg.norm(q, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    qunit = q / qn
    # LUT[qi, s, c] = dot(q_sub, codeword) on the UNIT query — ADC
    # approximates dot(q_unit, x); cosine needs x's norm, carried below
    lut = np.einsum("qsd,scd->qsc",
                    qunit.reshape(len(q), m_sub, dsub), bk).astype(np.float32)
    # codeword squared norms: reconstruct ||x||^2 ~ sum_s ||c_s||^2 so
    # pure-ADC ranks by estimated COSINE, not raw dot
    n2 = (bk * bk).sum(axis=2).astype(np.float32)  # (m_sub, ksub)
    q_ids = np.asarray(q_ids, dtype=np.int64)

    def block_topk(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        out = {"q_id": [], "vec_id": [], "sim": []}
        if n == 0:
            return pa.table({"q_id": pa.array([], type=pa.int64()),
                             "vec_id": pa.array([], type=pa.int64()),
                             "sim": pa.array([], type=pa.float64())})
        codes = np.stack(batch["pq_code"].to_numpy(zero_copy_only=False))
        vec_ids = np.asarray(batch["vec_id"], dtype=np.int64)
        m = _to_matrix(batch["embedding"]) if refine else None
        if m is not None:
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0] = 1.0
        # ADC scores: sum LUT[s][codes[:, s]] over subspaces per query
        adc = np.zeros((len(q_ids), n), dtype=np.float32)
        est2 = np.zeros(n, dtype=np.float32)
        for s in range(m_sub):
            adc += lut[:, s, :][:, codes[:, s]]
        for s in range(m_sub):
            est2 += n2[s][codes[:, s]]
        adc /= np.sqrt(np.maximum(est2, 1e-12))[None, :]
        take = min(n, max(k, (refine * k) if refine else k))
        for qi in range(len(q_ids)):
            cand = np.argpartition(-adc[qi], take - 1)[:take] if take < n \
                else np.arange(n)
            if refine:
                sims = (m[cand] @ qunit[qi]) / norms[cand]
            else:
                sims = adc[qi][cand].astype(np.float64)
            order = np.lexsort((vec_ids[cand], -sims))[:k]
            sel = cand[order]
            out["q_id"].append(np.full(len(sel), q_ids[qi], dtype=np.int64))
            out["vec_id"].append(vec_ids[sel])
            out["sim"].append(sims[order].astype(np.float64))
        return pa.table({kk: pa.array(np.concatenate(v)) for kk, v in out.items()})

    parts = embeddings_ds.map_batches(block_topk, batch_format="pyarrow").to_pandas()
    rows = []
    for qi in q_ids:
        g = parts[parts["q_id"] == qi].sort_values(
            ["sim", "vec_id"], ascending=[False, True], kind="mergesort").head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1))
        rows.append(g)
    out = pd.concat(rows, ignore_index=True) if rows else parts.assign(rank=[])
    return pa.Table.from_pandas(out[["q_id", "vec_id", "rank"]],
                                preserve_index=False)


# ---- IVF index on disk: prune-at-the-read ---------------------------------


def ivf_write_index(embeddings_ds, out_dir, centroids):
    """Materialize the IVF index as hive-partitioned parquet
    (``out_dir/ivf_cell=C/``): the layout that makes probe cost
    proportional to nprobe/n_centroids of the corpus — a search reads
    ONLY the probed cells' files, so the 100-TB corpus never streams
    past a query. Writing goes through the streaming executor
    (one pass, no driver materialization); re-writes into a clean dir
    are the caller's contract (resumable layouts live in
    state/manifest.py)."""
    ivf_assign(embeddings_ds, centroids).write_parquet(
        out_dir, partition_cols=["ivf_cell"])


def ivf_search_index(index_dir, q_ids, q_matrix, k, centroids, nprobe=4):
    """Search the on-disk IVF index: pick every query's nprobe nearest
    cells, then read ONLY those hive partitions (prune at the read —
    unprobed cells cost zero I/O) and refine with the exact
    partial-top-k kernel. Same (q_id, vec_id, rank) contract as
    cosine_topk/ivf_topk."""
    import os

    import ray.data as rd

    cn = np.asarray(centroids)
    if cn.dtype != np.float64:
        cn = cn.astype(np.float32)
    q = np.asarray(q_matrix, dtype=cn.dtype)
    qnorm = np.linalg.norm(q, axis=1, keepdims=True)
    qnorm[qnorm == 0] = 1.0
    sims = (q / qnorm) @ cn.T
    nprobe = min(nprobe, cn.shape[0])
    probe = np.argpartition(-sims, nprobe - 1, axis=1)[:, :nprobe]
    dirs = [os.path.join(index_dir, f"ivf_cell={c}")
            for c in np.unique(probe)]
    dirs = [d for d in dirs if os.path.isdir(d)]  # empty cells: no dir
    if not dirs:
        return pd.DataFrame({"q_id": pd.Series([], dtype="int64"),
                             "vec_id": pd.Series([], dtype="int64"),
                             "rank": pd.Series([], dtype="int64")})
    files = sorted(os.path.join(d, f) for d in dirs for f in os.listdir(d))
    ds = rd.read_parquet(files, columns=["vec_id", "embedding"])
    return cosine_topk(ds, q_ids, q_matrix, k)


# ---- SemDeDup: semantic deduplication ------------------------------------


def _semdedup_block(table: pa.Table, threshold: float) -> pa.Table:
    """One exchange partition (whole clusters, co-located by the cell
    hash) -> per-vector dup flags. Clusters resolve as runs of one
    argsort; each run is a single dense matmul (the _near_dup_block
    pattern). Within a cluster, sorted ascending by vec_id, a vector
    is a duplicate iff some LOWER id in the same cluster has cosine >=
    threshold — the deterministic keep-first rule every dedup surface
    here shares (dedup_exact, minhash survivors, near_dup pairs)."""
    empty = pa.table({
        "vec_id": pa.array([], type=pa.int64()),
        "cell": pa.array([], type=pa.int64()),
        "is_dup": pa.array([], type=pa.bool_()),
    })
    if table.num_rows == 0:
        return empty
    cell = np.asarray(table["ivf_cell"], dtype=np.int64)
    ids = np.asarray(table["vec_id"], dtype=np.int64)
    m = _to_matrix(table["embedding"]).astype(np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mn = m / norms
    # one sort orders by (cell, vec_id): runs are clusters, and within
    # each run ids ascend so "lower id exists" is a strict lower
    # triangle test.
    order = np.lexsort((ids, cell))
    c_s, ids_s, mn_s = cell[order], ids[order], mn[order]
    dup = np.zeros(len(ids_s), dtype=bool)
    starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]])
    bounds = np.append(starts, len(c_s))
    for i in range(len(starts)):
        s, e = bounds[i], bounds[i + 1]
        if e - s < 2:
            continue
        sims = mn_s[s:e] @ mn_s[s:e].T
        dup[s:e] = np.tril(sims >= threshold, k=-1).any(axis=1)
    return pa.table({
        "vec_id": pa.array(ids_s, type=pa.int64()),
        "cell": pa.array(c_s, type=pa.int64()),
        "is_dup": pa.array(dup, type=pa.bool_()),
    })


def semantic_dedup(embeddings_ds, n_cells, dim, threshold,
                   centroids=None, num_partitions: int = 16):
    """SemDeDup (Abbas et al. 2023): cluster embeddings with a coarse
    quantizer, then flag within-cluster semantic duplicates by exact
    pairwise cosine — the dedup layer that catches paraphrases and
    re-encodings exact/MinHash dedup cannot see.

    Default quantizer is :func:`fixed_centroids` (closed-form, so the
    whole path is SQL-expressible — the `semantic_dedup` driver oracle
    walks it exactly); pass k-means ``centroids`` from
    :func:`ivf_train` for the trained variant. Returns a Dataset of
    (vec_id, cell, is_dup) — filter ``is_dup == False`` for survivors.

    Scale shape: assignment is one map_batches GEMM per block; flags
    need each cluster co-located, ONE hash exchange on the cell id.
    Per-cluster work is O(|c|^2 * dim) — SemDeDup's own contract: the
    quantizer's n_cells is the knob that bounds |c| ~ N/n_cells, and a
    skew-hot cluster is capped by the same num_partitions memory story
    as every exchange here. No broadcast, no all-pairs across
    clusters."""
    import functools

    from .exchange import hash_exchange

    cent = (fixed_centroids(embeddings_ds, n_cells, dim)
            if centroids is None else np.asarray(centroids))
    asgn = ivf_assign(
        embeddings_ds.select_columns(["vec_id", "embedding"]), cent)
    return hash_exchange(
        asgn, "ivf_cell",
        functools.partial(_semdedup_block, threshold=threshold),
        num_partitions=num_partitions)
