"""Shared threshold-masked streaming top-k kernel.

One implementation behind both brute-force nearest-neighbor partials:
`stages/join.KnnPartial` (squared-euclidean on lon/lat) and
`stages/embed.CosineTopKPartial` (negated cosine via GEMM). The two
carried the scheme by copy through round 3 (recorded deferral,
NOTES.md); this module is the single source of truth, parameterized by
a per-chunk scorer callback.

Scheme (exact, deterministic): per candidate chunk only the score
matrix and one comparison against the current per-query kth-best score
are computed; passing candidates accumulate in a pool compacted (one
lexsort + first-k-per-run) when it outgrows POOL_LIMIT. After the
first compaction the threshold mask admits almost nothing, so steady
state is pure vectorized score math — the per-chunk argpartition this
replaced profiled at ~60% of kernel time. `<=` keeps boundary ties, so
(score asc, id asc) tie-breaking stays exact under the final compact.
"""

from __future__ import annotations

import numpy as np

CHUNK = 4096  # candidates per inner chunk: keeps the (Q, CHUNK) score
# matrix ~4 MB so 32 concurrent tasks don't thrash memory bandwidth
# (un-chunked, per-task CPU inflates ~4x from contention)

POOL_LIMIT = 1 << 16  # compact the candidate pool beyond this


def topk_runs(qidx, ids, vals, k):
    """Exact per-query top-k by (score, id): one lexsort by
    (query, score, id) + first-k-per-run mask. Returns the sorted
    (qs, cs, vs), run starts, and the keep mask."""
    order = np.lexsort((ids, vals, qidx))
    qs, vs, cs = qidx[order], vals[order], ids[order]
    n = len(qs)
    new_run = np.ones(n, dtype=bool)
    new_run[1:] = qs[1:] != qs[:-1]
    starts = np.flatnonzero(new_run)
    run_start = np.repeat(starts, np.diff(np.append(starts, n)))
    keep = (np.arange(n, dtype=np.int64) - run_start) < k
    return qs, cs, vs, starts, keep


def check_unique_qids(q_ids: np.ndarray, who: str) -> None:
    # the searchsorted self-exclusion probe masks only the FIRST
    # matching query position, so duplicate query ids would silently
    # change semantics vs a full (Q, W) equality mask
    if np.unique(q_ids).size != q_ids.size:
        raise ValueError(f"{who} requires unique q_ids "
                         "(searchsorted self-exclusion masks one hit per id)")


def streaming_topk(c_ids: np.ndarray, q_ids: np.ndarray, k: int,
                   score_chunk, exclude_self: bool = True,
                   chunk: int = CHUNK, pool_limit: int = POOL_LIMIT):
    """Run the streaming top-k over candidates ``c_ids``.

    ``score_chunk(sl) -> (Q, W) float64`` returns scores for candidate
    slice ``sl`` (smaller = better; the kernel may write into the
    returned array — reusing a caller-owned buffer per chunk is fine).
    Returns ``(q_idx, cand_ids, scores)`` — exact top-k rows per query,
    grouped by query ascending, (score, id) ascending within — or
    ``None`` when nothing survived (empty input / all excluded).
    """
    q_ids = np.asarray(q_ids, dtype=np.int64)
    Q = len(q_ids)
    thresh = np.full(Q, np.inf)
    pool_q, pool_i, pool_v = [], [], []
    pool_n = 0
    # self-exclusion via a searchsorted hit test per chunk — an
    # O(W log Q) probe instead of a (Q, W) id-equality matrix pass
    q_sorted = np.sort(q_ids)
    q_rank = np.argsort(q_ids, kind="stable")

    def compact():
        nonlocal pool_q, pool_i, pool_v, pool_n
        qidx = np.concatenate(pool_q)
        ids_f = np.concatenate(pool_i)
        vals_f = np.concatenate(pool_v)
        finite = vals_f < np.inf
        if not finite.all():
            qidx, ids_f, vals_f = qidx[finite], ids_f[finite], vals_f[finite]
        qs, cs, vs, starts, keep = topk_runs(qidx, ids_f, vals_f, k)
        pool_q, pool_i, pool_v = [qs[keep]], [cs[keep]], [vs[keep]]
        pool_n = int(keep.sum())
        # tighten per-query thresholds to the kth-best score
        n = len(qs)
        run_len = np.diff(np.append(starts, n))
        full = run_len >= k
        thresh[qs[starts[full]]] = vs[starts[full] + k - 1]
        return qs, cs, vs, keep

    mask = np.empty((Q, chunk), dtype=bool)  # reused: zero allocation
    for start in range(0, len(c_ids), chunk):
        sl = slice(start, min(start + chunk, len(c_ids)))
        scores = score_chunk(sl)  # (Q, W), kernel may modify in place
        if exclude_self and Q:
            pos = np.searchsorted(q_sorted, c_ids[sl])
            hit = np.flatnonzero(q_sorted[np.minimum(pos, Q - 1)] == c_ids[sl])
            if len(hit):
                scores[q_rank[pos[hit]], hit] = np.inf
        m = mask[:, :scores.shape[1]]
        np.less_equal(scores, thresh[:, None], out=m)
        qi, ci = np.nonzero(m)
        if len(qi):
            pool_q.append(qi.astype(np.int64))
            pool_i.append(c_ids[sl][ci])
            pool_v.append(scores[qi, ci])
            pool_n += len(qi)
        if pool_n > pool_limit:
            compact()
    if not pool_q:
        return None
    qs, cs, vs, keep = compact()
    return qs[keep], cs[keep], vs[keep]
