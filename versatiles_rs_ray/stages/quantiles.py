"""EXACT distributed quantiles of a float64 column with KB driver
state — the radix-select trick: IEEE-754 doubles map monotonically to
uint64 (flip all bits of negatives, set the sign bit of positives),
so the exact q-quantile (DuckDB ``quantile_disc``: the element at
index max(ceil(q*n) - 1, 0) of the sorted multiset — the engine's
established convention, stages/curate._q_combine) is the k-th
smallest 64-bit key, found by EIGHT streaming byte-histogram passes:
each pass scans the column once, counting a 256-bin histogram of the
next byte among rows matching the quantile's resolved prefix; the
driver walks the cumulative counts to fix 8 more bits and the rank
within the chosen bin. After 8 passes the full bit pattern is known
and maps back to the exact element.

Per-pass driver state: 256 int64s per active prefix (quantiles that
share a prefix share a histogram), regardless of corpus size — this
computes exact quantiles of a 100 TB column without a sort, a
shuffle, or more than ~KBs on the driver. Cost: 8 column-pruned
streaming scans (the classic passes-for-memory trade; radix selection
is textbook — Knuth TAOCP vol. 3 distribution counting).

NULLs are ignored (DuckDB parity). NaNs, if present, sort after
+inf (the bit map's natural order — matching DuckDB's NaN-last);
quantiles that land on a NaN return NaN.

Reference parity: the reference has no column-statistics surface
(graft-new; SURVEY.md §2 beyond-reference list).
"""

from __future__ import annotations

import functools
import math

import numpy as np
import pyarrow as pa

_SIGN = np.uint64(0x8000000000000000)


def f2u(v: np.ndarray) -> np.ndarray:
    """Order-preserving float64 -> uint64 (total order: -inf .. -0,
    +0 .. +inf, then NaNs)."""
    u = np.ascontiguousarray(v, dtype=np.float64).view(np.uint64)
    neg = (u & _SIGN) != 0
    return np.where(neg, ~u, u | _SIGN)


def u2f(u: int) -> float:
    """Inverse of :func:`f2u` for one encoded key."""
    u = np.uint64(u)
    raw = (u ^ _SIGN) if (u & _SIGN) else ~u
    return float(np.uint64(raw).view(np.float64))


def _hist_partial(batch: pa.Table, col: str, prefixes: tuple,
                  shift: int) -> pa.Table:
    """One row per active prefix: 256-bin histogram of byte
    ``(u >> shift) & 0xFF`` over the rows whose bits above
    ``shift + 8`` equal the prefix."""
    import pyarrow.compute as pc

    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = arr.filter(pc.is_valid(arr))
    u = f2u(np.asarray(arr, dtype=np.float64))
    byte = ((u >> np.uint64(shift)) & np.uint64(0xFF)).astype(np.int64)
    rows = []
    for pidx, p in enumerate(prefixes):
        if shift >= 56:
            sel = byte
        else:
            sel = byte[(u >> np.uint64(shift + 8)) == np.uint64(p)]
        h = np.bincount(sel, minlength=256).astype(np.int64)
        rows.append((pidx, h.tolist()))
    return pa.table({
        "pidx": pa.array([r[0] for r in rows], type=pa.int64()),
        "hist": pa.array([r[1] for r in rows], type=pa.list_(pa.int64())),
    })


def float_quantiles(ds, col: str, qs=(0.5,)) -> pa.Table:
    """Exact ``quantile_disc`` values of ``ds[col]`` (float64) for
    every q in ``qs``: (q_pct int64, value float64), one row per q.
    Eight streaming histogram passes; no sort, no shuffle, KB driver
    state bounded by 256 x len(qs) int64s per pass."""
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"float_quantiles: q must be in [0, 1], got {q}")
    if not qs:
        raise ValueError("float_quantiles: qs must be non-empty")
    # state per q: resolved prefix (bits above `shift`) and the rank
    # k within the rows matching that prefix
    state = None  # [(prefix, k), ...] aligned with qs
    for shift in range(56, -8, -8):
        if state is None:
            prefixes = (0,)  # first pass: every row matches
            owner = [0] * len(qs)
        else:
            uniq = sorted({p for p, _ in state})
            prefixes = tuple(uniq)
            owner = [uniq.index(p) for p, _ in state]
        parts = ds.map_batches(
            functools.partial(_hist_partial, col=col, prefixes=prefixes,
                              shift=shift),
            batch_format="pyarrow").to_pandas()
        hists = np.zeros((len(prefixes), 256), dtype=np.int64)
        if len(parts):  # Ray's to_pandas drops columns at 0 rows
            for pidx, h in zip(parts["pidx"], parts["hist"]):
                hists[int(pidx)] += np.asarray(h, dtype=np.int64)
        if state is None:
            n = int(hists[0].sum())
            if n == 0:
                raise ValueError(
                    f"float_quantiles: column {col!r} has no non-null rows")
            state = [(0, max(math.ceil(q * n) - 1, 0)) for q in qs]
        new_state = []
        for (prefix, k), o in zip(state, owner):
            cum = np.cumsum(hists[o])
            b = int(np.searchsorted(cum, k + 1, side="left"))
            below = int(cum[b - 1]) if b else 0
            new_state.append(((prefix << 8) | b, k - below))
        state = new_state
    return pa.table({
        "q_pct": pa.array([int(round(q * 100)) for q in qs],
                          type=pa.int64()),
        "value": pa.array([u2f(p) for p, _ in state], type=pa.float64()),
    })
