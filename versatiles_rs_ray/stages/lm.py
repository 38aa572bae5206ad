"""N-gram language-model scoring — the CCNet/KenLM-style perplexity
quality signal for corpus curation.

Train an order-``n`` count LM over a (possibly different) corpus, then
score every document by stupid-backoff log-likelihood (Brants et al.
2007: S(w|ctx) = c(ngram)/c(ctx) when the n-gram survives the count
floor, else ``alpha`` * S(w|shorter ctx), grounding at unigram
relative frequency). Documents whose mean NLL is far above the corpus
median are the gibberish/boilerplate a perplexity filter drops (CCNet,
Wenzek et al. 2020).

Everything is exchange-based, no vocabulary broadcast:

- count tables: the :func:`~.text._ngram_partial` combiner partials
  through ONE gram-hash exchange per order (same shape as
  ``token_counts`` / ``ngram_topn``) — tables stay distributed;
- scoring: documents explode to one row per token position carrying
  the order-1..n gram strings ending there (vectorized end-aligned
  Arrow joins, no Python loop), then ``2n-1`` co-partitioned left
  :func:`~.join.hash_join` probes attach the gram + context counts;
- per-position log-probs quantize to INTEGER micro-nats BEFORE the
  per-doc sum, so the doc score is an order-independent int64 sum —
  bit-stable under any partitioning, exactly mirrorable in SQL
  (the pmi_topk/bm25 quantization contract).

Scale note: scoring ships every token position through the join
exchanges (2n-1 corpus-volume shuffles). That is the honest cost of
exact corpus-scale LM scoring without a table broadcast; when the
model table fits a worker (the common case — pruned KenLM tables are
GBs, not TBs), pass ``broadcast=True`` to attach counts from a
ray.put lookup inside one map_batches pass instead (zero shuffles).

Reference parity: the reference engine has no LM surface (this is
graft-new, SURVEY.md §2 "beyond the reference" list); tokenization
matches the corpus contract in ``stages/text._split_tokens``.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

from .text import _ngram_partial, _split_tokens, _token_totals


def ngram_counts(ds, n: int, column: str = "text", min_count: int = 1,
                 num_partitions: int = 32):
    """Exact global (token=gram, cnt) count table for order ``n``
    contiguous token n-grams — ``token_counts`` generalized to any
    order, with the KenLM-style count floor applied INSIDE the
    exchange combine so pruned grams never leave their partition."""
    from .exchange import hash_exchange

    if n < 1:
        raise ValueError(f"ngram_counts: n must be >= 1, got {n}")
    parts = ds.map_batches(
        functools.partial(_ngram_partial, column=column, n=n),
        batch_format="pyarrow")
    return hash_exchange(
        parts, "_route",
        functools.partial(_ngram_totals_floor, min_count=min_count),
        num_partitions=num_partitions)


def _ngram_totals_floor(tbl: pa.Table, min_count: int) -> pa.Table:
    t = _token_totals(tbl)
    if min_count > 1 and t.num_rows:
        m = np.asarray(t["cnt"], dtype=np.int64) >= min_count
        if not m.all():
            t = t.filter(pa.array(m))
    return t


def _lm_position_rows(batch: pa.Table, column: str, id_col: str,
                      n: int) -> pa.Table:
    """One row per token position: (doc id, g1..gn, x2..xn) where
    ``g_m`` is the order-m gram ENDING at this position and ``x_m``
    its order-(m-1) context (the gram ending one position earlier).
    Orders that reach past the document start carry "" — a string no
    real gram can be (tokens are non-empty), so the left join simply
    misses. All end-aligned grams come from the same n-1 shifted
    binary_join passes as ``_ngram_partial``; within-doc validity is
    just ``pos >= m-1`` because positions count within the document."""
    import pyarrow.compute as pc

    names = ([id_col] + [f"g{m}" for m in range(1, n + 1)]
             + [f"x{m}" for m in range(2, n + 1)])
    types = [pa.int64()] + [pa.string()] * (2 * n - 1)
    flat, tlen, offs = _split_tokens(batch[column])
    keep = tlen > 0
    from .text import _per_doc_sum
    n_words = _per_doc_sum(keep.astype(np.int64), offs)
    words = flat.filter(pa.array(keep)) if not keep.all() else flat
    L = len(words)
    if L == 0:
        return pa.table({nm: pa.array([], type=t)
                         for nm, t in zip(names, types)})
    doc_row = np.repeat(np.arange(len(n_words), dtype=np.int64), n_words)
    starts = np.zeros(len(n_words) + 1, dtype=np.int64)
    np.cumsum(n_words, out=starts[1:])
    pos = np.arange(L, dtype=np.int64) - starts[doc_row]
    ids = np.asarray(batch[id_col], dtype=np.int64)[doc_row]

    # end-aligned gram arrays per order: G[m][i] = join(words[i-m+1..i])
    # when pos[i] >= m-1, else "".
    G: dict[int, pa.Array] = {1: words.combine_chunks()
                              if isinstance(words, pa.ChunkedArray) else words}
    for m in range(2, n + 1):
        if L < m:
            # batch's total token count below the order: no position can
            # satisfy pos >= m-1, and the slice below would be empty while
            # take() still evaluates its (clamped-to-0) indices eagerly.
            G[m] = pa.array([""] * L, type=pa.string())
            continue
        joined = G[1].slice(0, L - m + 1)
        for j in range(1, m):
            joined = pc.binary_join_element_wise(
                joined, G[1].slice(j, L - m + 1), " ")
        idx = np.arange(L, dtype=np.int64) - (m - 1)
        np.maximum(idx, 0, out=idx)
        valid = pa.array(pos >= m - 1)
        G[m] = pc.if_else(valid, joined.take(pa.array(idx)), "")
    cols = {id_col: pa.array(ids, type=pa.int64())}
    for m in range(1, n + 1):
        cols[f"g{m}"] = G[m]
    # x_m = order-(m-1) gram ending at the previous position; available
    # exactly when g_m is (pos >= m-1 implies pos-1 >= m-2).
    prev = np.arange(L, dtype=np.int64) - 1
    np.maximum(prev, 0, out=prev)
    prev_arr = pa.array(prev)
    for m in range(2, n + 1):
        valid = pa.array(pos >= m - 1)
        cols[f"x{m}"] = pc.if_else(valid, G[m - 1].take(prev_arr), "")
    return pa.table(cols)


def _score_positions(b: pa.Table, n: int, alpha: float,
                     total: float, id_col: str) -> pa.Table:
    """Vectorized stupid-backoff per position, then a per-doc integer
    partial: (doc id, n_tok, nll_micro). Quantizing each position's
    log-prob to micro-nats BEFORE summing keeps the doc score an exact
    int64 no matter how the joins scattered its positions."""
    N = b.num_rows
    empty = pa.table({id_col: pa.array([], type=pa.int64()),
                      "n_tok": pa.array([], type=pa.int64()),
                      "nll_micro": pa.array([], type=pa.int64())})
    if N == 0:
        return empty
    import pyarrow.compute as pc

    ids = np.asarray(b[id_col], dtype=np.int64)
    c = {m: np.asarray(pc.fill_null(b[f"c{m}"], 0), dtype=np.float64)
         for m in range(1, n + 1)}
    x = {m: np.asarray(pc.fill_null(b[f"xc{m}"], 0), dtype=np.float64)
         for m in range(2, n + 1)}
    mult = np.ones(N, dtype=np.float64)
    resolved = np.zeros(N, dtype=bool)
    lp = np.zeros(N, dtype=np.float64)
    for m in range(n, 1, -1):
        gm = b[f"g{m}"]
        avail = np.asarray(pc.not_equal(
            gm.combine_chunks() if isinstance(gm, pa.ChunkedArray) else gm,
            ""))
        hit = ~resolved & (c[m] > 0)
        if hit.any():
            lp[hit] = np.log((mult[hit] * c[m][hit]) / x[m][hit])
        miss = ~resolved & ~hit & avail
        if miss.any():
            mult[miss] *= alpha
        resolved |= hit
    rest = ~resolved
    if rest.any():
        # c1 >= 1 whenever the model corpus includes the scored corpus;
        # foreign-model OOV tokens get a count-1 floor.
        c1 = np.maximum(c[1][rest], 1.0)
        lp[rest] = np.log((mult[rest] * c1) / total)
    lp_micro = np.floor(lp * 1e6 + 0.5).astype(np.int64)
    uniq, inv = np.unique(ids, return_inverse=True)
    ntok = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
    nll = np.zeros(len(uniq), dtype=np.int64)
    np.subtract.at(nll, inv, lp_micro)
    return pa.table({id_col: pa.array(uniq, type=pa.int64()),
                     "n_tok": pa.array(ntok, type=pa.int64()),
                     "nll_micro": pa.array(nll, type=pa.int64())})


def _doc_merge(tbl: pa.Table, id_col: str) -> pa.Table:
    ids = np.asarray(tbl[id_col], dtype=np.int64)
    uniq, inv = np.unique(ids, return_inverse=True)
    ntok = np.zeros(len(uniq), dtype=np.int64)
    nll = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(ntok, inv, np.asarray(tbl["n_tok"], dtype=np.int64))
    np.add.at(nll, inv, np.asarray(tbl["nll_micro"], dtype=np.int64))
    return pa.table({id_col: pa.array(uniq, type=pa.int64()),
                     "n_tok": pa.array(ntok, type=pa.int64()),
                     "nll_micro": pa.array(nll, type=pa.int64())})


def lm_score(ds, n: int = 2, alpha: float = 0.4, min_count: int = 2,
             column: str = "text", id_col: str = "doc_id",
             model_ds=None, num_partitions: int = 32,
             broadcast: bool = False):
    """Score every document by order-``n`` stupid-backoff NLL against
    a count LM trained on ``model_ds`` (default: the corpus itself —
    the self-scoring CCNet setup where high-NLL docs are outliers).

    Returns a Dataset of (``id_col``, n_tok, nll_micro): token count
    and the per-doc sum of per-position negative log-probs in integer
    micro-nats (mean NLL = nll_micro / n_tok / 1e6). ``min_count``
    prunes orders >= 2 (unigrams stay exact so the base case is always
    defined); pruning is what makes backoff fire at all when
    self-scoring, and it is the knob that bounds table size at corpus
    scale. ``broadcast=True`` gathers the count tables once to the
    driver and attaches counts via a ray.put lookup inside a single
    map_batches pass — the right plan when the pruned model fits a
    worker; the default exchange plan never materializes a table."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .exchange import hash_exchange
    from .join import hash_join

    if n < 2:
        raise ValueError(f"lm_score: n must be >= 2, got {n}")
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"lm_score: alpha must be in (0, 1], got {alpha}")
    model = ds if model_ds is None else model_ds
    tables = {m: ngram_counts(model, m, column=column,
                              min_count=(1 if m == 1 else min_count),
                              num_partitions=num_partitions)
              for m in range(1, n + 1)}
    agg = tables[1].aggregate(Sum("cnt", alias_name="n"))
    total = float((agg or {}).get("n") or 0.0)
    rows = ds.map_batches(
        functools.partial(_lm_position_rows, column=column,
                          id_col=id_col, n=n),
        batch_format="pyarrow")
    if total == 0.0:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            id_col: pa.array([], type=pa.int64()),
            "n_tok": pa.array([], type=pa.int64()),
            "nll_micro": pa.array([], type=pa.int64())}))

    if broadcast:
        import ray

        # Broadcast each order's (token, cnt) as Arrow arrays once;
        # per batch the lookup is one vectorized pc.index_in probe +
        # one take — no per-element Python dict hops (misses surface
        # as null indices, which take propagates as null counts, the
        # same semantics the co-partitioned left-join leg produces).
        lookup = {m: pa.table(b) for m, t in tables.items()
                  for b in [pa.concat_tables(
                      list(t.iter_batches(batch_format="pyarrow")) or
                      [pa.schema([("token", pa.string()),
                                  ("cnt", pa.int64())]).empty_table()])]}
        ref = ray.put({m: (t["token"].combine_chunks(),
                           t["cnt"].combine_chunks().cast(pa.int64()))
                       for m, t in lookup.items()})

        def attach(b: pa.Table, _ref=ref) -> pa.Table:
            import pyarrow.compute as pc

            tabs = ray.get(_ref) if hasattr(_ref, "hex") else _ref

            def probe(col, m):
                tok, cnt = tabs[m]
                if len(tok) == 0:
                    return pa.nulls(len(col), type=pa.int64())
                idx = pc.index_in(col, value_set=tok)
                return pc.take(cnt, idx)

            for m in range(1, n + 1):
                b = b.append_column(f"c{m}", probe(b[f"g{m}"], m))
            for m in range(2, n + 1):
                b = b.append_column(f"xc{m}", probe(b[f"x{m}"], m - 1))
            return b

        rows = rows.map_batches(attach, batch_format="pyarrow")
    else:
        def renamed(t, key, cnt_name):
            def f(b: pa.Table, _k=key, _c=cnt_name) -> pa.Table:
                return pa.table({_k: b["token"], _c: b["cnt"]})
            return t.map_batches(f, batch_format="pyarrow")

        def null_cnt(cnt_name):
            def f(b: pa.Table, _c=cnt_name) -> pa.Table:
                return b.append_column(
                    _c, pa.nulls(b.num_rows, type=pa.int64()))
            return f

        # a fully-pruned order can leave an EMPTY count table (schema
        # unknowable through a lazy map) — every probe misses, so the
        # join degenerates to a null count column.
        nonempty = {m: bool(tables[m].count()) for m in range(1, n + 1)}
        for m in range(1, n + 1):
            if nonempty[m]:
                rows = hash_join(rows, renamed(tables[m], f"g{m}", f"c{m}"),
                                 f"g{m}", how="left",
                                 num_partitions=num_partitions)
            else:
                rows = rows.map_batches(null_cnt(f"c{m}"),
                                        batch_format="pyarrow")
        for m in range(2, n + 1):
            if nonempty[m - 1]:
                rows = hash_join(rows,
                                 renamed(tables[m - 1], f"x{m}", f"xc{m}"),
                                 f"x{m}", how="left",
                                 num_partitions=num_partitions)
            else:
                rows = rows.map_batches(null_cnt(f"xc{m}"),
                                        batch_format="pyarrow")
    partials = rows.map_batches(
        functools.partial(_score_positions, n=n, alpha=alpha,
                          total=total, id_col=id_col),
        batch_format="pyarrow")
    return hash_exchange(partials, id_col,
                         functools.partial(_doc_merge, id_col=id_col),
                         num_partitions=num_partitions)
