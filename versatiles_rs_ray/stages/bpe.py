"""Byte-pair-encoding tokenizer training and application — the
vocabulary-learning pass of LLM training-data prep (Sennrich et al.
2016, the classic word-frequency formulation GPT-2/SentencePiece BPE
descends from).

Why this is feasible at corpus scale: the CORPUS is read exactly once
(one distributed word-count exchange); the merge loop then runs LOCAL
to the driver over the gathered WORD-FREQUENCY TABLE, which is
vocabulary-sized — millions of rows where the corpus is trillions —
and prunable with ``min_word_count``. That gather is the same bound
the earlier distributed formulation already paid per round in its
materialize(); holding it once and iterating in-process replaces
num_merges cluster-wide task waves of pure coordination with the
classic incremental learner (subword-nmt shape): a lazy-deletion heap
keyed (-count, pair-string) yields each round's best pair in O(log P),
and a merge re-counts only the words that CONTAIN the merged pair, so
round cost is proportional to the pair's support, not the vocabulary.
A 32k-merge production run is minutes of one process, not 32k
cluster barriers (round-4 verdict, perf item 1).

Determinism: ties on pair count break on the lexicographically
smallest pair, so the merge sequence is a pure function of the corpus.

The reference engine has no tokenizer surface (graft-new, SURVEY.md §2
"beyond the reference"); tokenization of documents into words matches
``stages/text._split_tokens`` (whitespace, SQL-mirrorable).
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

END = "\x03"  # end-of-word sentinel symbol (ETX: never in real text)
SEP = " "  # pair-string separator for hashing/counting


def _greedy_select(match_idx: np.ndarray) -> np.ndarray:
    """Left-to-right non-overlapping selection over sorted candidate
    positions: within each maximal run of CONSECUTIVE indices take
    every other one (positions i and i+1 share a symbol; gap >= 2 is
    independent) — exact classic-BPE greedy, no Python loop."""
    if len(match_idx) == 0:
        return match_idx
    new_run = np.r_[True, np.diff(match_idx) != 1]
    run_id = np.cumsum(new_run) - 1
    run_starts = match_idx[new_run]
    within = match_idx - run_starts[run_id]
    return match_idx[within % 2 == 0]


def _merge_word(syms: list, left: str, right: str) -> list:
    """Apply one merge to ONE word's symbol list: find adjacent
    (left, right) positions, greedy-select left-to-right
    non-overlapping (:func:`_greedy_select`), concat-replace."""
    m = np.flatnonzero(np.fromiter(
        (a == left and b == right for a, b in zip(syms, syms[1:])),
        dtype=bool, count=len(syms) - 1))
    sel = _greedy_select(m)
    if not len(sel):
        return syms
    keep = set(sel.tolist())
    out, i = [], 0
    while i < len(syms):
        if i in keep:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_train(ds, num_merges: int, column: str = "text",
              min_word_count: int = 1, num_partitions: int = 32):
    """Learn ``num_merges`` BPE merges from the corpus. Returns
    (merges, word_table): ``merges`` is the ordered list of
    (left, right, pair_count) driving :func:`bpe_apply`; ``word_table``
    the final segmented (syms, cnt) Dataset (inspection/vocab export).

    The corpus is reduced ONCE by the distributed word-count exchange
    (:func:`..stages.text.token_counts`); the merge loop itself is
    driver-local and incremental — see the module docstring for why
    that is the right orchestration shape (vocabulary-bounded state,
    per-round cost proportional to the merged pair's support).

    Stops early when no pair occurs twice (merging singleton pairs
    would memorize the corpus tail in arbitrary hash order).
    Determinism: ties on pair count break on the lexicographically
    smallest ``left + SEP + right`` string, so the merge sequence is
    a pure function of the corpus."""
    import heapq
    from collections import Counter

    from .text import token_counts

    if num_merges < 1:
        raise ValueError(f"bpe_train: num_merges must be >= 1, got {num_merges}")
    words_ds = token_counts(ds, column=column,
                            num_partitions=num_partitions)
    if min_word_count > 1:
        words_ds = words_ds.map_batches(
            functools.partial(_floor_cnt, mc=min_word_count),
            batch_format="pyarrow")

    # Gather the vocabulary-sized word table (bounded: distinct words,
    # never the corpus) and build symbol lists + initial pair stats.
    words: list[list[str]] = []
    wcnt: list[int] = []
    for b in words_ds.iter_batches(batch_format="pyarrow"):
        for tok, c in zip(b["token"].to_pylist(), b["cnt"].to_pylist()):
            words.append(list(tok) + [END])
            wcnt.append(int(c))

    pair_cnt: dict[tuple, int] = {}
    pair_words: dict[tuple, set] = {}
    for idx, (syms, c) in enumerate(zip(words, wcnt)):
        for p in zip(syms, syms[1:]):
            pair_cnt[p] = pair_cnt.get(p, 0) + c
            pair_words.setdefault(p, set()).add(idx)

    # Lazy-deletion heap: entries are (-cnt, pair-string, pair); an
    # entry is valid only if its cnt still equals pair_cnt[pair].
    heap = [(-c, p[0] + SEP + p[1], p) for p, c in pair_cnt.items()]
    heapq.heapify(heap)

    def push(p):
        c = pair_cnt.get(p, 0)
        if c > 0:
            heapq.heappush(heap, (-c, p[0] + SEP + p[1], p))

    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        best = None
        while heap:
            negc, _key, p = heapq.heappop(heap)
            if pair_cnt.get(p, 0) == -negc:
                best = (p, -negc)
                break
        if best is None or best[1] < 2:
            break
        (left, right), cnt = best
        merges.append((left, right, cnt))
        touched: set[tuple] = set()
        for idx in pair_words.get((left, right), set()).copy():
            old = words[idx]
            new = _merge_word(old, left, right)
            c = wcnt[idx]
            oldp = Counter(zip(old, old[1:]))
            newp = Counter(zip(new, new[1:]))
            for p in oldp.keys() | newp.keys():
                d = newp.get(p, 0) - oldp.get(p, 0)
                if d:
                    pair_cnt[p] = pair_cnt.get(p, 0) + d * c
                    touched.add(p)
                if p in newp:
                    pair_words.setdefault(p, set()).add(idx)
                elif p in oldp:
                    pair_words.get(p, set()).discard(idx)
            words[idx] = new
        pair_cnt.pop((left, right), None)
        pair_words.pop((left, right), None)
        touched.discard((left, right))
        for p in touched:
            if pair_cnt.get(p, 0) <= 0:
                pair_cnt.pop(p, None)
                pair_words.pop(p, None)
            else:
                push(p)

    # Final word table: identical post-merge words collapse (counts
    # sum — pair statistics are additive, so this matches the classic
    # learner state) and go back out as a Dataset.
    import ray.data as rd

    agg: dict[tuple, int] = {}
    for syms, c in zip(words, wcnt):
        k = tuple(syms)
        agg[k] = agg.get(k, 0) + c
    table = rd.from_arrow(pa.table({
        "syms": pa.array([list(k) for k in agg],
                         type=pa.list_(pa.string())),
        "cnt": pa.array(list(agg.values()), type=pa.int64()),
    }))
    return merges, table


def _floor_cnt(t: pa.Table, mc: int) -> pa.Table:
    m = np.asarray(t["cnt"], dtype=np.int64) >= mc
    return t if m.all() else t.filter(pa.array(m))


def _encode_word(word: str, merges) -> list[str]:
    """Encode ONE word by applying the learned merges in rank order
    with the same greedy left-to-right rule as training — so a word
    seen in training segments exactly as the final word table has it."""
    syms = list(word) + [END]
    for left, right in merges:
        i, out = 0, []
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


class BpeEncoder:
    """Actor-pool encoder: merges live once per worker; each batch
    dictionary-encodes its words so the (inherently sequential) merge
    walk runs once per DISTINCT word, then scatters by take — the
    _vocab_partial trick. Output adds ``bpe_tokens`` (list<string>)
    and ``n_bpe_tokens`` per document."""

    def __init__(self, merges, column: str = "text"):
        self.merges = [(l, r) for l, r, *_ in merges]
        self.column = column
        self.cache: dict[str, list[str]] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .text import _per_doc_sum, _split_tokens

        flat, tlen, offs = _split_tokens(batch[self.column])
        keep = tlen > 0
        n_words = _per_doc_sum(keep.astype(np.int64), offs)
        words = flat.filter(pa.array(keep)) if not keep.all() else flat
        enc = (words.combine_chunks() if isinstance(words, pa.ChunkedArray)
               else words).dictionary_encode()
        uniq = enc.dictionary.to_pylist()
        segs = []
        for w in uniq:
            s = self.cache.get(w)
            if s is None:
                s = _encode_word(w, self.merges)
                self.cache[w] = s
            segs.append(s)
        seg_lens = np.array([len(s) for s in segs], dtype=np.int64)
        idx = np.asarray(enc.indices, dtype=np.int64)
        # per-doc token lists: concatenate each word occurrence's
        # segmentation in order — ragged gather out of the DISTINCT
        # segment pool (repeat/cumsum index arithmetic, no per-word
        # Python past the distinct encode above)
        per_word = seg_lens[idx]
        doc_of_word = np.repeat(np.arange(len(n_words), dtype=np.int64),
                                n_words)
        n_tok = np.zeros(len(n_words), dtype=np.int64)
        np.add.at(n_tok, doc_of_word, per_word)
        seg_flat = np.array([s for seg in segs for s in seg], dtype=object)
        dstart = np.zeros(len(segs) + 1, dtype=np.int64)
        np.cumsum(seg_lens, out=dstart[1:])
        total = int(per_word.sum())
        starts = np.zeros(len(idx) + 1, dtype=np.int64)
        np.cumsum(per_word, out=starts[1:])
        within = np.arange(total, dtype=np.int64) - np.repeat(starts[:-1],
                                                              per_word)
        gather = np.repeat(dstart[idx], per_word) + within
        all_syms = seg_flat[gather] if total else seg_flat[:0]
        doc_offs = np.zeros(len(n_words) + 1, dtype=np.int64)
        np.cumsum(n_tok, out=doc_offs[1:])
        toks = pa.ListArray.from_arrays(
            pa.array(doc_offs, type=pa.int32()),
            pa.array(all_syms, type=pa.string()))
        return batch.append_column("bpe_tokens", toks).append_column(
            "n_bpe_tokens", pa.array(n_tok, type=pa.int64()))


def bpe_apply(ds, merges, column: str = "text",
              concurrency=(1, 8), batch_size: int = 4096):
    """Tokenize every document with learned merges — actor pool so the
    merge list and the distinct-word cache live once per worker."""
    return ds.map_batches(BpeEncoder, fn_constructor_args=(merges, column),
                          concurrency=concurrency, batch_size=batch_size,
                          batch_format="pyarrow")
