"""Byte-pair-encoding tokenizer training and application — the
vocabulary-learning pass of LLM training-data prep (Sennrich et al.
2016, the classic word-frequency formulation GPT-2/SentencePiece BPE
descends from).

Why this is feasible at corpus scale: the CORPUS is read exactly once
(one word-count exchange); the merge loop then iterates over the
WORD-FREQUENCY TABLE, which is vocabulary-sized — millions of rows
where the corpus is trillions — and prunable with ``min_word_count``.
Each merge round is:

  map_batches over the word table (pair-count partials, weighted by
  word count, dictionary-encoded per block)
    -> ONE pair-hash exchange -> per-partition exact totals + LOCAL
       argmax (the global best pair lives wholly in one partition,
       so P candidate rows reach the driver — never the pair table)
    -> vectorized merge apply (Arrow flatten + numpy greedy
       left-to-right pair selection; no per-word Python)
    -> materialize() the new word table (vocabulary-sized — the one
       deliberate materialization, without it round k would re-run
       all k-1 previous merge maps).

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


def _words_to_syms(tbl: pa.Table) -> pa.Table:
    """(token, cnt) word rows -> (syms: list<string>, cnt) symbol rows.
    The per-word Python here runs ONCE over the vocabulary-sized word
    table (not the corpus) — the same bounded-loop contract as the
    distinct-word encode cache in :func:`bpe_apply`."""
    words = tbl["token"].to_pylist()
    syms = [list(w) + [END] for w in words]
    return pa.table({
        "syms": pa.array(syms, type=pa.list_(pa.string())),
        "cnt": tbl["cnt"],
    })


def _pair_counts(batch: pa.Table) -> pa.Table:
    """Per-block weighted adjacent-pair counts over symbol lists."""
    from .curate import _hash_strings

    empty = pa.table({"pair": pa.array([], type=pa.string()),
                      "cnt": pa.array([], type=pa.int64()),
                      "_route": pa.array([], type=pa.int64())})
    if batch.num_rows == 0:
        return empty
    import pyarrow.compute as pc

    syms = batch["syms"].combine_chunks()
    flat = pc.list_flatten(syms)
    lens = np.asarray(pc.list_value_length(syms), dtype=np.int64)
    offs = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    L = len(flat)
    if L < 2:
        return empty
    word = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    same = word[:-1] == word[1:]
    if not same.any():
        return empty
    pairs = pc.binary_join_element_wise(
        flat.slice(0, L - 1), flat.slice(1, L - 1), SEP)
    pairs = pairs.filter(pa.array(same)) if not same.all() else pairs
    w = np.asarray(batch["cnt"], dtype=np.int64)[word[:-1][same]]
    enc = pairs.combine_chunks().dictionary_encode() \
        if isinstance(pairs, pa.ChunkedArray) else pairs.dictionary_encode()
    tot = np.zeros(len(enc.dictionary), dtype=np.int64)
    np.add.at(tot, np.asarray(enc.indices, dtype=np.int64), w)
    t = pa.table({"pair": enc.dictionary,
                  "cnt": pa.array(tot, type=pa.int64())})
    return t.append_column(
        "_route", pa.array(_hash_strings(t["pair"]), type=pa.int64()))


def _pair_best(tbl: pa.Table) -> pa.Table:
    """Exact totals within the partition (partitions are disjoint by
    pair hash), then the LOCAL best pair (max cnt, ties to the
    smallest pair string) — one row out per partition."""
    empty = pa.table({"pair": pa.array([], type=pa.string()),
                      "cnt": pa.array([], type=pa.int64())})
    if tbl.num_rows == 0:
        return empty
    enc = tbl["pair"].combine_chunks().dictionary_encode()
    tot = np.zeros(len(enc.dictionary), dtype=np.int64)
    np.add.at(tot, np.asarray(enc.indices, dtype=np.int64),
              np.asarray(tbl["cnt"], dtype=np.int64))
    pairs = enc.dictionary.to_numpy(zero_copy_only=False)
    best = np.lexsort((pairs, -tot))[0]
    return pa.table({"pair": pa.array([pairs[best]], type=pa.string()),
                     "cnt": pa.array([tot[best]], type=pa.int64())})


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


def _apply_merge(batch: pa.Table, left: str, right: str) -> pa.Table:
    """Vectorized one-merge apply over symbol lists: flatten, find
    adjacent (left, right) within words, greedy-select, concat-replace
    the left symbol, drop the right, rebuild offsets."""
    import pyarrow.compute as pc

    if batch.num_rows == 0:
        return batch
    syms = batch["syms"].combine_chunks()
    flat = pc.list_flatten(syms)
    lens = np.asarray(pc.list_value_length(syms), dtype=np.int64)
    L = len(flat)
    if L < 2:
        return batch
    word = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    is_l = np.asarray(pc.equal(flat, left))
    is_r = np.asarray(pc.equal(flat, right))
    cand = np.flatnonzero(is_l[:-1] & is_r[1:] & (word[:-1] == word[1:]))
    sel = _greedy_select(cand)
    if len(sel) == 0:
        return batch
    repl = np.zeros(L, dtype=bool)
    repl[sel] = True
    drop = np.zeros(L, dtype=bool)
    drop[sel + 1] = True
    new_flat = pc.if_else(pa.array(repl), pa.scalar(left + right), flat)
    new_flat = new_flat.filter(pa.array(~drop))
    merged_per_word = np.zeros(len(lens), dtype=np.int64)
    np.add.at(merged_per_word, word[sel], 1)
    new_lens = lens - merged_per_word
    new_offs = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(new_lens, out=new_offs[1:])
    out = pa.ListArray.from_arrays(pa.array(new_offs, type=pa.int32()),
                                   new_flat)
    return pa.table({"syms": out, "cnt": batch["cnt"]})


def bpe_train(ds, num_merges: int, column: str = "text",
              min_word_count: int = 1, num_partitions: int = 32):
    """Learn ``num_merges`` BPE merges from the corpus. Returns
    (merges, word_table): ``merges`` is the ordered list of
    (left, right, pair_count) driving :func:`bpe_apply`; ``word_table``
    the final segmented (syms, cnt) Dataset (inspection/vocab export).

    Stops early when no pair occurs twice (merging singleton pairs
    would memorize the corpus tail in arbitrary hash order)."""
    from .exchange import hash_exchange
    from .text import token_counts

    if num_merges < 1:
        raise ValueError(f"bpe_train: num_merges must be >= 1, got {num_merges}")
    words = token_counts(ds, column=column, num_partitions=num_partitions)
    if min_word_count > 1:
        import pyarrow.compute as pc

        words = words.map_batches(
            functools.partial(_floor_cnt, mc=min_word_count),
            batch_format="pyarrow")
    table = words.map_batches(_words_to_syms,
                              batch_format="pyarrow").materialize()
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        parts = table.map_batches(_pair_counts, batch_format="pyarrow")
        cand = hash_exchange(parts, "_route", _pair_best,
                             num_partitions=num_partitions).to_pandas()
        cand = cand[cand["cnt"] >= 2]
        if cand.empty:
            break
        cand = cand.sort_values(["cnt", "pair"], ascending=[False, True],
                                kind="mergesort")
        pair, cnt = cand.iloc[0]["pair"], int(cand.iloc[0]["cnt"])
        left, right = pair.split(SEP)
        merges.append((left, right, cnt))
        table = table.map_batches(
            functools.partial(_apply_merge, left=left, right=right),
            batch_format="pyarrow").materialize()
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
