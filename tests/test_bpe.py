"""BPE training/encoding (stages/bpe): merge-sequence equality vs an
independent classic reference learner, tie-break determinism, early
stop, min_word_count pruning, encoder==training segmentation, and the
ragged assembly of bpe_apply."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from versatiles_rs_ray.stages.bpe import (END, SEP, bpe_apply, bpe_train,
                                          _encode_word, _greedy_select)

CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider new new new",
    "lowest newest lowest",
]


def _ds(docs):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "text": pa.array(docs, type=pa.string()),
    }))


def _ref_apply(syms, left, right):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def ref_bpe(docs, num_merges, min_word_count=1):
    wc = Counter(w for d in docs for w in d.split())
    words = {tuple(list(w) + [END]): c for w, c in wc.items()
             if c >= min_word_count}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        best = min(pairs.items(),
                   key=lambda kv: (-kv[1], kv[0][0] + SEP + kv[0][1]),
                   default=None)
        if best is None or best[1] < 2:
            break
        (left, right), cnt = best
        merges.append((left, right, cnt))
        nw = {}
        for syms, c in words.items():
            ns = _ref_apply(syms, left, right)
            nw[ns] = nw.get(ns, 0) + c
        words = nw
    return merges, words


def test_merge_sequence_matches_reference(ray_session):
    merges, table = bpe_train(_ds(CORPUS), num_merges=15, num_partitions=4)
    want, ref_words = ref_bpe(CORPUS, 15)
    assert merges == want
    # final word table segmentation matches the reference state
    got = table.to_pandas()
    got_words = {tuple(s): int(c) for s, c in zip(got["syms"], got["cnt"])}
    assert got_words == dict(ref_words)


def test_min_word_count(ray_session):
    merges, _ = bpe_train(_ds(CORPUS), num_merges=8, min_word_count=3,
                          num_partitions=4)
    want, _ = ref_bpe(CORPUS, 8, min_word_count=3)
    assert merges == want


def test_early_stop_no_repeating_pairs(ray_session):
    # every word unique and share no repeated pair twice -> learns only
    # pairs with corpus count >= 2, stops before num_merges
    docs = ["ab cd", "ef gh"]
    merges, _ = bpe_train(_ds(docs), num_merges=50, num_partitions=4)
    want, _ = ref_bpe(docs, 50)
    assert merges == want
    assert len(merges) < 50


def test_encoder_matches_training_segmentation(ray_session):
    merges, table = bpe_train(_ds(CORPUS), num_merges=12, num_partitions=4)
    seg = {"".join(s).replace(END, ""): list(s)
           for s in table.to_pandas()["syms"]}
    for w, s in seg.items():
        assert _encode_word(w, [(l, r) for l, r, _ in merges]) == s


def test_bpe_apply_structure(ray_session):
    merges, _ = bpe_train(_ds(CORPUS), num_merges=10, num_partitions=4)
    out = bpe_apply(_ds(CORPUS), merges).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert list(out.columns[-2:]) == ["bpe_tokens", "n_bpe_tokens"]
    for doc, toks, n in zip(CORPUS, out["bpe_tokens"], out["n_bpe_tokens"]):
        assert len(toks) == n
        # concatenating tokens and stripping END reconstructs the words
        joined = "".join(toks).split(END)
        assert [w for w in joined if w] == doc.split()


def test_unseen_word_encodes_consistently(ray_session):
    merges, _ = bpe_train(_ds(CORPUS), num_merges=12, num_partitions=4)
    ranked = [(l, r) for l, r, _ in merges]
    s = _encode_word("lownew", ranked)
    assert "".join(s) == "lownew" + END
    # applying the merges one-by-one to the raw chars agrees
    cur = tuple(list("lownew") + [END])
    for l, r in ranked:
        cur = _ref_apply(cur, l, r)
    assert list(cur) == s


def test_greedy_select_overlaps():
    assert _greedy_select(np.array([], dtype=np.int64)).tolist() == []
    assert _greedy_select(np.array([0, 1, 2, 3])).tolist() == [0, 2]
    assert _greedy_select(np.array([0, 1, 2])).tolist() == [0, 2]
    assert _greedy_select(np.array([0, 2, 4])).tolist() == [0, 2, 4]
    assert _greedy_select(np.array([3, 4, 7, 8, 9, 11])).tolist() == [3, 7, 9, 11]


def test_validation(ray_session):
    with pytest.raises(ValueError, match="num_merges"):
        bpe_train(_ds(CORPUS), num_merges=0)


def test_partial_pair_survival(ray_session):
    """Regression for the incremental learner's delta update: in
    'xabxa' merging (a,b), pair (x,a) survives with REDUCED count
    (2 -> 1) — present in both the old and new word with different
    multiplicity. A naive subtract-then-add double-counts it and
    derails every later merge choice."""
    docs = ["xabxa xabxa ab ab ab"]
    merges, _ = bpe_train(_ds(docs), num_merges=8, num_partitions=2)
    want, _ = ref_bpe(docs, 8)
    assert merges == want


def test_long_random_corpus_matches_reference(ray_session):
    """Deeper merge sequence over a skewed random corpus — exercises
    heap lazy-deletion, pair deaths, and word collapse."""
    rng = np.random.default_rng(42)
    vocab = ["".join(rng.choice(list("abcxy"),
                                size=rng.integers(2, 8)))
             for _ in range(60)]
    docs = [" ".join(rng.choice(vocab, size=30,
                                p=np.arange(60, 0, -1) / np.arange(
                                    60, 0, -1).sum()))
            for _ in range(25)]
    merges, table = bpe_train(_ds(docs), num_merges=60,
                              num_partitions=4)
    want, ref_words = ref_bpe(docs, 60)
    assert merges == want
    got = table.to_pandas()
    got_words = {tuple(s): int(c)
                 for s, c in zip(got["syms"], got["cnt"])}
    assert got_words == dict(ref_words)
