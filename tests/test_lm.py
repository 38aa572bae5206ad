"""N-gram LM scoring (stages/lm): stupid-backoff semantics vs a
brute-force reference, exchange vs broadcast plan equality, count-table
pruning, foreign-model OOV floor, and validation gates."""

import math
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from versatiles_rs_ray.stages.lm import lm_score, ngram_counts

DOCS = [
    "the cat sat on the mat",
    "the cat sat on the hat",
    "the dog ran over the hill and far away",
    "cat cat cat cat",
    "one two three four five six",
    "the the the",
    "",
    "   ",
    "singleton tokens everywhere here",
]


def _ds(docs):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "text": pa.array(docs, type=pa.string()),
    }))


def brute_lm(docs, n, alpha, min_count, model_docs=None):
    """Independent per-token stupid backoff with the same float ops
    (log((mult*c)/x)) and micro-nat quantization as the engine."""
    model = docs if model_docs is None else model_docs
    counts = {}
    for m in range(1, n + 1):
        c = Counter()
        for d in model:
            t = d.split()
            for i in range(len(t) - m + 1):
                c[" ".join(t[i:i + m])] += 1
        if m >= 2:
            c = Counter({g: v for g, v in c.items() if v >= min_count})
        counts[m] = c
    total = float(sum(len(d.split()) for d in model))
    rows = []
    for doc_id, d in enumerate(docs):
        t = d.split()
        if not t:
            continue
        nll = 0
        for i in range(len(t)):
            mult = 1.0
            lp = None
            for m in range(n, 1, -1):
                if i >= m - 1:
                    g = " ".join(t[i - m + 1:i + 1])
                    c = counts[m].get(g, 0)
                    if c > 0:
                        x = counts[m - 1][" ".join(t[i - m + 1:i])]
                        lp = math.log((mult * c) / x)
                        break
                    mult *= alpha
            if lp is None:
                c1 = max(counts[1].get(t[i], 0), 1)
                lp = math.log((mult * c1) / total)
            nll -= int(math.floor(lp * 1e6 + 0.5))
        rows.append((doc_id, len(t), nll))
    return pd.DataFrame(rows, columns=["doc_id", "n_tok", "nll_micro"])


def _run(docs, model_docs=None, **kw):
    model = None if model_docs is None else _ds(model_docs)
    df = lm_score(_ds(docs), model_ds=model, num_partitions=4,
                  **kw).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


@pytest.mark.parametrize("n,alpha,mc", [(2, 0.4, 2), (3, 0.4, 2),
                                        (2, 0.5, 1), (3, 0.25, 3)])
def test_brute_force_equality(ray_session, n, alpha, mc):
    got = _run(DOCS, n=n, alpha=alpha, min_count=mc)
    want = brute_lm(DOCS, n, alpha, mc)
    pd.testing.assert_frame_equal(got, want.astype("int64"),
                                  check_dtype=False)


def test_broadcast_plan_matches_exchange(ray_session):
    a = _run(DOCS, n=3, alpha=0.4, min_count=2)
    b = _run(DOCS, n=3, alpha=0.4, min_count=2, broadcast=True)
    pd.testing.assert_frame_equal(a, b)


def test_foreign_model_and_oov_floor(ray_session):
    model = ["the cat sat", "the cat ran"]
    docs = ["the cat sat", "zzz qqq unseen"]
    got = _run(docs, model_docs=model, n=2, alpha=0.4, min_count=1)
    want = brute_lm(docs, 2, 0.4, 1, model_docs=model)
    pd.testing.assert_frame_equal(got, want.astype("int64"),
                                  check_dtype=False)
    # OOV doc must score strictly worse (higher mean NLL) than in-model
    got = got.set_index("doc_id")
    assert (got.loc[1, "nll_micro"] / got.loc[1, "n_tok"]
            > got.loc[0, "nll_micro"] / got.loc[0, "n_tok"])


def test_self_scoring_never_backs_off_without_pruning(ray_session):
    # min_count=1: every bigram of the corpus is in the table, so the
    # stupid-backoff alpha never fires and scores are pure c(g2)/c(ctx)
    got = _run(DOCS, n=2, alpha=0.123, min_count=1)
    other = _run(DOCS, n=2, alpha=0.987, min_count=1)
    pd.testing.assert_frame_equal(got, other)


def test_empty_corpus(ray_session):
    out = lm_score(_ds(["", "   "]), n=2, num_partitions=4)
    assert out.count() == 0
    # Ray's to_pandas drops columns at 0 rows; assert on the schema
    assert sorted(out.schema().names) == ["doc_id", "n_tok", "nll_micro"]


def test_ngram_counts_floor(ray_session):
    t = ngram_counts(_ds(DOCS), 2, min_count=2, num_partitions=4).to_pandas()
    assert (t["cnt"] >= 2).all()
    assert "the cat" in set(t["token"])  # appears twice
    raw = ngram_counts(_ds(DOCS), 2, min_count=1, num_partitions=4).to_pandas()
    assert len(raw) > len(t)
    # floor keeps exactly the >= 2 subset
    keep = raw[raw["cnt"] >= 2].sort_values("token").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        t.sort_values("token").reset_index(drop=True), keep)


def test_validation(ray_session):
    with pytest.raises(ValueError, match="n must be >= 2"):
        lm_score(_ds(DOCS), n=1)
    with pytest.raises(ValueError, match="alpha"):
        lm_score(_ds(DOCS), alpha=0.0)
    with pytest.raises(ValueError, match="n must be >= 1"):
        ngram_counts(_ds(DOCS), 0)


def test_tiny_block_below_order(ray_session):
    # a block whose TOTAL token count is below the order used to crash
    # (_lm_position_rows sliced an empty gram array then take()-ed it)
    out = lm_score(_ds(["hello"]), n=3, num_partitions=2).to_pandas()
    assert len(out) == 1 and int(out["n_tok"][0]) == 1
    # unigram backoff still scores the lone token: c(w)/total = 1/1
    assert int(out["nll_micro"][0]) == 0
