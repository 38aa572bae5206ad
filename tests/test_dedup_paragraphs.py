"""CCNet paragraph-level dedup (stages/dedup.dedup_paragraphs):
scalar-reference equality, keep-first ordering, fully-duplicate-doc
removal, partition invariance, edge cases."""

import numpy as np
import pyarrow as pa
import pytest

from versatiles_rs_ray.stages.dedup import dedup_paragraphs

DOCS = [
    (1, "alpha\nbeta\ngamma"),
    (2, "beta\ndelta"),            # beta already seen in doc 1
    (3, "alpha\nbeta\ngamma"),     # fully duplicate -> removed
    (4, "delta\nalpha\nepsilon"),  # keeps only epsilon
    (5, ""),                       # the empty paragraph, first seen here
    (6, ""),                       # ... and removed here
    (7, "zeta"),
]


def _ds(docs):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
        "text": pa.array([t for _, t in docs], type=pa.string()),
    }))


def _ref(docs):
    seen, out = set(), {}
    for did, text in sorted(docs):
        kept, n_par = [], 0
        for par in text.split("\n"):
            n_par += 1
            if par not in seen:
                seen.add(par)
                kept.append(par)
        if kept:
            out[did] = ("\n".join(kept), len(kept), n_par)
    return out


def _run(docs, ray_session, parts=None):
    ds = _ds(docs)
    if parts:
        ds = ds.repartition(parts)
    df = dedup_paragraphs(ds).to_pandas().set_index("doc_id")
    return {d: (r["text"], int(r["n_kept"]), int(r["n_par"]))
            for d, r in df.iterrows()}


def test_matches_scalar_reference(ray_session):
    got = _run(DOCS, ray_session)
    want = _ref(DOCS)
    assert got == want
    assert 3 not in got and 6 not in got  # fully-duplicate docs drop
    assert got[4] == ("epsilon", 1, 3)
    assert got[5] == ("", 1, 1)  # first empty paragraph survives


def test_partition_invariance(ray_session):
    assert _run(DOCS, ray_session, parts=5) == _run(DOCS, ray_session)


def test_keep_first_is_global_doc_order(ray_session):
    # same paragraph in docs 10 and 2: doc 2 wins regardless of input order
    docs = [(10, "x\ny"), (2, "x\nz")]
    got = _run(docs, ray_session)
    assert got[2] == ("x\nz", 2, 2)
    assert got[10] == ("y", 1, 2)


def test_within_doc_repeats_collapse(ray_session):
    got = _run([(1, "a\na\nb\na")], ray_session)
    assert got[1] == ("a\nb", 2, 4)


def test_random_corpus_vs_reference(ray_session):
    rng = np.random.RandomState(7)
    vocab = ["p%d" % i for i in range(12)]
    docs = []
    for d in range(60):
        n = rng.randint(1, 6)
        docs.append((d, "\n".join(rng.choice(vocab, n))))
    assert _run(docs, ray_session, parts=4) == _ref(docs)
