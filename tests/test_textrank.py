"""TextRank (stages/textrank): exact integer PageRank equality vs a
scalar reference, partition invariance, self-loop exclusion, edges."""

from collections import defaultdict

import numpy as np
import pyarrow as pa
import pytest

from versatiles_rs_ray.stages.textrank import textrank

DOCS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "cats and dogs and cats",
    "engines convert heat into motion",
    "the cat and the dog and the engines",
    "",
]


def _ref(docs, window, min_count, iters):
    pairs = defaultdict(int)
    for d in docs:
        toks = d.split()
        for i in range(len(toks)):
            for j in range(i + 1, min(i + window + 1, len(toks))):
                a, b = sorted((toks[i], toks[j]))
                pairs[(a, b)] += 1
    edges = defaultdict(list)
    for (a, b), w in pairs.items():
        if w >= min_count and a != b:
            edges[a].append((b, w))
            edges[b].append((a, w))
    wdeg = {u: sum(w for _, w in es) for u, es in edges.items()}
    r = {u: 1_000_000 for u in edges}
    for _ in range(iters):
        nr = {v: 150_000 for v in edges}
        for u, es in edges.items():
            for dst, w in es:
                nr[dst] += (r[u] * w * 17) // (wdeg[u] * 20)
        r = nr
    return r


def _ds(docs, parts=None):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"text": pa.array(docs, type=pa.string())}))
    return ds.repartition(parts) if parts else ds


@pytest.mark.parametrize("window,min_count,iters",
                         [(2, 1, 3), (3, 2, 4), (1, 1, 1)])
def test_matches_scalar_reference(ray_session, window, min_count, iters):
    got = textrank(_ds(DOCS), window=window, min_count=min_count,
                   iters=iters, topn=1000)
    want = _ref(DOCS, window, min_count, iters)
    want_top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
    assert list(zip(got["token"].to_pylist(),
                    got["rank_micro"].to_pylist())) == want_top


def test_partition_invariance(ray_session):
    a = textrank(_ds(DOCS), window=2, iters=3, topn=50)
    b = textrank(_ds(DOCS, parts=5), window=2, iters=3, topn=50,
                 num_partitions=7)
    assert a.equals(b)


def test_self_loops_excluded(ray_session):
    # "x x x": only self-pairs -> no edges -> empty result
    got = textrank(_ds(["x x x"]), window=2, iters=2, topn=10)
    assert got.num_rows == 0


def test_hub_ranks_highest(ray_session):
    # star graph: hub co-occurs with every leaf
    docs = [f"hub leaf{i}" for i in range(8)]
    got = textrank(_ds(docs), window=1, iters=4, topn=3)
    assert got["token"][0].as_py() == "hub"


def test_validation(ray_session):
    with pytest.raises(ValueError):
        textrank(_ds(DOCS), iters=0)
    with pytest.raises(ValueError):
        textrank(_ds(DOCS), topn=0)
    with pytest.raises(ValueError):
        textrank(_ds(DOCS), window=0)
