"""Dedup operators: planted duplicates must be found; exact dedup
matches a pandas brute force."""

import numpy as np
import pandas as pd
import pyarrow as pa

from versatiles_rs_ray.stages import dedup


def _planted_ds(ray_session):
    """60 docs: 3 exact-dup groups, 2 near-dup pairs, rest unique."""
    import ray.data as rd

    rng = np.random.default_rng(5)
    words = [f"w{i}" for i in range(200)]
    texts, ids = [], []
    for i in range(50):
        texts.append(" ".join(rng.choice(words, size=30)))
        ids.append(i)
    # exact duplicates of docs 0, 1, 2
    for j, src in enumerate([0, 1, 2]):
        texts.append(texts[src])
        ids.append(50 + j)
    # near duplicates of docs 3, 4 (one word changed)
    for j, src in enumerate([3, 4]):
        toks = texts[src].split()
        toks[5] = "CHANGED"
        texts.append(" ".join(toks))
        ids.append(53 + j)
    t = pa.table(
        {
            "doc_num": pa.array(ids, type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    return rd.from_arrow(t), texts, ids


def test_dedup_exact(ray_session):
    ds, texts, ids = _planted_ds(ray_session)
    got = dedup.dedup_exact(ds).to_pandas()
    assert len(got) == 52  # 55 docs - 3 exact duplicates (near-dups differ)
    # brute force
    df = pd.DataFrame({"doc_num": ids, "text": texts})
    brute = df.groupby("text").agg(keep_doc=("doc_num", "min"), n=("doc_num", "size"))
    assert len(got) == len(brute)
    assert sorted(got["keep_doc"]) == sorted(brute["keep_doc"])
    assert got["n_dupes"].sum() == len(df)


def test_minhash_finds_planted_dups(ray_session):
    ds, texts, ids = _planted_ds(ray_session)
    import ray

    texts_map = dict(zip(ids, texts))
    cand = dedup.minhash_candidates(ds, k=5, num_perm=64, bands=16)
    ref = ray.put(texts_map)
    verified = cand.map_batches(
        dedup.JaccardVerify,
        batch_format="pyarrow",
        fn_constructor_kwargs={"texts_ref": ref, "threshold": 0.5},
        concurrency=1,
    ).to_pandas()
    pairs = set(map(tuple, verified[["doc_a", "doc_b"]].values))
    assert {(0, 50), (1, 51), (2, 52)} <= pairs  # exact dups always survive
    assert {(3, 53), (4, 54)} <= pairs  # near dups (1 word / 30 changed)
    # no false positives below threshold
    assert (verified["jaccard"] >= 0.5).all()


def test_simhash_finds_exact_dups(ray_session):
    ds, texts, ids = _planted_ds(ray_session)
    got = dedup.simhash_candidates(ds, max_hamming=3).to_pandas()
    pairs = set(map(tuple, got[["doc_a", "doc_b"]].values))
    assert {(0, 50), (1, 51), (2, 52)} <= pairs
    assert (got["hamming"] <= 3).all()


def _brute_jaccard_pairs(texts: dict, k: int, threshold: float):
    """Reference implementation: python sets of byte k-grams."""
    def grams(t):
        b = t.encode()
        if len(b) < k:
            return {b}
        return {b[i : i + k] for i in range(len(b) - k + 1)}

    sets = {d: grams(t) for d, t in texts.items()}
    out = {}
    docs = sorted(sets)
    for i, a in enumerate(docs):
        for b in docs[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            j = inter / len(sets[a] | sets[b])
            if j >= threshold:
                out[(a, b)] = (inter, j)
    return out


def test_ngram_jaccard_vs_bruteforce(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "omega", "tile"]
    texts = {}
    base = " ".join(rng.choice(words, 40))
    for d in range(30):
        if d % 3 == 0:
            # near-dup of base: flip a couple of words
            w = base.split()
            w[d % len(w)] = "mut%d" % d
            texts[d] = " ".join(w)
        else:
            texts[d] = " ".join(rng.choice(words, 30))
    texts[100] = "short"      # < k
    texts[101] = "short"      # identical short doc -> jaccard 1.0
    texts[102] = ""           # empty

    t = pa.table(
        {
            "doc_num": pa.array(sorted(texts), type=pa.int64()),
            "text": pa.array([texts[d] for d in sorted(texts)], type=pa.string()),
        }
    )
    ds = rd.from_arrow(t)
    got = dedup.ngram_jaccard_pairs(ds, k=8, threshold=0.3, num_buckets=4).to_pandas()
    got_pairs = {
        (int(r.doc_a), int(r.doc_b)): (int(r.inter), float(r.jaccard))
        for r in got.itertuples()
    }
    want = _brute_jaccard_pairs(texts, 8, 0.3)
    assert got_pairs.keys() == want.keys()
    for p, (inter, j) in want.items():
        gi, gj = got_pairs[p]
        assert gi == inter, p
        assert abs(gj - j) < 1e-12, p
    assert (100, 101) in want  # identical short docs found


def test_propagate_labels_exchange_matches_driver_unionfind(ray_session):
    import ray.data as rd

    # chains + a clique + singleton pair: chains force multiple rounds
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5),        # path -> component min 1
             (10, 11), (11, 12),                    # path -> 10
             (20, 21), (20, 22), (21, 22),          # clique -> 20
             (30, 31)]
    df = pd.DataFrame({"doc_a": [a for a, _ in pairs], "doc_b": [b for _, b in pairs]})
    want = dedup.dup_groups_driver(df).sort_values("doc_num").reset_index(drop=True)

    ds = rd.from_pandas(df)
    got = (
        dedup.propagate_min_labels_exchange(ds, num_partitions=4)
        .to_pandas()
        .sort_values("doc_num")
        .reset_index(drop=True)
    )
    assert got[["doc_num", "group_id"]].equals(want[["doc_num", "group_id"]])

    # and agrees with the broadcast-map implementation
    got2 = (
        dedup.propagate_min_labels(rd.from_pandas(df))
        .to_pandas()
        .sort_values("doc_num")
        .reset_index(drop=True)
    )
    assert got[["doc_num", "group_id"]].equals(got2[["doc_num", "group_id"]])


def test_propagate_labels_exchange_long_chain(ray_session):
    import ray.data as rd

    # a 15-hop path: needs ~14 propagation rounds — exercises the
    # run-to-convergence loop (a fixed 10-round cap returned wrong
    # labels for exactly this shape)
    pairs = [(i, i + 1) for i in range(100, 115)]
    df = pd.DataFrame({"doc_a": [a for a, _ in pairs], "doc_b": [b for _, b in pairs]})
    got = (
        dedup.propagate_min_labels_exchange(rd.from_pandas(df), num_partitions=4)
        .to_pandas()
        .sort_values("doc_num")
        .reset_index(drop=True)
    )
    assert (got["group_id"] == 100).all() and len(got) == 16

    # safety cap raises instead of silently returning unconverged labels
    import pytest

    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.propagate_min_labels_exchange(
            rd.from_pandas(df), max_rounds=3, num_partitions=4
        )
