"""End-to-end corpus curation pipeline (pipelines/curate.py)."""

import numpy as np
import pyarrow as pa
import pytest

from versatiles_rs_ray.pipelines.curate import (_SPLIT_SALT, _salted_id,
                                                 curate_corpus)
from versatiles_rs_ray.stages.curate import (_SAMPLE_MOD, _SAMPLE_MULT,
                                             split_cuts)


GOOD = ("the quick brown fox jumps over the lazy dog and runs to town fast "
        "while the sun sets slowly over the quiet hills in the far west")


def _corpus():
    rows = [
        (10, GOOD, "en"),                      # survives
        (11, GOOD, "en"),                      # exact dup of 10 -> dropped
        (12, "one two", "en"),                 # bucket 0 -> dropped
        (13, "spam " * 40, "en"),              # repetitive -> dropped
        (14, GOOD + " extra tail words here", "en"),   # near-dup of 10
        (15, "ein ganz anderer deutscher text mit vielen verschiedenen "
             "woertern der die qualitaet pruefung besteht weil er lang "
             "genug ist und normale satzstruktur hat oder zumindest fast",
         "de"),
        (16, "completely unrelated english prose about distributed "
             "stream processing engines that shuffle blocks between "
             "worker nodes with backpressure and spill to disk", "en"),
    ]
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
        "lang": pa.array([r[2] for r in rows], type=pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], type=pa.int64()),
    })


def test_curate_quality_and_dedup(ray_session):
    import ray.data as rd

    out = curate_corpus(rd.from_arrow(_corpus())).to_pandas()
    # 11 exact-dups 10; 12 fails quality; 13 repetitive; near-dup off
    assert sorted(out["doc_id"]) == [10, 14, 15, 16]
    assert set(out.columns) == {"doc_id", "text", "lang", "n_chars"}


def test_curate_near_dup_and_mix(ray_session):
    import ray.data as rd

    out = curate_corpus(
        rd.from_arrow(_corpus()), near_dup_threshold=0.5, ngram_k=5,
        lang_fracs={"de": 0.0}, default_frac=1.0,
    ).to_pandas()
    # 14 is a 5-gram near-dup of 10 (smaller id survives); de mixed out
    assert sorted(out["doc_id"]) == [10, 16]


def test_curate_split_and_pack(ray_session):
    import ray.data as rd

    fr = {"train": 0.5, "val": 0.5}
    out = curate_corpus(
        rd.from_arrow(_corpus()), split_fracs=fr, pack_budget=220,
    ).to_pandas()
    assert sorted(out["doc_id"]) == [10, 14, 15, 16]
    # split assignment reproduces the documented rule: Knuth hash of
    # the SALTED id (decorrelated from the stratified-mix hash)
    cuts = split_cuts(fr)
    for _, row in out.iterrows():
        sid = int(_salted_id(np.array([row["doc_id"]], dtype=np.int64),
                             _SPLIT_SALT)[0])
        b = (sid * _SAMPLE_MULT) % _SAMPLE_MOD
        want = "train" if b < cuts[0] else "val"
        assert row["split"] == want
    # sequences never straddle a split and never exceed the budget
    for (_s, _q), grp in out.groupby(["split", "seq_id"]):
        assert grp["n_chars"].sum() <= 220 or len(grp) == 1
    # packing follows shuffle_rank order inside each split
    for _s, grp in out.groupby("split"):
        g = grp.sort_values("shuffle_rank")
        assert list(g["seq_id"]) == sorted(g["seq_id"])


def test_curate_stages_disabled_is_passthrough_plus_dedup(ray_session):
    import ray.data as rd

    out = curate_corpus(rd.from_arrow(_corpus()), min_quality=0,
                        drop_repetitive=False).to_pandas()
    # only exact dedup applies
    assert sorted(out["doc_id"]) == [10, 12, 13, 14, 15, 16]


def test_curate_mix_and_split_decorrelated(ray_session):
    """The round-4 review bug: mix-keep and split assignment hashed the
    SAME Knuth bucket, so a 0.5 stratum landed 100% in a 0.9 train
    split. With salted stage hashes every split must see mixed docs."""
    import ray.data as rd

    n = 400
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array([f"{GOOD} variant {i}" for i in range(n)]),
        "lang": pa.array(["en"] * n),
        "n_chars": pa.array([len(GOOD) + 10] * n, type=np.int64()
                            if False else pa.int64()),
    })
    out = curate_corpus(
        rd.from_arrow(tbl), lang_fracs={"en": 0.5},
        split_fracs={"train": 0.8, "val": 0.2},
    ).to_pandas()
    counts = out["split"].value_counts()
    assert counts.get("val", 0) > 0 and counts.get("train", 0) > 0
    # val share within loose binomial bounds of 0.2
    share = counts.get("val", 0) / len(out)
    assert 0.08 <= share <= 0.35


def test_curate_ppl_gate(ray_session):
    import ray.data as rd

    from versatiles_rs_ray.stages.lm import lm_score

    # repeat the survivors so the bigram LM has mass; add one gibberish
    # doc whose tokens are all unique -> worst mean NLL in the corpus
    rows = [(i, GOOD, "en") for i in range(20)]
    rows += [(100 + i, GOOD.replace("fox", f"cat{i}"), "en")
             for i in range(5)]
    rows.append((999, "zq wxv kjq ptm brz ylw nqd fgh vbn mkl "
                      "qwe rty uio asd fgh jkl zxc vbn mno pqr", "en"))
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
        "lang": pa.array([r[2] for r in rows], type=pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], type=pa.int64()),
    })

    # ground truth: curate runs the gate AFTER quality+exact dedup, so
    # score exactly that intermediate corpus and cut at the threshold
    base = curate_corpus(rd.from_arrow(tbl)).to_pandas()
    scores = lm_score(
        rd.from_arrow(tbl.filter(pa.array(
            [i in set(base["doc_id"]) for i in tbl["doc_id"].to_pylist()]))),
        n=2, min_count=2).to_pandas()
    thr = 3_000_000  # 3 nats/token
    want = sorted(scores[scores["nll_micro"] <= thr * scores["n_tok"]]
                  ["doc_id"])
    got = curate_corpus(rd.from_arrow(tbl), max_ppl_micro=thr).to_pandas()
    assert sorted(got["doc_id"]) == want
    # the gibberish doc is the one the gate exists for
    assert 999 not in set(got["doc_id"])
    # a permissive threshold keeps everything the base chain keeps
    loose = curate_corpus(rd.from_arrow(tbl),
                          max_ppl_micro=50_000_000).to_pandas()
    assert sorted(loose["doc_id"]) == sorted(base["doc_id"])

    # percentile form: keep the best p fraction by mean NLL/token —
    # threshold derived by exact radix selection over the ratio, so
    # the kept set equals the manual quantile_disc cut on the same
    # intermediate scores
    import math

    ratios = (scores["nll_micro"].astype(float)
              / scores["n_tok"]).sort_values().to_numpy()
    p = 0.8
    thr_r = ratios[max(math.ceil(p * len(ratios)) - 1, 0)]
    want_p = sorted(scores[(scores["nll_micro"].astype(float)
                            / scores["n_tok"]) <= thr_r]["doc_id"])
    got_p = curate_corpus(rd.from_arrow(tbl),
                          ppl_percentile=p).to_pandas()
    assert sorted(got_p["doc_id"]) == want_p
    assert 999 not in set(got_p["doc_id"])
    # the two cut forms are mutually exclusive, and p is validated
    import pytest as _pt

    with _pt.raises(ValueError):
        curate_corpus(rd.from_arrow(tbl), max_ppl_micro=1,
                      ppl_percentile=0.5)
    with _pt.raises(ValueError):
        curate_corpus(rd.from_arrow(tbl), ppl_percentile=1.5)


def test_ppl_percentile_empty_scores_noop(ray_session):
    """Whitespace-only corpus: lm_score yields zero scored docs; the
    percentile gate must degrade to a no-op like --max-ppl does."""
    import pyarrow as pa
    import ray.data as rd

    from versatiles_rs_ray.pipelines.curate import curate_corpus

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array(["   ", ""], type=pa.string()),
        "lang": pa.array(["en", "en"], type=pa.string()),
        "n_chars": pa.array([3, 0], type=pa.int64()),
    }))
    out = curate_corpus(ds, min_quality=0, drop_repetitive=False,
                        ppl_percentile=0.5)
    assert out.count() == 2


def test_zipf_corpus_generator(ray_session):
    """Deterministic zipf corpus: bit-identical re-generation, zipf
    source skew, bounded near-dup families, exact-dup mass."""
    import collections

    from versatiles_rs_ray.sources.docs import (load_zipf_shard,
                                                zipf_doc_specs)

    specs = zipf_doc_specs("/root/testdata/sf0.001", 20_000,
                           docs_per_task=10_000)
    assert len(specs) == 2
    a = load_zipf_shard(specs[0])
    assert a.equals(load_zipf_shard(specs[0]))  # deterministic
    assert a.schema.names == ["doc_id", "text", "lang", "source",
                              "n_chars"]
    b = load_zipf_shard(specs[1])
    ids = a["doc_id"].to_pylist() + b["doc_id"].to_pylist()
    assert sorted(ids) == list(range(20_000))
    texts = a["text"].to_pylist() + b["text"].to_pylist()
    # zipf head: the most common text covers >15% of docs; source
    # column inherits the skew
    cnt = collections.Counter(texts)
    assert cnt.most_common(1)[0][1] > 3_000
    src = collections.Counter(a["source"].to_pylist())
    assert src["src0"] > 2 * src["src1"] > 0
    # near-dup families: ~30% of docs carry the unique q-token and
    # group into families of ~4 by their template prefix
    fam_docs = [t for t in texts if t.rsplit(" ", 1)[-1][:1] == "q"
                and t.rsplit(" ", 1)[-1][1:].isdigit()]
    assert 0.25 < len(fam_docs) / len(texts) < 0.35
    fams = collections.Counter(t.rsplit(" ", 1)[0] for t in fam_docs)
    sizes = sorted(fams.values())
    assert sizes[-1] <= 20  # bounded clusters (mean ~4)


def test_curate_minhash_matches_ngram(ray_session):
    """The LSH scale path (minhash candidates + co-partitioned exact
    verify) must curate the same corpus as the exact ngram path on a
    bounded input (seeded LSH at j~0.9 with 8 bands of 8 rows has
    ~1e-4 miss probability; any miss would show as a row diff here)."""
    import ray.data as rd

    from versatiles_rs_ray.pipelines.curate import curate_corpus
    from versatiles_rs_ray.sources.docs import (load_zipf_shard,
                                                zipf_doc_specs)

    spec = zipf_doc_specs("/root/testdata/sf0.001", 5_000,
                          docs_per_task=5_000)[0]
    ds = rd.from_arrow(load_zipf_shard(spec))
    kw = dict(id_col="doc_id", min_quality=1, drop_repetitive=True,
              near_dup_threshold=0.8, ngram_k=5, pack_budget=2048)
    a = curate_corpus(ds, near_dup_method="ngram", **kw)
    b = curate_corpus(ds, near_dup_method="minhash", **kw)
    pa_, pb = a.to_pandas(), b.to_pandas()
    key = sorted(pa_.columns)
    pa_ = pa_[key].sort_values(key).reset_index(drop=True)
    pb = pb[key].sort_values(key).reset_index(drop=True)
    assert pa_.equals(pb)
    assert len(pa_) > 0


def test_curate_e2e_matches_oracle(ray_session):
    """The full-composition curate_e2e query (gate -> exact dedup ->
    ngram near-dup -> mix -> fmix64-salted shuffle -> pack) against
    its DuckDB oracle — the driver-gate comparison kept in-suite."""
    import sys

    import duckdb
    import pandas as pd

    sys.path.insert(0, "tools")
    from selfcheck import canon as _canon

    from versatiles_rs_ray import queries as Q

    sf = "/root/testdata/sf0.001"
    mine = Q.QUERIES["curate_e2e"](sf).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = con.execute(Q.ORACLES["curate_e2e"]).fetchdf()
    assert len(mine) == len(want) and len(mine) > 0
    pd.testing.assert_frame_equal(_canon(mine), _canon(want))
