"""DSIR importance resampling (stages/dsir): brute-force weight
equality, Gumbel-top-k selection semantics, partition invariance,
DuckDB oracle parity on the real corpus, edge cases."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from versatiles_rs_ray.stages.dsir import (bucket_counts, dsir_select,
                                           dsir_weights, gumbel_micro,
                                           log_ratio_micro)

RAW = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "cats and dogs and cats",
    "",
    "   ",
    "completely unrelated prose about engines",
    "the cat and the dog",
    "engines convert heat into motion",
]
TARGET = [
    "the cat sat",
    "a cat and a dog",
    "cats everywhere",
]


def _ds(docs):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "text": pa.array(docs, type=pa.string()),
    }))


def _fnv(s: str) -> int:
    h = 14695981039346656037
    for b in s.encode():
        h = ((h ^ b) * 1099511628211) % (1 << 64)
    return h


def _grams(doc):
    toks = doc.split()
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _brute_counts(docs, dim):
    cnt = np.zeros(dim, dtype=np.int64)
    for d in docs:
        for g in _grams(d):
            cnt[_fnv(g) % dim] += 1
    return cnt


def _brute_weights(raw, target, dim, smooth=1.0):
    ct = _brute_counts(target, dim)
    cr = _brute_counts(raw, dim)
    r = log_ratio_micro(ct, cr, smooth=smooth)
    out = []
    for d in raw:
        gs = _grams(d)
        out.append((len(gs), int(sum(int(r[_fnv(g) % dim]) for g in gs))))
    return out


@pytest.mark.parametrize("dim", [7, 64, 256])
def test_weights_match_brute_force(ray_session, dim):
    got = dsir_weights(_ds(RAW), _ds(TARGET), dim=dim).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    want = _brute_weights(RAW, TARGET, dim)
    assert list(got["n_grams"]) == [n for n, _ in want]
    assert list(got["w_micro"]) == [w for _, w in want]


def test_bucket_counts_exact(ray_session):
    assert np.array_equal(bucket_counts(_ds(RAW), 32),
                          _brute_counts(RAW, 32))


def test_featureless_docs_weight_zero(ray_session):
    got = dsir_weights(_ds(RAW), _ds(TARGET), dim=16).to_pandas()
    got = got.set_index("doc_id")
    assert got.loc[3, "w_micro"] == 0 and got.loc[3, "n_grams"] == 0
    assert got.loc[4, "w_micro"] == 0 and got.loc[4, "n_grams"] == 0


def test_target_like_docs_rank_higher(ray_session):
    """Docs sharing the target's cat/dog vocabulary must outscore the
    engine-prose docs on raw importance weight."""
    got = dsir_weights(_ds(RAW), _ds(TARGET), dim=4096).to_pandas()
    w = got.set_index("doc_id")["w_micro"]
    assert w[6] > w[5] and w[2] > w[7]


def test_partition_invariance(ray_session):
    a = dsir_weights(_ds(RAW), _ds(TARGET), dim=64).to_pandas()
    b = dsir_weights(_ds(RAW).repartition(5), _ds(TARGET).repartition(3),
                     dim=64).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_select_topk_matches_full_ranking(ray_session):
    k = 3
    tbl = dsir_select(_ds(RAW), _ds(TARGET), k=k, dim=64, seed=11)
    assert tbl.num_rows == k
    allw = dsir_weights(_ds(RAW), _ds(TARGET), dim=64).to_pandas()
    ids = allw["doc_id"].to_numpy()
    score = (allw["w_micro"].to_numpy()
             + gumbel_micro(ids.astype(np.int64), seed=11))
    order = np.lexsort((ids, -score))[:k]
    assert list(tbl["doc_id"].to_pylist()) == list(ids[order])
    assert (np.asarray(tbl["score_micro"]) ==
            np.sort(score)[::-1][:k]).all()


def test_select_k_exceeds_pool(ray_session):
    tbl = dsir_select(_ds(RAW), _ds(TARGET), k=1000, dim=64)
    assert tbl.num_rows == len(RAW)


def test_gumbel_deterministic_and_seeded():
    ids = np.arange(100, dtype=np.int64)
    a, b = gumbel_micro(ids, seed=0), gumbel_micro(ids, seed=0)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, gumbel_micro(ids, seed=1))
    # standard Gumbel has median -ln(ln 2) ~ 0.3665: draws straddle 0
    big = gumbel_micro(np.arange(4096, dtype=np.int64))
    assert (big > 0).any() and (big < 0).any()


def test_gumbel_matches_sql_chain():
    """The engine's -ln(-ln(u)) double chain must equal DuckDB's bit
    for bit (the platform-libm contract every ln-bearing oracle
    rests on), including the Knuth-hash uniform construction."""
    ids = np.arange(64, dtype=np.int64)
    got = gumbel_micro(ids, seed=7)
    sql = duckdb.sql(
        "SELECT CAST(floor(1e6 * -ln(-ln(((((i::HUGEINT + 7) * 2654435761)"
        " % 4294967296) + 0.5) / 4294967296.0)) + 0.5) AS BIGINT) AS g "
        "FROM range(64) t(i) ORDER BY i").df()["g"].to_numpy()
    assert np.array_equal(got, sql)


def test_log_ratio_micro_smoothing_and_validation():
    ct = np.array([0, 5], dtype=np.int64)
    cr = np.array([5, 5], dtype=np.int64)
    r = log_ratio_micro(ct, cr, smooth=1.0)
    # bucket 0: target-absent => negative; bucket 1: target-enriched
    assert r[0] < 0 < r[1]
    with pytest.raises(ValueError):
        log_ratio_micro(ct, cr, smooth=0.0)


def test_validation_errors(ray_session):
    with pytest.raises(ValueError):
        dsir_weights(_ds(RAW), _ds(TARGET), dim=0)
    with pytest.raises(ValueError):
        dsir_select(_ds(RAW), _ds(TARGET), k=0)


def test_oracle_parity_real_corpus(ray_session, sf_dir):
    """Full driver-contract replay on the real sf0.001 corpus: engine
    top-k == the SQL oracle row set (order-insensitive)."""
    from versatiles_rs_ray.queries import ORACLES, QUERIES

    eng = QUERIES["dsir_topk"](sf_dir).to_pandas()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')")
    want = con.sql(ORACLES["dsir_topk"]).df()
    cols = sorted(eng.columns)
    assert cols == sorted(want.columns)
    a = eng[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert a.astype("int64").equals(b.astype("int64"))
