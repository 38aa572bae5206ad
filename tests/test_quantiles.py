"""Exact float quantiles via radix selection (stages/quantiles):
bit-map monotonicity, sorted-index equality on adversarial float
sets, DuckDB quantile_disc parity, null handling, validation."""

import math

import numpy as np
import pyarrow as pa
import pytest

from versatiles_rs_ray.stages.quantiles import f2u, float_quantiles, u2f

ADVERSARIAL = np.array([
    0.0, -0.0, 1.0, -1.0, 1e-300, -1e-300, 1e300, -1e300,
    np.inf, -np.inf, 0.1, -0.1, 2.5, 2.5, 2.5, 3.75, -3.75,
    5e-324, -5e-324, 1.7976931348623157e308,
], dtype=np.float64)


def test_bit_map_is_monotone_and_invertible():
    # strictly monotone over distinct floats (np.unique merges -0/+0)
    v = np.unique(ADVERSARIAL)
    u = f2u(v)
    assert (np.diff(u.astype(object)) > 0).all()
    # the map refines float equality into a total order: -0.0 sorts
    # immediately below +0.0 (both are valid quantile_disc answers
    # for a rank landing on the zero run)
    z = f2u(np.array([-0.0, 0.0]))
    assert int(z[1]) - int(z[0]) == 1
    for x in ADVERSARIAL:
        back = u2f(int(f2u(np.array([x]))[0]))
        # -0.0 and +0.0 round-trip to themselves bit-exactly
        assert np.float64(back).tobytes() == np.float64(x).tobytes()


def _ds(vals):
    import ray.data as rd

    return rd.from_arrow(pa.table({"value": pa.array(vals,
                                                     type=pa.float64())}))


@pytest.mark.parametrize("qs", [(0.0,), (0.5,), (0.0, 0.1, 0.5, 0.9, 1.0)])
def test_matches_sorted_index(ray_session, qs):
    rng = np.random.RandomState(3)
    vals = np.concatenate([rng.randn(500) * 1e6, rng.randn(500) * 1e-6,
                           ADVERSARIAL[:8]])
    got = float_quantiles(_ds(list(vals)), "value", qs).to_pandas()
    s = np.sort(vals)
    for q, v in zip(qs, got["value"]):
        k = max(math.ceil(q * len(s)) - 1, 0)
        assert np.float64(v).tobytes() == np.float64(s[k]).tobytes(), q


def test_duckdb_parity_real_table(ray_session, sf_dir):
    import duckdb
    import ray.data as rd

    qs = (0.25, 0.5, 0.9)
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    got = float_quantiles(ds, "value", qs).to_pandas()
    for q, v in zip(qs, got["value"]):
        want = duckdb.sql(
            f"select quantile_disc(value, {q}) from "
            f"read_parquet('{sf_dir}/events.parquet')").fetchone()[0]
        assert v == want, q


def test_nulls_ignored(ray_session):
    vals = [1.0, None, 2.0, None, 3.0]
    got = float_quantiles(_ds(vals), "value", (0.5, 1.0)).to_pandas()
    assert list(got["value"]) == [2.0, 3.0]


def test_negative_heavy_and_duplicates(ray_session):
    vals = [-5.0] * 10 + [-1.5] * 5 + [7.0]
    # n=16: k = max(ceil(q*16)-1, 0) -> 0, 7, 13, 15
    got = float_quantiles(_ds(vals), "value", (0.0, 0.5, 0.875, 1.0))
    assert got["value"].to_pylist() == [-5.0, -5.0, -1.5, 7.0]


def test_validation(ray_session):
    with pytest.raises(ValueError):
        float_quantiles(_ds([1.0]), "value", (1.5,))
    with pytest.raises(ValueError):
        float_quantiles(_ds([1.0]), "value", ())
    with pytest.raises(ValueError):
        float_quantiles(_ds([None]), "value", (0.5,))


def test_value_buckets_query(ray_session):
    """Bucketize composition: engine quartile labels == a pandas
    reference using the same exact thresholds (sf0.001)."""
    import numpy as np
    import pandas as pd

    from versatiles_rs_ray import queries as Q

    sf = "/root/testdata/sf0.001"
    got = Q.QUERIES["value_buckets"](sf).to_pandas()
    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["event_id", "value"])
    thr = np.quantile(ev["value"].to_numpy(),
                      [0.25, 0.5, 0.75], method="inverted_cdf")
    want = np.searchsorted(thr, ev["value"].to_numpy(), side="left") + 1
    m = got.set_index("event_id")["bucket"]
    assert (m.loc[ev["event_id"]].to_numpy() == want).all()
    assert sorted(got["bucket"].unique()) == [1, 2, 3, 4]
