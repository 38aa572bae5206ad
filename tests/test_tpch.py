"""TPC-H-shape relational pipelines (queries.py Q1/Q3/Q5) vs DuckDB
over the sf0.001 tables — the same comparison the driver's oracle gate
makes, kept in-suite so join/aggregate regressions surface in CI."""

import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "tools")
from selfcheck import canon as _canon  # the driver-gate canonicalizer

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


@pytest.mark.parametrize("name", ["pricing_summary", "shipping_priority",
                                  "local_supplier_volume", "promo_revenue"])
def test_tpch_query_matches_duckdb(ray_session, name):
    from versatiles_rs_ray import queries as Q

    mine = Q.QUERIES[name](SF_DIR)
    if hasattr(mine, "to_pandas"):
        mine = mine.to_pandas()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    want = con.execute(Q.ORACLES[name]).fetchdf()
    assert len(mine) == len(want) and len(mine) > 0
    pd.testing.assert_frame_equal(_canon(mine), _canon(want))
