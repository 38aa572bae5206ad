"""Self-check: run every queries() entry vs its oracle_sql() via DuckDB,
mirroring the driver's correctness gate (row count + schema + order-
insensitive value hash). Usage: python tools/selfcheck.py [sf_dir] [names...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    return pd.DataFrame(result)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif df[c].dtype == object or pd.api.types.is_string_dtype(df[c]):
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(mine: pd.DataFrame, oracle: pd.DataFrame):
    if len(mine) != len(oracle):
        return False, f"rows {len(mine)} vs {len(oracle)}"
    if sorted(mine.columns) != sorted(oracle.columns):
        return False, f"cols {sorted(mine.columns)} vs {sorted(oracle.columns)}"
    a, b = canon(mine), canon(oracle)
    if not a.equals(b):
        neq = (a != b).any(axis=1)
        bad = a[neq].head(3), b[neq].head(3)
        return False, f"values differ in {int(neq.sum())} rows\n{bad[0]}\nvs\n{bad[1]}"
    return True, f"{len(mine)} rows"


def main():
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    queries = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: engine error: {exc!r}")
            failures.append(name)
            continue
        dt = time.monotonic() - t0
        if name not in oracles:
            print(f"okROWS {name}: {len(mine)} rows ({dt:.1f}s, rows-only)")
            continue
        try:
            oracle = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {exc!r}")
            failures.append(name)
            continue
        ok, msg = compare(mine, oracle)
        print(("OK  " if ok else "FAIL") + f" {name}: {msg} ({dt:.1f}s)")
        if not ok:
            failures.append(name)
    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all green")


if __name__ == "__main__":
    main()
