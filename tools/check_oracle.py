#!/usr/bin/env python
"""Local mirror of the driver's correctness harness: run every
queries() entry at a given sf and compare to oracle_sql() via DuckDB
(row count + schema + order-insensitive value comparison)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2:] or None

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(obj):
    if isinstance(obj, pd.DataFrame):
        return obj
    if hasattr(obj, "to_pandas"):
        return obj.to_pandas()
    return pd.DataFrame(obj)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        try:
            if pd.api.types.is_integer_dtype(df[c]):
                df[c] = df[c].astype("int64")
        except (OverflowError, TypeError):
            pass
    return df.sort_values(list(df.columns), kind="mergesort") \
        .reset_index(drop=True)


def main():
    import ray
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            mine = normalize(to_pandas(fn(SF)))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(mine)} rows, {dt:.1f}s)")
            continue
        ref = normalize(con.execute(oracles[name]).df())
        status = "ok  "
        if len(mine) != len(ref):
            status = "FAIL"
            detail = f"rows {len(mine)} != {len(ref)}"
        elif list(mine.columns) != list(ref.columns):
            status = "FAIL"
            detail = f"cols {list(mine.columns)} != {list(ref.columns)}"
        else:
            try:
                pd.testing.assert_frame_equal(mine, ref, check_dtype=False,
                                              check_exact=False, rtol=1e-6)
                detail = f"{len(mine)} rows match ({dt:.1f}s)"
            except AssertionError as e:
                status = "FAIL"
                detail = str(e).split("\n")[0][:120]
        if status == "FAIL":
            failures += 1
        print(f"{status} {name}: {detail}")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
