"""Local replica of the driver's correctness gate.

Runs every queries() entry at a given sf_dir, runs the matching
oracle_sql() in DuckDB over the same parquet tables, and compares
row count, column names, and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(obj, rd.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    if only:
        # fail LOUDLY on unknown names: a typo or an unregistered query
        # used to print "all queries match" vacuously (round-5 footgun:
        # a new query's oracle existed but its queries() entry didn't)
        unknown = sorted(set(only) - set(qs))
        if unknown:
            print(f"UNKNOWN query names (not in queries()): {unknown}")
            sys.exit(2)
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL  {name}: ray error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"ok?   {name}: rows-only, {len(got)} rows  ({dt:.1f}s)")
            continue
        exp = canon(con.sql(sqls[name]).df())
        status = "PASS"
        detail = ""
        if list(got.columns) != list(exp.columns):
            status, detail = "FAIL", f"cols {list(got.columns)} vs {list(exp.columns)}"
        elif len(got) != len(exp):
            status, detail = "FAIL", f"rows {len(got)} vs {len(exp)}"
        else:
            try:
                pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)
            except AssertionError as e:
                status, detail = "FAIL", str(e).splitlines()[-1][:200]
        print(f"{status:5} {name}: {len(got)} rows  ({dt:.1f}s) {detail}")
        if status == "FAIL":
            failures.append(name)
    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
