"""Local mirror of the driver's correctness gate: run every
``queries()`` entry at a given sf and diff against ``oracle_sql()``
via DuckDB (row count, sorted-column value comparison).  Not part of
the library — a dev tool (owns its own Ray session).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd
import ray

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    errs = []
    if len(ray_df) != len(sql_df):
        errs.append(f"rowcount ray={len(ray_df)} sql={len(sql_df)}")
    rc, sc = sorted(ray_df.columns), sorted(sql_df.columns)
    if rc != sc:
        errs.append(f"columns ray={rc} sql={sc}")
        return errs
    a, b = canon(ray_df), canon(sql_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].values, b[c].values
            if np.issubdtype(a[c].dtype, np.floating):
                bad = ~(np.isclose(av.astype(float), bv.astype(float), rtol=0, atol=1e-9) | (pd.isna(av) & pd.isna(bv)))
            else:
                bad = ~((av == bv) | (pd.isna(av) & pd.isna(bv)))
            if bad.any():
                i = int(np.argmax(bad))
                errs.append(f"col {c}: {int(bad.sum())} mismatches, first at {i}: ray={av[i]!r} sql={bv[i]!r}")
    return errs


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    qs, sqls = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    failed = []
    import time

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as ex:
            failed.append(name)
            print(f"FAIL {name}: pipeline raised {type(ex).__name__}: {ex}")
            continue
        dt = time.perf_counter() - t0
        if name not in sqls:
            print(f"ok?  {name}: rows-only ({len(ray_df)} rows, {dt:.1f}s) cols={list(ray_df.columns)}")
            continue
        sql_df = con.sql(sqls[name]).df()
        errs = compare(name, ray_df, sql_df)
        if errs:
            failed.append(name)
            print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(errs))
        else:
            print(f"PASS {name}: {len(ray_df)} rows ({dt:.1f}s)")
    ray.shutdown()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
