"""Local stand-in for the driver's correctness gate.

Runs every entry in __ray_entry__.queries() at sf0.01 (or $SF_DIR), runs
the matching oracle_sql() in DuckDB over the same parquet views, and
compares row count, column-name sets, and order-insensitive values.

Usage: python scripts/check_oracle.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

import ray

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(np.asarray(v).tolist())
                if isinstance(v, (list, np.ndarray)) else v
            )
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    df = df[sorted(df.columns)]
    sort_cols = [c for c in df.columns]
    try:
        df = df.sort_values(sort_cols, kind="mergesort")
    except Exception:
        df = df.sort_values([c for c in df.columns if df[c].dtype != object][:3])
    return df.reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> str:
    if set(got.columns) != set(exp.columns):
        return f"SCHEMA mismatch: ray={sorted(got.columns)} sql={sorted(exp.columns)}"
    if len(got) != len(exp):
        return f"ROWCOUNT mismatch: ray={len(got)} sql={len(exp)}"
    g, e = norm(got), norm(exp)
    for c in g.columns:
        gv, ev = g[c], e[c]
        # The driver hashes raw values: int64 2 vs float64 2.0 hash
        # differently.  Treat a numeric-kind split as a failure instead of
        # silently coercing (this masked 4 driver hash failures in round 1).
        if {gv.dtype.kind, ev.dtype.kind} == {"i", "f"}:
            return f"DTYPE mismatch in {c}: ray={gv.dtype} sql={ev.dtype}"
        if gv.dtype.kind == "f" or ev.dtype.kind == "f":
            gn = gv.astype(float).to_numpy()
            en = ev.astype(float).to_numpy()
            both_nan = np.isnan(gn) & np.isnan(en)
            if not np.all(both_nan | (gn == en)):
                bad = np.nonzero(~(both_nan | (gn == en)))[0][:3]
                return f"VALUES differ in {c} at {bad}: ray={gn[bad]} sql={en[bad]}"
        else:
            if not gv.reset_index(drop=True).equals(ev.reset_index(drop=True)):
                bad = (gv.to_numpy() != ev.to_numpy())
                i = np.nonzero(bad)[0][:3]
                return f"VALUES differ in {c} at {i}: ray={gv.iloc[i].tolist()} sql={ev.iloc[i].tolist()}"
    return "OK"


def main():
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(sys.argv[1:])

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_ok = n_bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
            if name in oracles:
                exp = con.execute(oracles[name]).df()
                verdict = compare(name, got, exp)
            else:
                verdict = f"rows-only ({len(got)} rows)"
        except Exception:
            verdict = "ERROR\n" + traceback.format_exc(limit=8)
        ok = verdict == "OK" or verdict.startswith("rows-only")
        n_ok += ok
        n_bad += not ok
        print(f"[{'PASS' if ok else 'FAIL'}] {name}  ({time.time()-t0:.1f}s)  {verdict}")
    print(f"\n{n_ok} ok, {n_bad} bad")
    ray.shutdown()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
