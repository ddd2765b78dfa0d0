#!/usr/bin/env python3
"""Local dev-only mimic of the driver's DuckDB oracle compare.

Usage: python3 tools/selfcheck.py /root/testdata/sf0.01 /tmp/verify_out
Reads each <out>/<name>/ parquet result, runs <out>/oracle_sql.json in
DuckDB over the sf tables, and compares schema/rows/values with columns
sorted by name and rows sorted by all columns.
"""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                str(type(v)).find("ndarray") >= 0 else v)
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        ignore_index=True)
    return df

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result written"); n_bad += 1
            continue
        got = norm(pd.concat([pd.read_parquet(f) for f in files]))
        try:
            exp = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_bad += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs "
                  f"{list(exp.columns)}"); n_bad += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_bad += 1
            continue
        # value compare with tolerance-free exactness (driver hashes)
        mism = []
        for c in got.columns:
            a, b = got[c], exp[c]
            try:
                eq = (a == b) | (a.isna() & b.isna())
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                idx = eq[~eq].index[0]
                mism.append(f"{c}[{idx}]: {a[idx]!r} vs {b[idx]!r}")
        if mism:
            print(f"FAIL {name}: {'; '.join(mism[:3])}"); n_bad += 1
        else:
            print(f"ok   {name} ({len(got)} rows)"); n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
