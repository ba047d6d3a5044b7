#!/usr/bin/env python3
"""Local simulator of the driver's correctness gate: compare each
Verify.scala parquet dump against its DuckDB oracle SQL.

Usage: python3 scripts/check_oracle.py <verify_out_dir> <sf_dir>
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    # Queries that errored inside Verify (or whose dump is absent) must
    # fail the gate, not silently disappear from the iteration.
    failed_path = os.path.join(out_dir, "failed_queries.json")
    verify_failed = set(json.load(open(failed_path))) if os.path.exists(failed_path) else set()
    dumped = {n for n in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, n))}
    for name in sorted(verify_failed | (set(oracle) - dumped)):
        print(f"  NO-RESULT  {name}: query failed in Verify or dump missing")
        n_fail += 1
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir) or name in verify_failed:
            continue
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True) \
            if files else pd.DataFrame()
        if name not in oracle:
            status = "ROWS-ONLY" if len(got) > 0 else "EMPTY!"
            print(f"  {status:10} {name}: rows={len(got)}")
            if len(got) == 0:
                n_fail += 1
            else:
                n_pass += 1
            continue
        try:
            want = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"  ORACLE-ERR {name}: {e}")
            n_fail += 1
            continue
        g, w = canon(got), canon(want)
        # strict dtype parity: the driver's hasher may distinguish
        # int64 from float64 (DuckDB HUGEINT) or int32 from int64
        dtd = [f"{c}({g[c].dtype}!={w[c].dtype})" for c in g.columns
               if c in w.columns and str(g[c].dtype) != str(w[c].dtype)]
        if dtd:
            print(f"  DTYPE-DIFF {name}: {' '.join(dtd)}")
            n_fail += 1
            continue
        if list(g.columns) != list(w.columns):
            print(f"  COLS-DIFF  {name}: spark={list(g.columns)} duckdb={list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"  ROWS-DIFF  {name}: spark={len(g)} duckdb={len(w)}")
            n_fail += 1
            continue
        # value compare with dtype normalization (mirrors a hash compare)
        diffs = []
        for c in g.columns:
            a, b = g[c], w[c]
            try:
                pd.testing.assert_series_equal(
                    a.astype(str) if a.dtype == object else a,
                    b.astype(str) if b.dtype == object else b,
                    check_dtype=False, check_names=False, check_exact=True)
            except AssertionError:
                diffs.append(c)
        if diffs:
            print(f"  VAL-DIFF   {name}: columns {diffs}")
            for c in diffs[:2]:
                neq = (g[c].astype(str) != w[c].astype(str))
                idx = neq[neq].index[:3]
                for i in idx:
                    print(f"      row {i} {c}: spark={g[c][i]!r} duckdb={w[c][i]!r}")
            n_fail += 1
        else:
            print(f"  PASS       {name}: rows={len(g)}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
