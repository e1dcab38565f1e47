#!/usr/bin/env python3
"""Local oracle compare mirroring the driver: for each dumped query,
run the oracle SQL in DuckDB over the sf parquet tables, sort columns
by name, sort rows, and diff values exactly. Diagnostic only."""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def load(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = load(sf_dir)
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        if only and name not in only:
            continue
        if name not in oracle:
            print(f"{name}: NO_ORACLE (rows-only)")
            continue
        spark = duckdb.sql(
            f"SELECT * FROM read_parquet('{d}/*.parquet')").df()
        try:
            ora = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"{name}: ORACLE_ERR {e}")
            continue
        s, o = canon(spark), canon(ora)
        if len(s) != len(o):
            print(f"{name}: ROWS {len(s)} vs {len(o)}")
            continue
        if list(s.columns) != list(o.columns):
            print(f"{name}: SCHEMA {list(s.columns)} vs {list(o.columns)}")
            continue
        bad = []
        for c in s.columns:
            a, b = s[c], o[c]
            try:
                neq = ~((a == b) | (a.isna() & b.isna()))
            except Exception:
                neq = a.astype(str) != b.astype(str)
            if neq.any():
                i = neq.idxmax()
                bad.append((c, str(s[c].dtype), str(o[c].dtype),
                            repr(a[i]), repr(b[i]), int(neq.sum())))
        if bad:
            print(f"{name}: HASH_FAIL")
            for c, dt1, dt2, va, vb, n in bad:
                print(f"    col={c} spark_dtype={dt1} oracle_dtype={dt2} "
                      f"n_diff={n} spark={va} oracle={vb}")
        else:
            print(f"{name}: OK")

if __name__ == "__main__":
    main()
