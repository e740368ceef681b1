#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sfDir tables,
normalizes both sides (columns sorted by name, rows sorted, values
stringified), and diffs. Strict: any value mismatch is a FAIL.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            df[c] = col.map(lambda v: "NULL" if v is None else str(v))
        elif str(col.dtype).startswith("float"):
            # repr of float64 is exact; NaN/None unify
            df[c] = col.map(lambda v: "NULL" if pd.isna(v) else repr(float(v)))
        else:
            df[c] = col.map(lambda v: "NULL" if pd.isna(v) else str(v))
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: columns spark={sorted(got.columns)} oracle={sorted(exp.columns)}")
            n_fail += 1
            continue
        g, e = normalize(got), normalize(exp)
        if len(g) != len(e):
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(e)}")
            n_fail += 1
            continue
        neq = (g != e)
        if neq.any().any():
            bad_cols = [c for c in g.columns if neq[c].any()]
            idx = neq.any(axis=1)
            print(f"FAIL {name}: {int(neq.any(axis=1).sum())}/{len(g)} rows differ; cols={bad_cols}")
            print("  spark:", g[idx].head(3).to_dict("records"))
            print("  oracle:", e[idx].head(3).to_dict("records"))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
