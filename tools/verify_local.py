#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/verify_local.py <outDir> <sfDir>

Reads each <outDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
sfDir parquet tables, and compares: column names (sorted), row count, and
a hash of the sorted rows. Strict float equality by default; reports
near-misses separately so precision issues are visible.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_noracle = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True) \
            if files else pd.DataFrame()
        if name not in oracles:
            n_noracle += 1
            print(f"  [rows-only] {name}: {len(spark_df)} rows")
            continue
        try:
            oracle_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            n_fail += 1
            print(f"  [FAIL] {name}: oracle SQL error: {e}")
            continue
        a, b = canon(spark_df), canon(oracle_df)
        if list(a.columns) != list(b.columns):
            n_fail += 1
            print(f"  [FAIL] {name}: columns {list(a.columns)} vs {list(b.columns)}")
            continue
        if len(a) != len(b):
            n_fail += 1
            print(f"  [FAIL] {name}: rows {len(a)} vs {len(b)}")
            continue
        equal = True
        detail = ""
        for c in a.columns:
            av, bv = a[c].values, b[c].values
            # The driver hashes the RENDERED values, so an int column on one
            # side vs a float/object column on the other (e.g. DuckDB HUGEINT
            # window sums -> pandas float64) hash-mismatches even when every
            # value is numerically identical. Flag dtype-kind divergence hard.
            def kind(d):
                if np.issubdtype(d, np.integer): return "int"
                if np.issubdtype(d, np.floating): return "float"
                if np.issubdtype(d, np.bool_): return "bool"
                return str(d)
            ka, kb = kind(a[c].dtype), kind(b[c].dtype)
            if ka != kb:
                detail = (f"col {c}: DTYPE divergence {a[c].dtype} vs {b[c].dtype} "
                          f"(driver hash WILL fail; cast the oracle, e.g. HUGEINT->BIGINT)")
                equal = False
                break
            if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(b[c].dtype, np.floating):
                ok = np.array_equal(av.astype(float), bv.astype(float), equal_nan=True)
                if not ok:
                    close = np.allclose(av.astype(float), bv.astype(float), rtol=1e-9, equal_nan=True)
                    detail = f"col {c}: {'NEAR-MISS (float)' if close else 'value mismatch'}"
                    equal = False
                    break
            else:
                if not (av == bv).all():
                    idx = int(np.argmax(av != bv))
                    detail = f"col {c} row {idx}: {av[idx]!r} vs {bv[idx]!r}"
                    equal = False
                    break
        if equal:
            n_pass += 1
            print(f"  [ok]   {name}: {len(a)} rows")
        else:
            n_fail += 1
            print(f"  [FAIL] {name}: {detail}")
    print(f"\npass={n_pass} fail={n_fail} rows_only={n_noracle}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
