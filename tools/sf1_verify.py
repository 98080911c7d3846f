#!/usr/bin/env python3
"""Full-suite sf1 correctness sweep (the r12 verdict's item #4).

Usage: sf1_verify.py <outDir from a graft.Verify run at sf1> <sf1Dir> [timeoutSec]

Same compare as tools/verify_local.py (sorted columns, row count,
value-exact), with two sf1 adaptations:
 - tables are Spark-written DIRECTORIES (<sf1Dir>/<t>.parquet/*.parquet);
 - each oracle runs under a per-query TIMEOUT (default 120 s) enforced
   by con.interrupt() from a timer thread — the documented quadratic /
   recursive-CTE oracle class cannot finish at sf1 and reports TIMEOUT,
   not FAIL (the Spark side of those queries is compared at smaller SFs
   where the oracle terminates).
"""
import sys, os, json, glob, threading
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def kind(d):
    if np.issubdtype(d, np.integer):
        return "int"
    if np.issubdtype(d, np.floating):
        return "float"
    if np.issubdtype(d, np.bool_):
        return "bool"
    return str(d)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    timeout = float(sys.argv[3]) if len(sys.argv) > 3 else 120.0
    con = duckdb.connect()
    con.execute("PRAGMA threads=32")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_timeout = n_noracle = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        spark_df = pd.concat([pd.read_parquet(f) for f in files],
                             ignore_index=True) if files else pd.DataFrame()
        if name not in oracles:
            n_noracle += 1
            print(f"  [rows-only] {name}: {len(spark_df)} rows", flush=True)
            continue
        timer = threading.Timer(timeout, con.interrupt)
        timer.start()
        try:
            oracle_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            msg = str(e)
            if "INTERRUPT" in msg.upper():
                n_timeout += 1
                print(f"  [TIMEOUT>{timeout:.0f}s] {name} "
                      f"(spark rows={len(spark_df)})", flush=True)
            else:
                n_fail += 1
                print(f"  [FAIL] {name}: oracle SQL error: {e}", flush=True)
            continue
        finally:
            timer.cancel()
        a, b = canon(spark_df), canon(oracle_df)
        if list(a.columns) != list(b.columns):
            n_fail += 1
            print(f"  [FAIL] {name}: columns {list(a.columns)} vs "
                  f"{list(b.columns)}", flush=True)
            continue
        if len(a) != len(b):
            n_fail += 1
            print(f"  [FAIL] {name}: rows {len(a)} vs {len(b)}", flush=True)
            continue
        equal, detail = True, ""
        for c in a.columns:
            av, bv = a[c].values, b[c].values
            ka, kb = kind(a[c].dtype), kind(b[c].dtype)
            if ka != kb:
                detail = f"col {c}: DTYPE divergence {a[c].dtype} vs {b[c].dtype}"
                equal = False
                break
            if ka == "float":
                ok = np.allclose(av.astype(float), bv.astype(float),
                                 rtol=1e-9, atol=1e-9, equal_nan=True)
            else:
                ok = (pd.Series(av).fillna("<null>") ==
                      pd.Series(bv).fillna("<null>")).all()
            if not ok:
                detail = f"col {c}: value mismatch"
                equal = False
                break
        if equal:
            n_pass += 1
            print(f"  [ok]   {name}: {len(a)} rows", flush=True)
        else:
            n_fail += 1
            print(f"  [FAIL] {name}: {detail}", flush=True)
    print(f"\npass={n_pass} fail={n_fail} timeout={n_timeout} "
          f"rows_only={n_noracle}", flush=True)


if __name__ == "__main__":
    main()
