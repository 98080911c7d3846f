#!/usr/bin/env python3
"""Time sf1-crossover oracle queries in DuckDB (32 threads).

Usage: sf1_duckdb.py <oracle_sql.json from a Verify dump> <sfDir> [name...]
The oracle SQL references bare table names; views over <sfDir>/*.parquet
provide them, mirroring tools/verify_local.py. Extra args select the
query names (default: the round-8 five).
"""
import json, sys, time, glob, os
import duckdb

FIVE = ["corpus_dsir", "dedup_lines", "grouping_paired_agg",
        "analyzer_tokens", "tf_within"]

def main(oracle_json, sf_dir, names=None):
    oracles = json.load(open(oracle_json))
    con = duckdb.connect()
    con.execute("PRAGMA threads=32")
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.splitext(os.path.basename(p))[0]
        src = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
    for name in (names or FIVE):
        sql = oracles.get(name)
        if not sql:
            print(f"[sf1-duck] {name:<22} NO ORACLE")
            continue
        for p in (1, 2):
            t0 = time.time()
            n = len(con.execute(sql).fetchall())
            print(f"[sf1-duck] {name:<22} pass{p} rows={n:8d} "
                  f"{time.time()-t0:7.2f} s")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3:] or None)
