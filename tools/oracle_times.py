#!/usr/bin/env python3
"""Per-oracle DuckDB timing with a hard per-query timeout.

Usage: oracle_times.py <oracle_sql.json> <sfDir> [timeout_s]
Runs each oracle in a fresh subprocess (32 threads) so quadratic /
recursive-CTE oracles can be killed at the timeout instead of hanging
the sweep. Prints one line per oracle and a summary.
"""
import json, sys, os, glob, time, multiprocessing as mp


def run_one(oracle_json, sf_dir, name, q):
    import duckdb
    con = duckdb.connect()
    con.execute("PRAGMA threads=32")
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        t = os.path.splitext(os.path.basename(p))[0]
        src = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    sql = json.load(open(oracle_json))[name]
    best = None
    for _ in range(2):
        t0 = time.time()
        n = len(con.execute(sql).fetchall())
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    q.put((name, n, best))


def main():
    oracle_json, sf_dir = sys.argv[1], sys.argv[2]
    timeout = float(sys.argv[3]) if len(sys.argv) > 3 else 45.0
    oracles = json.load(open(oracle_json))
    times, skipped = {}, []
    for name in sorted(oracles):
        q = mp.Queue()
        p = mp.Process(target=run_one, args=(oracle_json, sf_dir, name, q))
        p.start()
        p.join(timeout)
        if p.is_alive():
            p.terminate(); p.join()
            skipped.append(name)
            print(f"[oracle] {name:<28} TIMEOUT >{timeout:.0f}s")
        else:
            try:
                n, nn, dt = None, *q.get_nowait()[1:]
                times[name] = dt
                print(f"[oracle] {name:<28} rows={nn:8d} {dt:7.3f} s")
            except Exception:
                skipped.append(name)
                print(f"[oracle] {name:<28} ERROR")
    print(f"\nsummary: {len(times)} timed, sum={sum(times.values()):.1f} s, "
          f"skipped={len(skipped)}: {skipped}")
    json.dump(times, open("/tmp/oracle_times.json", "w"))


if __name__ == "__main__":
    main()
