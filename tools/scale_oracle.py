#!/usr/bin/env python3
"""Time the DuckDB oracle formulations against a (possibly scaled) sf dir.

Companion to graft.data.ScaleGen + graft.Bench for the scale-story
measurement: runs each requested oracle SQL (from a graft.Verify dump's
oracle_sql.json) against the parquet tables of the given directory, one
subprocess per query with a hard timeout, and prints a JSON map of
query -> seconds (or "timeout"/"error: ...").

Usage:
  python3 tools/scale_oracle.py <sfDir> <oracle_sql.json> <timeout_s> [q1,q2,...]

Tables may be single parquet files (driver testdata) or directories of
part files (ScaleGen output) — both resolve via read_parquet glob.
"""
import json
import multiprocessing as mp
import os
import sys
import time

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def _views(con, sf_dir):
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        src = f"read_parquet('{p}/*.parquet')" if os.path.isdir(p) else f"read_parquet('{p}')"
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM {src}")


def _run_one(sf_dir, sql, q):
    import duckdb
    con = duckdb.connect()
    _views(con, sf_dir)
    t0 = time.time()
    con.execute(sql).fetchall()
    q.put(time.time() - t0)


def time_query(sf_dir, sql, timeout_s):
    q = mp.Queue()
    p = mp.Process(target=_run_one, args=(sf_dir, sql, q))
    p.start()
    p.join(timeout_s)
    if p.is_alive():
        p.terminate()
        p.join()
        return "timeout"
    if not q.empty():
        return round(q.get(), 3)
    return f"error: exit {p.exitcode}"


def main():
    sf_dir, oracle_path, timeout_s = sys.argv[1], sys.argv[2], float(sys.argv[3])
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    oracles = json.load(open(oracle_path))
    out = {}
    for name, sql in oracles.items():
        if only is not None and name not in only:
            continue
        out[name] = time_query(sf_dir, sql, timeout_s)
        print(f"  {name}: {out[name]}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "timeout_s": timeout_s, "oracle_s": out}))


if __name__ == "__main__":
    main()
