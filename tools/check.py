#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]

Expects Verify to have been run first (writes <outDir>/<name>/ parquet and
<outDir>/oracle_sql.json). Registers the sf tables as DuckDB views, runs each
oracle SQL, normalizes both sides (sort columns by name, sort rows, round
doubles to 1e-9, timestamps → UTC string), and diffs.
"""
import sys, json, math, glob, datetime, decimal

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_val(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{round(v, 9):.9f}"
    if isinstance(v, decimal.Decimal):
        return f"{float(v):.9f}"
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")[:-3]
    if isinstance(v, (list, tuple)):
        # The driver's pandas compare cannot sort array cells (unhashable
        # ndarray in factorize) — mirror that as a loud failure instead of
        # silently stringifying, so array-output regressions surface locally.
        raise TypeError("driver-incompatible array cell in result column")
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_val(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for c in sorted(cols)], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single files; ScaleGen corpora are Spark
        # output directories -- support both so scaled dirs gate directly
        p = f"{sf_dir}/{t}.parquet"
        import os
        src = f"read_parquet('{p}/*.parquet')" if os.path.isdir(p) else f"read_parquet('{p}')"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            sq = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            s_cols = [d[0] for d in sq.description]
            s_rows = sq.fetchall()
            oq = con.execute(sql)
            o_cols = [d[0] for d in oq.description]
            o_rows = oq.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        try:
            sc, sr = norm_rows(s_cols, s_rows)
            oc, orr = norm_rows(o_cols, o_rows)
        except TypeError as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if sc != oc:
            print(f"FAIL {name}: columns spark={sc} oracle={oc}")
            n_fail += 1
        elif sr != orr:
            diffs = [(a, b) for a, b in zip(sr, orr) if a != b]
            print(f"FAIL {name}: {len(sr)} vs {len(orr)} rows, first diffs:")
            for a, b in diffs[:3]:
                print(f"   spark:  {a}\n   oracle: {b}")
            if len(sr) != len(orr):
                s_set, o_set = set(sr), set(orr)
                extra_s = list(s_set - o_set)[:2]
                extra_o = list(o_set - s_set)[:2]
                print(f"   only-spark: {extra_s}\n   only-oracle: {extra_o}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed, {len(oracle)} oracles total")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
