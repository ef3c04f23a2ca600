#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB with views over
<sfDir>/*.parquet, and compares values exactly (columns sorted by name,
rows in emitted order).
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        if only and name not in only:
            continue
        files = sorted(glob.glob(f"{d}/*.parquet"))
        if not files:
            print(f"EMPTY-OUT {name}")
            n_fail += 1
            continue
        got = con.sql(f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracle:
            print(f"rows-only {name}: {len(got)} rows")
            n_skip += 1
            continue
        try:
            want = con.sql(oracle[name]).fetchdf()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            n_fail += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        # exact-value compare in row order (same discipline as hashing)
        bad = None
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                eq = (a == b) | (a.isna() & b.isna())
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                i = int(eq.idxmin())
                bad = (c, i, a.iloc[i], b.iloc[i], a.dtype, b.dtype)
                break
        if bad:
            c, i, av, bv, at, bt = bad
            print(f"FAIL {name}: col {c} row {i}: got {av!r}({at}) want {bv!r}({bt})")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main())
