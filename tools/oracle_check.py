#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB correctness gate.

Mimics the driver: for each query result parquet written by graft.Verify,
run the matching oracle SQL from oracle_sql.json in DuckDB over the same
sf tables, then compare row count, sorted column names, and cell values.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
(Dev-only tool — duckdb is driver-side; the Scala library has no such dep.)
"""
import json, math, sys, glob, os
import duckdb

def canon(con, rel_sql):
    df = con.sql(rel_sql).fetchdf()
    df = df[sorted(df.columns)]
    return df

def cells_equal(a, b):
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            return fa == fb or abs(fa - fb) < 1e-9
    except (TypeError, ValueError):
        pass
    if a is None or b is None:
        try:
            return (a is None and isinstance(b, float) and math.isnan(b)) or \
                   (b is None and isinstance(a, float) and math.isnan(a))
        except TypeError:
            return False
    return str(a) == str(b)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no result parquet"); n_fail += 1; continue
        try:
            got = canon(con, f"SELECT * FROM '{files[0]}'")
            want = canon(con, oracle[name])
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} != {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); n_fail += 1; continue
        bad = None
        gv, wv = got.values.tolist(), want.values.tolist()
        for i in range(len(gv)):
            for j in range(len(gv[i])):
                if not cells_equal(gv[i][j], wv[i][j]):
                    bad = (i, got.columns[j], gv[i][j], wv[i][j]); break
            if bad: break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: got={bad[2]!r} want={bad[3]!r}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(got)} rows x {len(got.columns)} cols")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
