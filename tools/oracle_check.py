#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by `graft.Verify`) and the
oracle SQL from <verifyOutDir>/oracle_sql.json, runs the SQL in DuckDB with
the sfDir tables registered under bare names, then compares: row count,
schema (column names), and exact values after sorting columns by name and
rows by all columns. Floats compare bitwise first; on mismatch reports the
max abs delta so near-misses are distinguishable from logic bugs.

Dev tool only (driver-side python stack) — not part of the shipped engine.
"""
import sys, json, math, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows):
    return sorted(rows, key=lambda r: tuple(
        (x is None, str(type(x)), x if not isinstance(x, float) else x.hex())
        for x in r))

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output parquet")
            n_fail += 1
            continue
        try:
            mine = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        try:
            oracle_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        mcols, ocols = sorted(mine.columns), sorted(oracle_df.columns)
        if mcols != ocols:
            print(f"FAIL {name}: schema mismatch mine={mcols} oracle={ocols}")
            n_fail += 1
            continue
        m = canon([tuple(r) for r in mine[mcols].itertuples(index=False)])
        o = canon([tuple(r) for r in oracle_df[ocols].itertuples(index=False)])
        if len(m) != len(o):
            print(f"FAIL {name}: rows mine={len(m)} oracle={len(o)}")
            n_fail += 1
            continue
        bad = None
        maxd = 0.0
        for rm, ro in zip(m, o):
            for xm, xo in zip(rm, ro):
                if isinstance(xm, float) and isinstance(xo, float):
                    if math.isnan(xm) and math.isnan(xo):
                        continue
                    if xm != xo:
                        maxd = max(maxd, abs(xm - xo))
                        bad = bad or (rm, ro)
                elif xm != xo:
                    bad = bad or (rm, ro)
        if bad:
            print(f"FAIL {name}: value mismatch (max float delta {maxd:.3e})")
            print(f"  mine:   {bad[0]}")
            print(f"  oracle: {bad[1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(m)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
