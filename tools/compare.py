#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read Verify's
parquet dumps, run each oracle SQL in DuckDB over the same sf dir,
sort columns by name + rows by all columns, compare values exactly.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [--only a,b | --skip a,b]

--only / --skip restrict which oracle queries run — for splitting a
long sweep across processes or excluding a pathologically slow oracle
(the quadratic within-bucket candidate joins DuckDB pays at large SF).
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir, only=None, skip=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table (e.g. GenScale output)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    if skip:
        oracle = {k: v for k, v in oracle.items() if k not in skip}
    fails = 0
    for name, sql in sorted(oracle.items()):
        pq = f"{out_dir}/{name}"
        if not glob.glob(f"{pq}/*.parquet"):
            print(f"FAIL {name}: no spark output")
            fails += 1
            continue
        try:
            got = con.execute(f"SELECT * FROM '{pq}/*.parquet'").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            fails += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(want.columns)}")
            fails += 1
            continue
        if [str(d) for d in got.dtypes] != [str(d) for d in want.dtypes]:
            print(f"FAIL {name}: dtypes {dict(got.dtypes.astype(str))} vs "
                  f"{dict(want.dtypes.astype(str))}")
            fails += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            fails += 1
            continue
        g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        w = want.sort_values(by=list(want.columns)).reset_index(drop=True)
        try:
            eq = g.equals(w)
            if not eq:
                # find first mismatching cell for the report
                diff = (g != w) & ~(g.isna() & w.isna())
                cells = diff.to_numpy().nonzero()
                r, c = cells[0][0], cells[1][0]
                print(f"FAIL {name}: value mismatch at row {r} col "
                      f"{g.columns[c]}: {g.iat[r, c]!r} vs {w.iat[r, c]!r}")
                fails += 1
            else:
                print(f"OK   {name} ({len(g)} rows)")
        except Exception as e:
            print(f"FAIL {name}: compare error {e}")
            fails += 1
    if not (only or skip):
        missing = set(oracle) ^ set(
            os.path.basename(d) for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d))
        if missing:
            print(f"NOTE: oracle/output key mismatch: {missing}")
    print(f"{'PASS' if fails == 0 else 'FAIL'}: {len(oracle) - fails}/{len(oracle)}")
    return fails

if __name__ == "__main__":
    args = sys.argv[1:]
    only = skip = None
    if "--only" in args:
        i = args.index("--only"); only = set(args[i + 1].split(",")); del args[i:i + 2]
    if "--skip" in args:
        i = args.index("--skip"); skip = set(args[i + 1].split(",")); del args[i:i + 2]
    sys.exit(1 if main(args[0], args[1], only, skip) else 0)
