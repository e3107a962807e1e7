#!/usr/bin/env python3
"""Local mirror of the driver's t2 DuckDB-oracle gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first).

For each query in oracle_sql.json: read the Spark result parquet and the
DuckDB oracle result, sort columns by name, sort rows, compare. Reports
exact mismatches and max float deltas so ulp-level drift is visible before
the real gate runs.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    # stringify unhashable cells (lists) for sorting
    for c in df.columns:
        if df[c].dtype == object and df[c].map(lambda v: isinstance(v, (list, np.ndarray))).any():
            df[c] = df[c].map(lambda v: str(list(v)))
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    args = [a for a in sys.argv[1:] if a != "--subset"]
    # --subset: check only queries whose dump dir exists (pair with
    # Verify's 3rd-arg query filter) instead of FAILing every absent one
    subset = "--subset" in sys.argv
    sf = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out = args[1] if len(args) > 1 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    # queries that errored before producing output (Verify writes these so
    # regressions surface as explicit failures, not missing keys)
    try:
        for name, err in sorted(json.load(open(f"{out}/errors.json")).items()):
            print(f"FAIL {name}: query errored: {err[:160]}"); n_fail += 1
    except FileNotFoundError:
        pass
    for name in sorted(oracle):
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            if subset: continue
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = canon(con.sql(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").df())
            exp = canon(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:200]}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1; continue
        ok = True
        for c in got.columns:
            g, e = got[c], exp[c]
            if np.issubdtype(g.dtype, np.floating) or np.issubdtype(e.dtype, np.floating):
                ga = g.astype(float).to_numpy(); ea = e.astype(float).to_numpy()
                both_nan = np.isnan(ga) & np.isnan(ea)
                one_nan = np.isnan(ga) ^ np.isnan(ea)
                delta = np.abs(ga - ea)
                delta[both_nan] = 0.0
                delta[one_nan] = np.inf  # one-sided NaN is a hard mismatch
                mx = np.nanmax(delta) if len(delta) else 0.0
                if mx > 0:
                    flag = "FLOATDELTA" if mx < 1e-9 else "MISMATCH"
                    print(f"{'WARN' if mx < 1e-9 else 'FAIL'} {name}.{c}: {flag} max={mx:g}")
                    if mx >= 1e-9: ok = False
            else:
                gs = g.map(str); es = e.map(str)
                neq = (gs != es)
                if neq.any():
                    i = int(np.argmax(neq.to_numpy()))
                    print(f"FAIL {name}.{c}: value mismatch at row {i}: {gs.iloc[i]!r} vs {es.iloc[i]!r}")
                    ok = False
        if ok:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        else:
            n_fail += 1
    # rows-only queries (no oracle): just confirm output exists & has rows
    for d in sorted(glob.glob(f"{out}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name in oracle: continue
        try:
            n = con.sql(f"SELECT count(*) FROM read_parquet('{out}/{name}/*.parquet')").fetchone()[0]
            print(f"INFO {name}: rows-only, {n} rows")
        except Exception as e:
            print(f"WARN {name}: unreadable: {str(e)[:120]}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
