#!/usr/bin/env python3
"""Local pre-check of SparkEntry oracle parity (mimics the driver's
DuckDB compare). Usage: python3 tools/compare.py <sfDir> <verifyOut>

For each query dir in <verifyOut>: read the Spark parquet result, run the
matching oracle SQL from oracle_sql.json in DuckDB (tables registered as
views over <sfDir>/*.parquet), and diff the two the way the driver does:
through pandas (so a DuckDB HUGEINT that pandas widens to float64/object
fails against Spark's int64 even when the values print the same), columns
sorted by name, rows sorted, doubles rounded. Build-time tool only — NOT
part of the Scala library.
"""
import json, os, sys, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df, ndigits=6):
    """(dtype-kinds, sorted-row-tuples) — dtype-kind mismatch is how the
    driver's hasher sees DuckDB HUGEINT vs Spark int64."""
    df = df[sorted(df.columns)]
    kinds = []
    rows = []
    cols = []
    for c in df.columns:
        s = df[c]
        k = s.dtype.kind  # i/u int, f float, O object, M datetime, b bool
        # normalize: nullable pandas ints and plain ints hash alike
        if k == "u": k = "i"
        kinds.append(k)
        if k == "f":
            s = s.round(ndigits).apply(lambda v: 0.0 if v == 0 else v)
        cols.append(s.tolist())
    for tup in zip(*cols) if cols else []:
        rows.append(tuple(repr(v) for v in tup))
    rows.sort()
    return list(df.columns), kinds, rows

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = [d for d in sorted(os.listdir(out_dir))
             if os.path.isdir(os.path.join(out_dir, d))]
    n_pass = n_fail = n_noop = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"[FAIL] {name}: no spark output"); n_fail += 1; continue
        sdf = con.execute(f"SELECT * FROM read_parquet({files!r})").df()
        if name not in oracles:
            print(f"[ROWS-ONLY] {name}: {len(sdf)} rows (no oracle)")
            n_noop += 1; continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle error: {e}"); n_fail += 1; continue
        try:
            sc, sk, sr = canon(sdf)
            oc, ok, orr = canon(odf)
        except TypeError as e:
            print(f"[FAIL] {name}: canon error (unsortable/array col?): {e}")
            n_fail += 1; continue
        if sc != oc:
            print(f"[FAIL] {name}: schema mismatch spark={sc} oracle={oc}")
            n_fail += 1; continue
        if sk != ok:
            print(f"[FAIL] {name}: dtype mismatch (driver hash would differ) "
                  f"spark={list(zip(sc, sk))} oracle={list(zip(oc, ok))}")
            n_fail += 1; continue
        if len(sr) != len(orr):
            print(f"[FAIL] {name}: rowcount spark={len(sr)} oracle={len(orr)}")
            n_fail += 1; continue
        if sr != orr:
            bad = [(a, b) for a, b in zip(sr, orr) if a != b][:3]
            print(f"[FAIL] {name}: value mismatch, first diffs: {bad}")
            n_fail += 1; continue
        print(f"[PASS] {name}: {len(sr)} rows")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noop} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
