#!/usr/bin/env python3
"""Local pre-check of SparkEntry oracle parity (mimics the driver's
DuckDB compare). Usage: python3 tools/compare.py <sfDir> <verifyOut>

For each query dir in <verifyOut>: read the Spark parquet result, run the
matching oracle SQL from oracle_sql.json in DuckDB (tables registered as
views over <sfDir>/*.parquet), canonicalize both (columns sorted by name,
rows sorted, doubles rounded) and diff. Build-time tool only — NOT part
of the Scala library.
"""
import json, os, sys, glob
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(rows, cols, ndigits=6):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                v = round(v, ndigits)
                if v == 0: v = 0.0
            rr.append(repr(v))
        out.append(tuple(rr))
    out.sort()
    return sorted(c for c in cols), out

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
        srel = con.execute(
            f"SELECT * FROM read_parquet({files!r})")
        scols = [d[0] for d in srel.description]
        srows = srel.fetchall()
        if name not in oracles:
            print(f"[ROWS-ONLY] {name}: {len(srows)} rows (no oracle)")
            n_noop += 1; continue
        try:
            orel = con.execute(oracles[name])
            ocols = [d[0] for d in orel.description]
            orows = orel.fetchall()
        except Exception as e:
            print(f"[FAIL] {name}: oracle error: {e}"); n_fail += 1; continue
        sc, sr = canon(srows, scols)
        oc, orr = canon(orows, ocols)
        if sc != oc:
            print(f"[FAIL] {name}: schema mismatch spark={sc} oracle={oc}")
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
