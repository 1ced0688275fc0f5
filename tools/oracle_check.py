#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs
the matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB against
the sfDir parquet tables, and compares: columns sorted by name, rows
sorted by all columns, exact value equality (floats compared exactly —
the engine is expected to be bit-stable via decimal-routed aggregates).

Driver-side tooling only — NOT part of the Scala library.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for a stable total sort across dtypes (incl. NaN/None)
    s = df.astype(str)
    order = s.sort_values(by=list(s.columns)).index
    return df.loc[order].reset_index(drop=True)

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    declared = set(oracle)
    qn = os.path.join(out_dir, "query_names.json")
    if os.path.exists(qn):
        declared |= set(json.load(open(qn)))  # rows-only queries too
    fails = 0
    names = sorted(set(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d))) | declared)
    for name in names:
        if not os.path.isdir(os.path.join(out_dir, name)):
            print(f"  [FAIL-miss] {name}: declared but no result written")
            fails += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(got)} rows"
                  + ("  ** EMPTY **" if len(got) == 0 else ""))
            continue
        try:
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"  [FAIL-sql ] {name}: oracle SQL error: {e}")
            fails += 1
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            print(f"  [FAIL-cols] {name}: spark={list(g.columns)} duckdb={list(w.columns)}")
            fails += 1
            continue
        if len(g) != len(w):
            print(f"  [FAIL-rows] {name}: spark={len(g)} duckdb={len(w)}")
            fails += 1
            continue
        # exact compare; report first differing cell
        ok = True
        for c in g.columns:
            a, b = g[c], w[c]
            try:
                neq = ~((a == b) | (a.isna() & b.isna()))
            except Exception:
                neq = a.astype(str) != b.astype(str)
            if neq.any():
                i = int(neq.idxmax())
                print(f"  [FAIL-val ] {name}.{c} row {i}: spark={a[i]!r} duckdb={b[i]!r}")
                ok = False
                fails += 1
                break
        if ok:
            print(f"  [OK       ] {name}: {len(g)} rows")
    print(f"{'PASS' if fails == 0 else 'FAIL'}: {len(names)} queries, {fails} failures")
    return 1 if fails else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
