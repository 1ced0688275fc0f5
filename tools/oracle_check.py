#!/usr/bin/env python3
"""Local pre-check of SparkEntry.oracleSql vs Verify parquet dumps.

Mirrors the driver's CORRECTNESS gate: for each query, run the oracle SQL
in DuckDB over the sf parquet tables, sort columns by name, sort rows,
and hash-compare against the Spark result parquet. Driver-side tooling
only (duckdb/pyarrow are not dependencies of the library).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

import datetime

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    # date == midnight timestamp (engines disagree on date-fn return types)
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.strftime("%Y-%m-%d 00:00:00.000000")
    return str(v)

# Int widths collapse (Spark LongType vs DuckDB's narrower inference is not a
# real divergence); everything else — crucially TIMESTAMP vs TIMESTAMP WITH
# TIME ZONE — must match exactly. The r7 lesson: the driver compares DuckDB
# types, so a name-only local gate certifies red rounds.
_INT_WIDTHS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
               "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}

def canon_type(t):
    t = t.upper()
    return "INT" if t in _INT_WIDTHS else t

def typed_cols(con, sql):
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return sorted((r[0], canon_type(r[1])) for r in rows)

def frame_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = json.load(open(os.path.join(out_dir, "query_names.json")))
    bad = []
    for name in names:
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            bad.append((name, "no spark output"))
            continue
        if name not in oracle:
            print(f"  {name}: rows-only (no oracle)")
            continue
        try:
            sp = con.execute(
                f"SELECT * FROM read_parquet('{d}/*.parquet')").fetchall()
            sp_cols = [c[0] for c in con.description]
            oc = con.execute(oracle[name]).fetchall()
            oc_cols = [c[0] for c in con.description]
        except Exception as e:
            bad.append((name, f"exec error: {e}"))
            continue
        try:
            sp_typed = typed_cols(con, f"SELECT * FROM read_parquet('{d}/*.parquet')")
            oc_typed = typed_cols(con, oracle[name])
        except Exception as e:
            bad.append((name, f"describe error: {e}"))
            continue
        if sp_typed != oc_typed:
            bad.append((name, f"schema: spark={sp_typed} oracle={oc_typed}"))
            continue
        if len(sp) != len(oc):
            bad.append((name, f"rows: spark={len(sp)} oracle={len(oc)}"))
            continue
        hs, ho = frame_hash(sp_cols, sp), frame_hash(oc_cols, oc)
        if hs != ho:
            bad.append((name, "hash mismatch"))
        else:
            print(f"  {name}: OK ({len(sp)} rows)")
    print()
    if bad:
        print(f"FAILED {len(bad)}:")
        for n, why in bad:
            print(f"  {n}: {why}")
        sys.exit(1)
    print(f"ALL MATCH ({len(names)} queries)")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
