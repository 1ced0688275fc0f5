#!/usr/bin/env python3
"""Local pre-check of SparkEntry.oracleSql vs Verify parquet dumps.

Mirrors the driver's CORRECTNESS gate: for each query, run the oracle SQL
in DuckDB over the sf parquet tables, sort columns by name, sort rows,
and hash-compare against the Spark result parquet. Driver-side tooling
only (duckdb/pyarrow are not dependencies of the library).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, hashlib, math, re
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

# Widths the driver's pandas fetch coerces to float64 (`47` -> `47.0`): a
# value canon built on that frame hashes differently from Spark's BIGINT even
# though fetchall() (and this script's 9-sig-digit float canon, under which
# 47.0 formats as "47") sees identical values. The r8-r10 lesson: t_novelty /
# a_drift_psi were the ONLY two oracles emitting un-CAST HUGEINT and exactly
# the two three-round driver-red queries while this gate certified green.
# A value-level pandas re-check cannot surface the divergence under this
# canon, so the faithful detector is type-level: HARD-FAIL any oracle query
# that emits one of these widths until it is CAST (rule 9 of the SCALE.md
# determinism contract).
_PANDAS_FLOAT_COERCED = {"HUGEINT", "UHUGEINT", "UBIGINT"}

def canon_type(t):
    t = t.upper()
    return "INT" if t in _INT_WIDTHS else t

def describe_rows(con, sql):
    """Raw DESCRIBE rows — one execution feeds both the canon'd type
    compare and the float-coercion screen."""
    return con.execute(f"DESCRIBE {sql}").fetchall()

def canon_cols(rows):
    return sorted((r[0], canon_type(r[1])) for r in rows)

def typed_cols(con, sql):
    return canon_cols(describe_rows(con, sql))

def float_coerced_cols(rows):
    """Columns whose raw DuckDB width the driver's pandas fetch renders
    as float64 — each is a guaranteed driver hash mismatch against a
    Spark integer column and must be CAST in the SQL."""
    return [(r[0], r[1]) for r in rows
            if r[1].upper().split("(")[0] in _PANDAS_FLOAT_COERCED]

# --- canon-margin audit (r9) ---------------------------------------------
# The hash canon prints floats at 9 significant digits. A value that sits
# within a few hundred ulps of a 9-sig-digit rounding boundary can flip its
# canon under cross-engine libm / summation-order noise even though both
# engines computed "the same" number — exactly how a_drift_psi went red on
# the r8 driver while matching bit-for-bit locally. Flag such cells.
CANON_MARGIN_ULPS = 256.0

def canon_margin_ulps(v):
    """Distance (in ulps of v) from v to its nearest 9-sig-digit rounding
    boundary; None when the value is not at risk: zero/inf/nan, or a value
    sitting EXACTLY on a decimal tie (an exact-decimal quotient like x.25 —
    the driver's canon formats both sides' identical doubles through the
    same formatter, so an exact tie cannot diverge)."""
    if v == 0.0 or not math.isfinite(v):
        return None
    from fractions import Fraction
    a = abs(v)
    e = math.floor(math.log10(a))
    af = Fraction(a)
    q = Fraction(10) ** (e - 8)  # quantum between 9-sig-digit representables
    m = af / q
    if m >= 10 ** 9:
        e += 1; q *= 10; m /= 10
    elif m < 10 ** 8:
        e -= 1; q /= 10; m *= 10
    frac = m - math.floor(m)
    if frac == Fraction(1, 2):
        return None                       # exact tie — canon deterministic
    margin = abs(frac - Fraction(1, 2)) * q   # boundaries sit at half-quanta
    return float(margin) / math.ulp(a)

def audit_margins(name, side, cols, rows, warns, cap=3):
    hit = 0
    for r in rows:
        for c, v in zip(cols, r):
            if isinstance(v, float):
                u = canon_margin_ulps(v)
                if u is not None and u < CANON_MARGIN_ULPS:
                    hit += 1
                    if hit <= cap:
                        warns.append(
                            f"{name} [{side}] {c}={v!r} is {u:.0f} ulps from a "
                            f"9-digit canon boundary — cross-engine float noise "
                            f"can flip this cell's hash")
    if hit > cap:
        warns.append(f"{name} [{side}]: {hit - cap} more at-risk cells suppressed")

# Static sweep of the same hazard at the source: a raw double sum()/avg()
# whose argument contains a transcendental (libm-dependent, order-dependent)
# and is neither round()-wrapped nor folded through an exact DECIMAL.
_TRANSCENDENTAL = re.compile(r"\b(ln|log|log2|log10|exp|sqrt|pow|power)\s*\(",
                             re.IGNORECASE)

def _agg_spans(sql):
    for m in re.finditer(r"\b(sum|avg)\s*\(", sql, re.IGNORECASE):
        depth, i = 1, m.end()
        while i < len(sql) and depth > 0:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        yield m.start(), sql[m.end():i - 1]

def audit_oracle_sql(name, sql, warns):
    for start, arg in _agg_spans(sql):
        if not _TRANSCENDENTAL.search(arg):
            continue
        guarded = ("AS DECIMAL" in arg.upper()
                   or "round(" in sql[max(0, start - 48):start].lower())
        if not guarded:
            warns.append(
                f"{name}: raw double aggregate over a transcendental term "
                f"(…{arg[:60]}…) — libm/add-order sensitive; wrap in round() "
                f"or fold through an exact DECIMAL")

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
    bad, warns = [], []
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
            oc_desc = describe_rows(con, oracle[name])
        except Exception as e:
            bad.append((name, f"describe error: {e}"))
            continue
        oc_typed = canon_cols(oc_desc)
        coerced = float_coerced_cols(oc_desc)
        if coerced:
            bad.append((name,
                        "oracle emits pandas-float-coerced integer width(s) "
                        + ", ".join(f"{c}:{t}" for c, t in coerced)
                        + " — CAST(... AS BIGINT) in the oracle SQL "
                        "(driver hashes these as 47.0 != 47)"))
            continue
        if sp_typed != oc_typed:
            bad.append((name, f"schema: spark={sp_typed} oracle={oc_typed}"))
            continue
        if len(sp) != len(oc):
            bad.append((name, f"rows: spark={len(sp)} oracle={len(oc)}"))
            continue
        audit_oracle_sql(name, oracle[name], warns)
        # per-cell margins only matter where the value's provenance is
        # environment-sensitive (libm); decimal/integer-only queries
        # produce bit-identical doubles in any build
        if _TRANSCENDENTAL.search(oracle[name]):
            audit_margins(name, "spark", sp_cols, sp, warns)
            audit_margins(name, "oracle", oc_cols, oc, warns)
        hs, ho = frame_hash(sp_cols, sp), frame_hash(oc_cols, oc)
        if hs != ho:
            bad.append((name, "hash mismatch"))
        else:
            print(f"  {name}: OK ({len(sp)} rows)")
    print()
    if warns:
        print(f"WARN {len(warns)} (canon-robustness, not failures):")
        for w in warns:
            print(f"  {w}")
        print()
    if bad:
        print(f"FAILED {len(bad)}:")
        for n, why in bad:
            print(f"  {n}: {why}")
        sys.exit(1)
    print(f"ALL MATCH ({len(names)} queries)")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
