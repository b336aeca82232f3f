#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness compare.

Reads each <outDir>/<name> parquet written by graft.Verify, runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over the sf
tables, sorts columns by name and rows by all columns, and compares
values (exact for ints/strings/decimals, 1e-9 relative for floats).

Usage: scripts/check.py [sfDir] [outDir]
"""
import glob
import json
import math
import os
import sys

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
# bound the oracle engine: the all-pairs similarity CTEs at sf0.1 blow
# past DuckDB's default allocation on a shared sandbox (observed OOM +
# thread-exhaustion crash); both knobs are overridable for bigger boxes
con.execute(f"SET memory_limit='{os.environ.get('GRAFT_DUCKDB_MEM', '24GB')}'")
con.execute(f"SET threads={os.environ.get('GRAFT_DUCKDB_THREADS', '8')}")
for p in glob.glob(f"{SF}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

# GRAFT_CHECK_SKIP=a,b,c — for scale points beyond the driver's gate SF,
# where an ORACLE itself exceeds local DuckDB memory (the all-pairs
# similarity CTEs at sf0.1: 4M ordered-aggregate groups don't spill in
# DuckDB 1.0). Skipped queries are reported, never silently dropped.
SKIP = set(filter(None, os.environ.get("GRAFT_CHECK_SKIP", "").split(",")))

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

# The driver gate hashes typed values EXACTLY; a loose local float
# compare can pass a query the driver will fail (the round-5 PCA flake
# sat inside a 1e-9 tolerance). Default to exact; set GRAFT_CHECK_TOL
# to a relative tolerance only while debugging a known-noisy draft.
TOL = float(os.environ.get("GRAFT_CHECK_TOL", "0"))

def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        if a == b:
            # Python == says -0.0 == 0.0, but the driver hashes the raw
            # bit pattern and distinguishes them (the round-6 PCA red
            # row: DuckDB ROUND emits -0.0, Spark never does). Require
            # matching sign on zeros so the local gate sees what the
            # driver sees.
            if a == 0.0 and math.copysign(1.0, a) != math.copysign(1.0, b):
                return False
            return True
        return TOL > 0 and abs(a - b) <= TOL * max(1.0, abs(a), abs(b))
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if (pd.isna(a) is True) != (pd.isna(b) is True):
            return False
    except (TypeError, ValueError):
        pass
    try:
        return float(a) == float(b)
    except (TypeError, ValueError):
        return str(a) == str(b)

n_pass = n_fail = n_noorc = 0
for d in sorted(glob.glob(f"{OUT}/*/")):
    name = os.path.basename(d.rstrip("/"))
    # Verify writes <outDir>/<name>/_FAILED (with the exception message)
    # when a query crashes — report it as a failure, exactly like the
    # driver gate, instead of letting read_parquet throw.
    marker = os.path.join(d, "_FAILED")
    if os.path.exists(marker):
        msg = open(marker).read().strip()
        print(f"  ✗ {name}: QUERY FAILED: {msg}")
        n_fail += 1
        continue
    got = pd.read_parquet(d)
    if name in SKIP:
        print(f"  ~ {name}: SKIPPED (GRAFT_CHECK_SKIP), rows={len(got)}")
        n_noorc += 1
        continue
    if name not in oracle:
        print(f"  ~ {name}: no oracle, rows={len(got)}")
        n_noorc += 1
        continue
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"  ✗ {name}: ORACLE SQL ERROR: {e}")
        n_fail += 1
        continue
    g, e = norm(got), norm(exp)
    if list(g.columns) != list(e.columns):
        print(f"  ✗ {name}: column mismatch {list(g.columns)} vs {list(e.columns)}")
        n_fail += 1
        continue
    if len(g) != len(e):
        print(f"  ✗ {name}: row count {len(g)} vs {len(e)}")
        n_fail += 1
        continue
    # The driver's compare hashes typed values, so a decimal-vs-double or
    # int64-vs-object dtype split fails it even when values are equal.
    # Surface that locally as a hard failure (round-1 lesson). Integer
    # WIDTHS are equivalent to the driver (round-1 evidence: int32 Spark
    # vs int64 DuckDB columns all hashed equal), so normalize those.
    def canon(dt: str) -> str:
        return "int" if dt.startswith(("int", "uint")) else dt
    dt_bad = [(c, str(g[c].dtype), str(e[c].dtype)) for c in g.columns
              if canon(str(g[c].dtype)) != canon(str(e[c].dtype))]
    if dt_bad:
        print(f"  ✗ {name}: dtype mismatch (spark vs duckdb): {dt_bad}")
        n_fail += 1
        continue
    bad = None
    for c in g.columns:
        gv, ev = g[c].tolist(), e[c].tolist()
        for i, (x, y) in enumerate(zip(gv, ev)):
            if not values_equal(x, y):
                bad = (c, i, x, y)
                break
        if bad:
            break
    if bad:
        c, i, x, y = bad
        print(f"  ✗ {name}: value mismatch col={c} row={i}: spark={x!r} duckdb={y!r}")
        n_fail += 1
    else:
        print(f"  ✓ {name}: {len(g)} rows, {len(g.columns)} cols")
        n_pass += 1

print(f"\n{n_pass} pass, {n_fail} fail, {n_noorc} rows-only")
sys.exit(1 if n_fail else 0)
