#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: compare graft.Verify output
parquet against DuckDB running SparkEntry.oracleSql on the same tables.

Usage: python3 tools/parity.py [sfDir] [outDir]
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails, passes, skips = [], [], []
for name in sorted(os.listdir(out)):
    pdir = os.path.join(out, name)
    if not os.path.isdir(pdir):
        continue
    files = glob.glob(f"{pdir}/*.parquet")
    mine = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
    if name not in oracle:
        skips.append((name, len(mine)))
        continue
    try:
        ref = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    # driver semantics: sort columns by name, then compare values
    mine = mine.reindex(sorted(mine.columns), axis=1)
    ref = ref.reindex(sorted(ref.columns), axis=1)
    if list(mine.columns) != list(ref.columns):
        fails.append((name, f"columns differ: mine={list(mine.columns)} ref={list(ref.columns)}"))
        continue
    if len(mine) != len(ref):
        fails.append((name, f"row count differs: mine={len(mine)} ref={len(ref)}"))
        continue
    # sort rows canonically for comparison
    def canon(df):
        return df.sort_values(by=list(df.columns), ignore_index=True, kind="mergesort",
                              na_position="last")
    try:
        m, r = canon(mine), canon(ref)
    except Exception:
        m, r = mine.reset_index(drop=True), ref.reset_index(drop=True)
    bad = None
    for c in m.columns:
        a, b = m[c], r[c]
        if a.dtype != b.dtype:
            # The driver's hash normalizes int widths but NOT float-vs-int
            # (a DuckDB HUGEINT comes back float64 and hash-mismatches an
            # int64 parquet column even when values are equal) — treat
            # cross-kind coercion as a failure, like the driver does.
            a_f, b_f = np.issubdtype(a.dtype, np.floating), np.issubdtype(b.dtype, np.floating)
            if a_f != b_f:
                bad = f"float/int dtype mismatch col {c}: {a.dtype} vs {b.dtype} (driver hash would differ)"
                break
            try:
                b = b.astype(a.dtype)
            except Exception:
                bad = f"dtype mismatch col {c}: {a.dtype} vs {r[c].dtype}"
                break
        if a.dtype == object:
            eq = (a.astype(str) == b.astype(str)) | (a.isna() & b.isna())
        elif np.issubdtype(a.dtype, np.floating):
            eq = (a.values == b.values) | (a.isna() & b.isna())  # EXACT float match
        else:
            eq = (a == b) | (a.isna() & b.isna())
        if not eq.all():
            i = int(np.argmin(eq.values))
            bad = f"col {c} differs at row {i}: mine={a.iloc[i]!r} ref={b.iloc[i]!r} (n_bad={int((~eq).sum())})"
            break
    if bad:
        fails.append((name, bad))
    else:
        passes.append((name, len(mine)))

for n, c in passes:
    print(f"PASS  {n} ({c} rows)")
for n, c in skips:
    print(f"SKIP  {n} (no oracle, {c} rows)")
for n, msg in fails:
    print(f"FAIL  {n}: {msg}")
print(f"\n{len(passes)} pass, {len(skips)} no-oracle, {len(fails)} fail")
sys.exit(1 if fails else 0)
