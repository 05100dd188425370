#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify
output against the DuckDB oracle and diff. Usage:
    python3 tools/check_oracle.py <sfDir> <outDir>
(Dev tool only — the engine itself is pure Scala/Spark.)"""
import glob
import json
import sys

import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}")
        fails += 1
        continue
    try:
        got = pd.concat(
            [pd.read_parquet(f) for f in sorted(glob.glob(f"{outdir}/{name}/*.parquet"))],
            ignore_index=True)
    except Exception as e:
        print(f"FAIL {name}: spark output missing: {e}")
        fails += 1
        continue
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
        fails += 1
        continue
    if len(exp) != len(got):
        print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
        fails += 1
        continue
    dt = [(c, str(exp[c].dtype), str(got[c].dtype))
          for c in exp.columns if str(exp[c].dtype) != str(got[c].dtype)]
    if dt:
        print(f"FAIL {name}: dtype skew {dt}")
        fails += 1
        continue
    # exact value compare (incl. float bits) in emitted row order
    bad = None
    for c in exp.columns:
        ev, gv = exp[c], got[c]
        try:
            ev = ev.astype(gv.dtype)
        except Exception:
            pass
        neq = ~((ev == gv) | (ev.isna() & gv.isna()))
        if neq.any():
            i = neq.idxmax()
            bad = (c, i, ev[i], gv[i], int(neq.sum()))
            break
    if bad:
        c, i, e, g, n = bad
        print(f"FAIL {name}: col {c} row {i}: oracle={e!r} spark={g!r} ({n} diffs)")
        fails += 1
    else:
        print(f"PASS {name} ({len(exp)} rows)")
print(f"{'ALL PASS' if fails == 0 else f'{fails} FAILURES'} / {len(oracle)} queries")
sys.exit(1 if fails else 0)
