#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB against the sfDir parquet tables and diff against the Spark parquet
dumps produced by graft.Verify. Usage: check_oracle.py <sfDir> <outDir>"""
import sys, os, json, glob
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    pq = os.path.join(outdir, name)
    files = glob.glob(pq + "/*.parquet")
    if not files:
        print(f"MISSING spark output: {name}"); fail += 1; continue
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"ORACLE ERROR {name}: {e}"); fail += 1; continue
    got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
    exp = exp.reindex(sorted(exp.columns), axis=1).reset_index(drop=True)
    got = got.reindex(sorted(got.columns), axis=1).reset_index(drop=True)
    if list(exp.columns) != list(got.columns):
        print(f"SCHEMA MISMATCH {name}: oracle={list(exp.columns)} spark={list(got.columns)}")
        fail += 1; continue
    if len(exp) != len(got):
        print(f"ROWCOUNT MISMATCH {name}: oracle={len(exp)} spark={len(got)}")
        fail += 1; continue
    # driver-style value hash: stringify everything, then sort rows by all
    # columns (the driver sorts each frame before hashing — see the
    # sort_values in CORRECTNESS_r01's mm_frame_dups traceback), so the
    # compare is row-order-insensitive as long as dtypes line up
    es = exp.astype(str).sort_values(list(exp.columns)).reset_index(drop=True)
    gs = got.astype(str).sort_values(list(got.columns)).reset_index(drop=True)
    if not es.equals(gs):
        neq = (es != gs).any(axis=1)
        print(f"VALUE MISMATCH {name}: {neq.sum()} rows differ; first:")
        idx = neq.idxmax()
        print("  oracle:", es.iloc[idx].to_dict())
        print("  spark :", gs.iloc[idx].to_dict())
        fail += 1; continue
    print(f"OK {name} ({len(exp)} rows)")
    ok += 1
print(f"\n{ok} ok, {fail} failed")
sys.exit(1 if fail else 0)
