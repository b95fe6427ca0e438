#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py [sf_dir] [out_dir]

Runs after `sbt -batch "runMain graft.Verify <sf_dir> <out_dir>"`:
for each query result parquet in <out_dir>, runs the matching oracle SQL from
oracle_sql.json in DuckDB (tables = the sf_dir parquets, registered by name),
then compares row count, column names (sorted), and a value hash computed the
way a column-name-sorted, row-sorted compare would.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(t).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def norm_cell(v):
    if isinstance(v, float):
        return f"{v:.10g}"
    return str(v)

def frame_sig(df: pd.DataFrame):
    cells = [norm_cell(v) for row in df.itertuples(index=False) for v in row]
    import hashlib
    return hashlib.md5("\x1f".join(cells).encode()).hexdigest()

n_pass = n_fail = n_rowsonly = 0
for d in sorted(glob.glob(f"{out_dir}/*")):
    if not os.path.isdir(d):
        continue
    name = os.path.basename(d)
    spark_df = duckdb.connect().execute(f"SELECT * FROM '{d}/*.parquet'").df()
    if name not in oracles:
        print(f"ROWS-ONLY  {name:24s} rows={len(spark_df)}")
        n_rowsonly += 1
        continue
    try:
        oracle_df = con.execute(oracles[name]).df()
    except Exception as e:
        print(f"ORACLE-ERR {name:24s} {type(e).__name__}: {str(e)[:160]}")
        n_fail += 1
        continue
    a, b = canon(spark_df), canon(oracle_df)
    problems = []
    if list(a.columns) != list(b.columns):
        problems.append(f"cols spark={list(a.columns)} oracle={list(b.columns)}")
    if len(a) != len(b):
        problems.append(f"rows spark={len(a)} oracle={len(b)}")
    if not problems and frame_sig(a) != frame_sig(b):
        diff = (a.astype(str) != b.astype(str))
        bad = diff.any(axis=1)
        idx = list(a.index[bad])[:3]
        detail = []
        for i in idx:
            for c in a.columns:
                if str(a.at[i, c]) != str(b.at[i, c]):
                    detail.append(f"row{i} {c}: spark={a.at[i, c]!r} oracle={b.at[i, c]!r}")
        problems.append("hash mismatch: " + "; ".join(detail[:4]))
    if problems:
        print(f"FAIL       {name:24s} " + " | ".join(problems))
        n_fail += 1
    else:
        print(f"PASS       {name:24s} rows={len(a)}")
        n_pass += 1

missing = set(oracles) - {os.path.basename(d) for d in glob.glob(f'{out_dir}/*') if os.path.isdir(d)}
for m in sorted(missing):
    print(f"NO-RESULT  {m}")
    n_fail += 1
print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
sys.exit(1 if n_fail else 0)
