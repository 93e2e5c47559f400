#!/usr/bin/env python3
"""Local simulation of the driver's correctness gate: for each SparkEntry
query, load the Verify parquet output and the DuckDB oracle result, sort
columns by name and rows by all columns, and compare exactly."""
import json, sys, glob
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"{name}: MISSING spark output"); fails.append(name); continue
    spark_df = pd.concat([pd.read_parquet(f) for f in files])
    try:
        duck_df = con.sql(sql).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {str(e)[:200]}"); fails.append(name); continue
    a = spark_df.reindex(sorted(spark_df.columns), axis=1)
    b = duck_df.reindex(sorted(duck_df.columns), axis=1)
    if list(a.columns) != list(b.columns):
        print(f"{name}: COLUMN MISMATCH spark={list(a.columns)} duck={list(b.columns)}")
        fails.append(name); continue
    if len(a) != len(b):
        print(f"{name}: ROWCOUNT MISMATCH spark={len(a)} duck={len(b)}")
        fails.append(name); continue
    a = a.sort_values(by=list(a.columns), na_position="first").reset_index(drop=True)
    b = b.sort_values(by=list(b.columns), na_position="first").reset_index(drop=True)
    # normalize dtypes for comparison
    for c in a.columns:
        if a[c].dtype != b[c].dtype:
            try:
                a[c] = a[c].astype("float64"); b[c] = b[c].astype("float64")
            except Exception:
                a[c] = a[c].astype(str); b[c] = b[c].astype(str)
    eq = a.equals(b)
    if not eq:
        diff = (a != b) & ~(a.isna() & b.isna())
        nbad = diff.any(axis=1).sum()
        print(f"{name}: VALUE MISMATCH ({nbad}/{len(a)} rows differ)")
        bad_idx = diff.any(axis=1)
        print("  spark:", a[bad_idx].head(3).to_dict("records"))
        print("  duck :", b[bad_idx].head(3).to_dict("records"))
        fails.append(name)
    else:
        print(f"{name}: OK ({len(a)} rows)")

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
