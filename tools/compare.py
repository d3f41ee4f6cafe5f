#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate:
runs DuckDB oracle SQL against the sf tables and compares with the
parquet written by graft.Verify. Column-name-sorted, value-hash compare."""
import sys, json, glob, hashlib
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

import os
if os.path.exists(f"{outdir}/SUBSET_MARKER"):
    print(f"WARNING: {outdir} is a SUBSET run (SPARK_GRAFT_ONLY) — "
          "NOT a full verification:")
    print(open(f"{outdir}/SUBSET_MARKER").read())

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails, passes = [], []
for name, sql in sorted(oracle.items()):
    try:
        got = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
    except Exception as e:
        fails.append((name, f"spark output missing: {e}")); continue
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        fails.append((name, f"oracle sql error: {e}")); continue
    # driver-style: sort columns by name
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        fails.append((name, f"schema mismatch: {list(got.columns)} vs {list(exp.columns)}")); continue
    if len(got) != len(exp):
        fails.append((name, f"rowcount {len(got)} vs {len(exp)}")); continue
    def h(df):
        return hashlib.md5(df.to_csv(index=False, float_format="%.6f").encode()).hexdigest()
    if h(got) != h(exp):
        # find first differing row for debugging
        diff = None
        for i in range(len(got)):
            if got.iloc[i].to_json() != exp.iloc[i].to_json():
                diff = f"row {i}: got={got.iloc[i].to_dict()} exp={exp.iloc[i].to_dict()}"
                break
        fails.append((name, f"value hash mismatch; {diff}")); continue
    passes.append(name)

print(f"PASS {len(passes)}: {' '.join(passes)}")
for name, why in fails:
    print(f"FAIL {name}: {why}")
sys.exit(1 if fails else 0)
