#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.queries vs oracleSql (mimics the
driver's DuckDB compare: per query, sort columns by name, sort rows,
compare values). Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

with open(f"{out_dir}/oracle_sql.json") as f:
    oracles = json.load(f)

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = 0
for name in sorted(oracles):
    res_dir = f"{out_dir}/{name}"
    files = glob.glob(f"{res_dir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    spark_df = canon(pd.read_parquet(res_dir))
    try:
        duck_df = canon(con.execute(oracles[name]).df())
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {e}")
        fails += 1
        continue
    if list(spark_df.columns) != list(duck_df.columns):
        print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
        fails += 1
        continue
    if len(spark_df) != len(duck_df):
        print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}")
        fails += 1
        continue
    ok = True
    for c in spark_df.columns:
        a, b = spark_df[c], duck_df[c]
        # Dtype-KIND drift is a driver-hash failure even when values are
        # numerically identical (e.g. DuckDB SUM(BIGINT) -> HUGEINT ->
        # pandas float64 vs Spark int64). The driver hashes exact values
        # per dtype, so an int-vs-float kind mismatch ships red; fail it
        # here so this tool predicts the driver. (round-3 verdict #2)
        if a.dtype.kind != b.dtype.kind:
            print(f"FAIL {name}.{c}: dtype kind drift spark={a.dtype} "
                  f"duck={b.dtype} — driver hash will mismatch; "
                  f"CAST the oracle SQL to match Spark's type")
            ok = False
            continue
        if a.dtype.kind == 'f' or b.dtype.kind == 'f':
            aa, bb = a.astype(float).values, b.astype(float).values
            exact = np.array_equal(aa, bb, equal_nan=True)
            close = np.allclose(aa, bb, rtol=1e-9, atol=1e-12, equal_nan=True)
            if not exact:
                if close:
                    print(f"WARN {name}.{c}: close but not exact "
                          f"(max diff {np.nanmax(np.abs(aa-bb))})")
                else:
                    print(f"FAIL {name}.{c}: float mismatch")
                    ok = False
        else:
            if not a.astype(str).equals(b.astype(str)):
                diff = (a.astype(str) != b.astype(str))
                i = int(np.argmax(diff.values))
                print(f"FAIL {name}.{c}: mismatch at row {i}: "
                      f"{a.iloc[i]!r} vs {b.iloc[i]!r} (dtype {a.dtype}/{b.dtype})")
                ok = False
    if not ok:
        fails += 1
    else:
        print(f"OK   {name} ({len(spark_df)} rows)")

print(f"\n{len(oracles) - fails}/{len(oracles)} queries match")
sys.exit(1 if fails else 0)
