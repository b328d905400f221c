#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB with
views over <sfDir>/*.parquet, load the Spark parquet result, sort columns by
name, and compare rows / schema / values.
"""
import functools, json, sys, glob, math

# line-flush so progress is visible when piped (sbt/tee/background logs)
print = functools.partial(print, flush=True)
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df

def values_equal(a, b):
    # array-valued cells (numpy arrays / lists) compare element-wise
    if hasattr(a, "tolist"):
        a = a.tolist()
    if hasattr(b, "tolist"):
        b = b.tolist()
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(
            values_equal(x, y) for x, y in zip(a, b))
    if a is b:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if a is None or b is None or a != a or b != b:  # NaN/None mix
        an = a is None or (isinstance(a, float) and math.isnan(a))
        bn = b is None or (isinstance(b, float) and math.isnan(b))
        return an and bn
    return a == b

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            ddf = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_bad += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        sdf = pd.concat([pq.read_table(f).to_pandas() for f in sorted(files)])
        ddf, sdf = norm(ddf), norm(sdf)
        if list(ddf.columns) != list(sdf.columns):
            print(f"FAIL {name}: columns duckdb={list(ddf.columns)} spark={list(sdf.columns)}")
            n_bad += 1
            continue
        if len(ddf) != len(sdf):
            print(f"FAIL {name}: rows duckdb={len(ddf)} spark={len(sdf)}")
            n_bad += 1
            continue
        dtypes_d = [str(t) for t in ddf.dtypes]
        dtypes_s = [str(t) for t in sdf.dtypes]
        schema_note = "" if dtypes_d == dtypes_s else f" [dtypes differ: duckdb={dtypes_d} spark={dtypes_s}]"
        bad = 0
        dv, sv = ddf.values.tolist(), sdf.values.tolist()
        for i, (dr, sr) in enumerate(zip(dv, sv)):
            for j, (x, y) in enumerate(zip(dr, sr)):
                if not values_equal(x, y):
                    if bad == 0:
                        print(f"FAIL {name}: row {i} col {ddf.columns[j]}: duckdb={x!r} spark={y!r}")
                    bad += 1
        if bad:
            print(f"FAIL {name}: {bad} mismatched cells{schema_note}")
            n_bad += 1
        else:
            print(f"OK   {name}: {len(ddf)} rows{schema_note}")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
