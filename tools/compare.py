#!/usr/bin/env python3
"""Local pre-verification of SparkEntry oracle pairs.

Usage: python3 tools/compare.py <sfdir> <verify_out_dir>

Mimics a driver-style check: for each query output parquet written by
graft.Verify, run the corresponding oracle SQL in DuckDB over the same
tables, sort columns by name, and compare row-by-row (exact for
ints/strings, tiny epsilon report for floats so we can see whether an
exact hash would also pass).
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

def _eq_obj(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, (list, np.ndarray)) or isinstance(b, (list, np.ndarray)):
        a = list(a) if a is not None else None
        b = list(b) if b is not None else None
        if a is None or b is None or len(a) != len(b):
            return False
        return all(_eq_obj(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return sorted(a.items()) == sorted(b.items())
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (np.isnan(a) and np.isnan(b))
    return a == b

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
results = {}
for name in sorted(oracle):
    sql = oracle[name]
    spark_dir = f"{outdir}/{name}"
    if not os.path.isdir(spark_dir):
        results[name] = "MISSING_SPARK_OUTPUT"
        continue
    try:
        duck = con.sql(sql).df()
    except Exception as e:
        results[name] = f"ORACLE_ERROR: {e}"
        continue
    files = glob.glob(f"{spark_dir}/*.parquet")
    spark = pd.concat([pq.read_table(f).to_pandas() for f in sorted(files)],
                      ignore_index=True)
    duck = duck.reindex(sorted(duck.columns), axis=1)
    spark = spark.reindex(sorted(spark.columns), axis=1)
    if list(duck.columns) != list(spark.columns):
        results[name] = f"SCHEMA_COLS: duck={list(duck.columns)} spark={list(spark.columns)}"
        continue
    if len(duck) != len(spark):
        results[name] = f"ROWCOUNT: duck={len(duck)} spark={len(spark)}"
        continue
    bad = None
    for c in duck.columns:
        dv, sv = duck[c], spark[c]
        # normalize timestamps to naive ns
        for v in (dv, sv):
            pass
        if pd.api.types.is_datetime64_any_dtype(dv) or pd.api.types.is_datetime64_any_dtype(sv):
            dvn = pd.to_datetime(dv).dt.tz_localize(None) if getattr(dv.dtype, 'tz', None) else pd.to_datetime(dv)
            svn = pd.to_datetime(sv).dt.tz_localize(None) if getattr(sv.dtype, 'tz', None) else pd.to_datetime(sv)
            eq = dvn.equals(svn) or (dvn.values == svn.values).all()
            if not eq:
                m = (dvn.values != svn.values)
                bad = (c, int(np.argmax(m)), dvn[m][:3].tolist(), svn[m][:3].tolist())
                break
        elif dv.dtype == object or sv.dtype == object:
            dvo, svo = dv.tolist(), sv.tolist()
            neq = [i for i, (a, b) in enumerate(zip(dvo, svo))
                   if not _eq_obj(a, b)]
            if neq:
                i = neq[0]
                bad = (c, i, dvo[i], svo[i])
                break
        elif np.issubdtype(dv.dtype, np.floating) or np.issubdtype(sv.dtype, np.floating):
            a, b = dv.astype(float).values, sv.astype(float).values
            exact = np.array_equal(a, b, equal_nan=True)
            if not exact:
                close = np.allclose(a, b, rtol=0, atol=1e-9, equal_nan=True)
                m = ~((a == b) | (np.isnan(a) & np.isnan(b)))
                i = int(np.argmax(m))
                bad = (c, i, a[i], b[i], "CLOSE" if close else "FAR")
                break
        else:
            if not np.array_equal(dv.values, sv.values):
                m = dv.values != sv.values
                i = int(np.argmax(m))
                bad = (c, i, dv.values[i], sv.values[i])
                break
    results[name] = "OK" if bad is None else f"VALUE_DIFF {bad}"

n_ok = sum(1 for v in results.values() if v == "OK")
for k, v in results.items():
    print(("PASS " if v == "OK" else "FAIL ") + k + ("" if v == "OK" else f"  -> {v}"))
print(f"\n{n_ok}/{len(results)} oracle-checked queries match")
# also list rows-only (no-oracle) outputs
for d in sorted(glob.glob(f"{outdir}/q*")):
    nm = os.path.basename(d)
    if nm not in oracle and os.path.isdir(d):
        files = glob.glob(f"{d}/*.parquet")
        n = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        print(f"ROWS-ONLY {nm}: {n} rows")
