"""Faithful CORRECTNESS_r{N} simulation under the driver's EXACT
environment: a PLAIN SparkSession (no tuned confs — shuffle.partitions
200, default broadcast threshold, no Arrow conf) running every
declared query against its DuckDB oracle via the Arrow fetch path.

compare_oracle.py uses the tuned session (fast, for iteration); this
script is the pre-round paranoia pass — differences between the two
environments (conf-sensitive plans, session-state leaks, timezone
assumptions) show up here first.

Usage: python tools/driver_sim.py
"""
import sys, json
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
import duckdb
spark = SparkSession.builder.master("local[8]").getOrCreate()  # plain
import __spark_entry__ as m
from nessus_client_etl_scripts_spark.catalog import TESTDATA_TABLES
sf = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in TESTDATA_TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
qs, oracles = m.queries(), m.oracle_sql()
bad = []
for name, fn in qs.items():
    try:
        sdf = fn(spark, sf)
        s_cols = sorted(sdf.columns)
        s_rows = sorted(
            tuple(str(r[c]) for c in s_cols) for r in sdf.collect()
        )
    except Exception as e:
        bad.append((name, f"spark: {type(e).__name__} {e}"[:160])); continue
    if name not in oracles:
        print(f"rows-only {name}: {len(s_rows)}"); continue
    try:
        tbl = con.execute(oracles[name]).fetch_arrow_table()
        o_cols = sorted(tbl.column_names)
        o_rows = sorted(
            tuple(str(d[c]) for c in o_cols) for d in tbl.to_pylist()
        )
    except Exception as e:
        bad.append((name, f"duckdb: {e}"[:160])); continue
    if s_cols != o_cols or len(s_rows) != len(o_rows):
        bad.append((name, f"shape: {s_cols}/{len(s_rows)} vs {o_cols}/{len(o_rows)}")); continue
    if s_rows != o_rows:
        i = next(i for i,(a,b) in enumerate(zip(s_rows,o_rows)) if a!=b)
        bad.append((name, f"values: {s_rows[i]} vs {o_rows[i]}"[:200])); continue
print(f"\n{len(bad)} problems")
for n, e in bad: print("FAIL", n, e)
