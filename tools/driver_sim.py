"""Driver simulation (the /verify recipe, committed): plain
SparkSession from a scratch cwd, all registered queries vs DuckDB
oracles at $SIM_SF_DIR (default sf0.01, the driver's correctness SF),
order-insensitive exact compare — mirrors CORRECTNESS_r{N} generation.

Run:  cd /tmp && python /root/repo/tools/driver_sim.py
"""
import sys, os, json

os.chdir("/tmp")
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
import __spark_entry__ as em
import duckdb
import pandas as pd

SF = os.environ.get("SIM_SF_DIR", "/root/testdata/sf0.01")
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

rows = em.entry(spark).collect()
print(f"entry: {len(rows)} rows", flush=True)

q, o = em.queries(), em.oracle_sql()
fail = []
for name, fn in q.items():
    try:
        sdf = fn(spark, SF).toPandas()
        if name not in o:
            print(f"{name}: rows-only {len(sdf)}", flush=True)
            continue
        odf = con.execute(o[name]).fetchdf()
        s = sdf[sorted(sdf.columns)]
        d = odf[sorted(odf.columns)]
        if list(s.columns) != list(d.columns):
            fail.append((name, f"schema {list(s.columns)} vs {list(d.columns)}"))
            print(f"{name}: SCHEMA MISMATCH", flush=True)
            continue
        if len(s) != len(d):
            fail.append((name, f"rows {len(s)} vs {len(d)}"))
            print(f"{name}: ROWS {len(s)} vs {len(d)}", flush=True)
            continue
        s2 = s.astype(str).sort_values(by=list(s.columns)).reset_index(drop=True)
        d2 = d.astype(str).sort_values(by=list(d.columns)).reset_index(drop=True)
        if not s2.equals(d2):
            neq = (s2 != d2).any(axis=1)
            fail.append((name, f"values differ in {int(neq.sum())} rows"))
            print(f"{name}: VALUES differ; first:\n{s2[neq].head(3)}\nvs\n{d2[neq].head(3)}", flush=True)
        else:
            print(f"{name}: OK {len(s)} rows", flush=True)
    except Exception as e:
        fail.append((name, f"ERROR {type(e).__name__}: {e}"))
        print(f"{name}: ERROR {type(e).__name__}: {str(e)[:300]}", flush=True)

print(json.dumps({"failures": fail}, default=str), flush=True)
print("ALL GREEN" if not fail else f"{len(fail)} FAILURES", flush=True)
spark.stop()
