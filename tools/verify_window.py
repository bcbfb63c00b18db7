#!/usr/bin/env python
"""Driver-style correctness check (the /verify skill's script, kept as a
tool): simulate the round driver in a fresh process — plain
SparkSession, sf0.01, canon/compare every registry query against its
DuckDB oracle. Usage: python tools/verify_window.py LO HI (slice of the
queries() registry by position; the driver's own window is 0 50).
"""
import duckdb, datetime, math, json, sys
from pyspark.sql import SparkSession
sys.path.insert(0, "/root/repo")
import __spark_entry__ as e
spark = (SparkSession.builder.master("local[8]")
         .config("spark.ui.enabled","false")
         .config("spark.ui.showConsoleProgress","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
print("entry rows:", e.entry(spark).count())
sf = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
def norm(x):
    if x is None: return None
    if isinstance(x, float): return None if math.isnan(x) else round(x, 4)
    if isinstance(x, datetime.datetime): return x.replace(tzinfo=None).isoformat()
    if isinstance(x, datetime.date): return x.isoformat()
    if hasattr(x, "item"): return norm(x.item())
    return x
def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted([tuple(norm(r[i]) for i in order) for r in rows],
                  key=lambda t: tuple((v is None, str(v)) for v in t))
qs, osql, fails = e.queries(), e.oracle_sql(), 0
lo = int(sys.argv[1]) if len(sys.argv) > 1 else 0
hi = int(sys.argv[2]) if len(sys.argv) > 2 else 50
for name in list(qs)[lo:hi]:
    try:
        sdf = qs[name](spark, sf)
        srows, scols = canon([tuple(r) for r in sdf.collect()], sdf.columns), sorted(sdf.columns)
        if name not in osql:
            print(f"{name}: rows-only {len(srows)}"); continue
        cur = con.execute(osql[name])
        drows = canon(cur.fetchall(), [d[0] for d in cur.description])
        ok = scols == sorted(d[0] for d in cur.description) and srows == drows
        fails += (not ok); print(f"{name}: {'MATCH' if ok else 'MISMATCH'} {len(srows)} rows")
    except Exception as ex:
        fails += 1; print(f"{name}: ERROR {type(ex).__name__}: {str(ex)[:150]}")
print("FAILS:", fails)
