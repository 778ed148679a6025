"""Driver-twin oracle check: run EVERY declared query against its DuckDB
oracle at the given SF, compare canonical (sorted, exact) rows.
Usage: PYTHONPATH=. python oracle_check.py <sf_dir> [query ...]"""
import sys, time, math
import duckdb
from pyspark.sql import SparkSession

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
only = set(sys.argv[2:])

spark = (SparkSession.builder.master("local[8]").appName("oracle")
         .config("spark.sql.shuffle.partitions", "16")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entry
qs = entry.queries()
oracles = entry.oracle_sql()

con = duckdb.connect()
for t in ("documents", "events", "lineitem", "orders", "customer",
          "supplier", "nation", "region", "part", "embeddings"):
    import os
    if os.path.exists(f"{sf_dir}/{t}.parquet"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v

fails = []
for name, fn in qs.items():
    if only and name not in only:
        continue
    osql = oracles.get(name)
    t0 = time.time()
    try:
        sdf = fn(spark, sf_dir)
        srows = sorted((tuple(canon(v) for v in r) for r in sdf.collect()), key=repr)
    except Exception as e:
        print(f"{name}: SPARK ERR {type(e).__name__}: {str(e)[:150]}")
        fails.append(name)
        continue
    if osql is None:
        print(f"{name}: rows={len(srows)} (no oracle, rows-only)  [{time.time()-t0:.1f}s]")
        continue
    try:
        orows = sorted((tuple(canon(v) for v in r) for r in con.execute(osql).fetchall()), key=repr)
    except Exception as e:
        print(f"{name}: ORACLE ERR {type(e).__name__}: {str(e)[:150]}")
        fails.append(name)
        continue
    ok = srows == orows
    status = "OK " if ok else "MISMATCH"
    print(f"{name}: {status} rows={len(srows)}/{len(orows)}  [{time.time()-t0:.1f}s]")
    if not ok:
        fails.append(name)
        shown = 0
        for a, b in zip(srows, orows):
            if a != b and shown < 2:
                print("   spark:", a)
                print("   duck :", b)
                shown += 1
        if len(srows) != len(orows):
            print("   row-count differs")
print("FAILS:", fails)
spark.stop()
sys.exit(1 if fails else 0)
