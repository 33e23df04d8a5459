#!/usr/bin/env python
"""Quick per-query parity check — the verify skill's single-query loop.

Usage: python scripts/qcheck.py <query_name> [...]   (env QSF overrides
the sf dir, default /root/testdata/sf0.01). Prints MATCH/MISMATCH per
query with per-row diffs on mismatch; shares the hash/normalization
code with scripts/driver_sim.py so a MATCH here predicts the driver.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import duckdb
from pyspark.sql import SparkSession
from driver_sim import hash_rows, TABLES
import __spark_entry__ as E

names = sys.argv[1:]
sf = os.environ.get("QSF", "/root/testdata/sf0.01")
spark = (SparkSession.builder.master("local[8]")
         .config("spark.ui.enabled","false").appName("qcheck").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
con = duckdb.connect()
for t in TABLES:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
qs, oracles = E.queries(), E.oracle_sql()
bad = 0
for name in names:
    try:
        sdf = qs[name](spark, sf)
        rows = [tuple(r) for r in sdf.collect()]
        s_hash = hash_rows(sdf.columns, rows)
        if name not in oracles:
            print(f"{name}: rows-only, {len(rows)} rows"); continue
        cur = con.execute(oracles[name])
        drows = cur.fetchall()
        d_hash = hash_rows([c[0] for c in cur.description], drows)
        ok = s_hash == d_hash
        print(f"{name}: {'MATCH' if ok else 'MISMATCH'} spark={len(rows)} oracle={len(drows)}")
        if not ok:
            bad += 1
            sc = sorted(sdf.columns); dc = sorted(c[0] for c in cur.description)
            if sc != dc: print("  cols:", sc, "vs", dc)
            else:
                from driver_sim import norm
                idx=[sdf.columns.index(c) for c in sc]; didx=[[c[0] for c in cur.description].index(c) for c in dc]
                sset = sorted("|".join(norm(r[i]) for i in idx) for r in rows)
                dset = sorted("|".join(norm(r[i]) for i in didx) for r in drows)
                sonly=[x for x in sset if x not in set(dset)][:3]
                donly=[x for x in dset if x not in set(sset)][:3]
                print("  spark-only:", sonly)
                print("  duck-only:", donly)
    except Exception as e:
        bad += 1
        import traceback; traceback.print_exc()
        print(f"{name}: ERROR {e}")
spark.stop()
sys.exit(1 if bad else 0)
