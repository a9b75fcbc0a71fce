"""Drive __spark_entry__ exactly as the driver would: fresh process,
own SparkSession, entry() smoke + per-query oracle comparison."""
import sys, time
sys.path.insert(0, "/root/repo")
import importlib.util
spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false")
         .appName("driver-sim").getOrCreate())

t0 = time.time()
df = mod.entry(spark)
rows = df.collect()
print(f"entry: {len(rows)} rows, schema={df.schema.simpleString()} in {time.time()-t0:.1f}s")
assert len(rows) > 0

import duckdb
con = duckdb.connect()
SF = "/root/testdata/sf0.01"
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

qs, osql = mod.queries(), mod.oracle_sql()
import pandas as pd
fails = []
for name in sorted(qs):
    t0 = time.time()
    a = qs[name](spark, SF).toPandas()
    if name in osql:
        b = con.execute(osql[name]).df()
        cols = sorted(a.columns)
        ok = sorted(b.columns) == cols and len(a) == len(b)
        if ok:
            an = a[cols].sort_values(cols, na_position="last").reset_index(drop=True)
            bn = b[cols].sort_values(cols, na_position="last").reset_index(drop=True)
            try:
                pd.testing.assert_frame_equal(an, bn, check_dtype=False, rtol=0, atol=1e-9)
            except AssertionError as e:
                ok = False
        status = "MATCH" if ok else "MISMATCH"
        if not ok: fails.append(name)
    else:
        status = "rows-only"
    print(f"{name:24s} {len(a):7d} rows  {status}  {time.time()-t0:.1f}s")
print("FAILURES:", fails if fails else "none")
sys.exit(1 if fails else 0)
