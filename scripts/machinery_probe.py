"""Spark's own per-task Python-runner machinery cost vs parallelism.

Engine-INDEPENDENT control for the scaling gate: times a 64-task no-op
mapInPandas stage (drain input, yield 1 row) and the same stage emitting a
blob row, at a given local[N]. Findings on this host (medians of 7):

  local[2]  noop 4.30 s   -> 134 ms/task
  local[4]  noop 2.12 s   -> 133 ms/task
  local[8]  noop 1.23 s   -> 154 ms/task
  local[16] noop 0.92 s   -> 230 ms/task

i.e. Spark's task machinery itself scales at 0.87 from 2->8 cores but
0.58 from 4->16: local[16] pairs 16 JVM task threads with 16 Python
workers = 32 busy threads saturating the host's 32 vCPUs, so the 4N=16
leg of a single-host N-vs-4N proxy measures host saturation, not engine
scaling. (The 130 ms/task floor itself was pyspark's per-task
importlib.invalidate_caches() re-reading every sys.path zip directory —
see chaos_spark.shipping.worker_fastpath, which removes it for engine
kernels; this probe intentionally does NOT install the fastpath, so it
records the stock-Spark machinery curve.)

Usage: python scripts/machinery_probe.py CPUS
"""
import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("CHAOS_AQE", "off")
from chaos_spark.session import get_spark
import pandas as pd
cpus = int(sys.argv[1])
spark = get_spark(f"noop-{cpus}", master=f"local[{cpus}]", shuffle_partitions=64,
                  extra_conf={"spark.driver.memory": "8g"})
df = spark.range(64, numPartitions=64).localCheckpoint(eager=True)

def noop(batches):
    for pdf in batches:
        yield pd.DataFrame({"x": [1]})

def blob(batches):
    import numpy as np
    for pdf in batches:
        yield pd.DataFrame({"x": [1], "b": [np.zeros(37000).tobytes()]})

for name, fn, schema in (("noop", noop, "x int"), ("blob", blob, "x int, b binary")):
    for _ in range(3):
        df.mapInPandas(fn, schema=schema).agg({"x": "count"}).first()
    ts = []
    for _ in range(7):
        t0 = time.time()
        df.mapInPandas(fn, schema=schema).agg({"x": "count"}).first()
        ts.append(round(time.time() - t0, 3))
    print(name, sorted(ts)[3], ts)
