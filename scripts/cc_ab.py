"""A/B the two r2-verdict suspects for the cc_conv regression (9.3 -> 16.3 s):

  1. partition_edges' sortWithinPartitions — CC's shrinking frontier never
     amortizes the one-time sort the way PageRank's static scatter does.
  2. spark.cleaner.periodicGC.interval=30s — several forced full driver
     GCs land inside a 16 s query.

One configuration per fresh process (same rule as bench.py --scaling):
    python scripts/cc_ab.py {sort|nosort} {30s|5min}
Prints one JSON line with the wall time.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sort_flag, gc = sys.argv[1], sys.argv[2]

import chaos_spark.algos.cc as ccmod  # noqa: E402
from chaos_spark import harness  # noqa: E402
from chaos_spark.graph import partition_edges as _pe  # noqa: E402
from chaos_spark.session import get_spark  # noqa: E402

if sort_flag == "nosort":
    ccmod.partition_edges = lambda e, p, by="src", sort=True: _pe(e, p, by=by, sort=False)

spark = get_spark(
    f"cc-ab-{sort_flag}-{gc}",
    master="local[32]",
    shuffle_partitions=32,
    extra_conf={
        "spark.cleaner.periodicGC.interval": gc,
        "spark.driver.memory": "32g",
        "spark.local.dir": "/dev/shm/chaos-spark-local",
    },
)
e = harness.part_edges(spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")).persist()
n = e.count()
t0 = time.time()
res = ccmod.connected_components(spark, e, max_iters=100, num_edges=n)
wall = time.time() - t0
print(json.dumps({
    "sort": sort_flag, "gc": gc, "cc_conv_sec": round(wall, 2),
    "supersteps": res.supersteps,
    "iter_sec": round(res.total_seconds, 2),
}))
