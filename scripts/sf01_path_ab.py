"""A/B at sf0.1 (the driver-bench scale): join path vs fused stream path,
COLD — fresh block dir, fresh process — for cc / lpa_10 / pagerank_conv.

The r5 clean bench's extras showed the forced stream legs beating the
join headline legs at sf0.1 (cc 3.06 vs 3.63 s, lpa 3.20 vs 5.60 s), but
those forced legs ran late in a warm session whose earlier legs had
already built (or disk-cached via the _BUILT fingerprint) the v5 blocks.
This probe answers the question the auto router actually faces: from a
cold call, block build included, which path wins at ~10^5 edges?

Usage: python scripts/sf01_path_ab.py [--cpus 32] [--sf-dir ...]
Writes one JSON line. Idle host only.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    # Cold = a block dir no previous run has populated.
    block_dir = tempfile.mkdtemp(prefix="chaos_ab_blocks_")
    os.environ["CHAOS_CSR_BLOCK_DIR"] = block_dir

    from bench import _session  # noqa: E402

    spark = _session(args.cpus, shuffle=32)
    from chaos_spark import harness
    from chaos_spark.algos.cc import connected_components
    from chaos_spark.algos.lpa import label_propagation
    from chaos_spark.algos.pagerank import pagerank
    from chaos_spark.stream import pagerank_stream
    from chaos_spark.stream_algos import cc_stream, lpa_stream

    e_part = harness.part_edges(spark, args.sf_dir).persist()
    n_part = e_part.count()
    e_cs = harness.cust_supp_edges(spark, args.sf_dir).persist()
    n_cs = e_cs.count()

    # JVM warm-up outside every timed window (bench.py's pagerank legs
    # play this role in the real suite).
    pagerank(spark, e_cs, tol=0.0, max_iters=2, num_edges=n_cs)

    out = {"sf_dir": args.sf_dir, "cpus": args.cpus,
           "edges_part": n_part, "edges_cs": n_cs, "runs": {}}

    def leg(name, fn):
        t0 = time.time()
        r = fn()
        out["runs"][name] = {
            "wall_sec": round(time.time() - t0, 3),
            "supersteps": getattr(r, "supersteps", None),
            "iter_sec": round(getattr(r, "total_seconds", 0.0), 3),
        }
        return r

    # Join legs first (bench order), then stream legs cold: the block dir
    # is fresh, so each first stream call pays its own build.
    leg("cc_join", lambda: connected_components(
        spark, e_part, max_iters=100, num_edges=n_part))
    leg("lpa_join", lambda: label_propagation(
        spark, e_part, max_iters=10, num_edges=n_part))
    leg("pagerank_join", lambda: pagerank(
        spark, e_cs, tol=1e-6, max_iters=100, num_edges=n_cs))

    leg("cc_stream_cold", lambda: cc_stream(spark, e_part, max_iters=100))
    leg("lpa_stream_warmblocks", lambda: lpa_stream(
        spark, e_part, max_iters=10))
    leg("pagerank_stream_cold", lambda: pagerank_stream(
        spark, e_cs, tol=1e-6, max_iters=100))

    # Second cold process-equivalent: wipe the block dir and run lpa first
    # so the lpa number also exists without cc having paid the build.
    shutil.rmtree(block_dir, ignore_errors=True)
    os.makedirs(block_dir, exist_ok=True)
    leg("lpa_stream_cold", lambda: lpa_stream(spark, e_part, max_iters=10))
    leg("cc_stream_warmblocks", lambda: cc_stream(
        spark, e_part, max_iters=100))

    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(block_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
