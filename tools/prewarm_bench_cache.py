"""One-off cache pre-warm for the bench's heavy inputs (run at local[32]).

Builds, into the same /tmp cache bench.py uses:
  1. the second-scale (~33M-edge) transcript graph + vertex table
     (SCALING_CONVS_BSP2 = 1.6M conversations),
  2. the bsp graph encodings for BOTH scaling graphs under the round-5
     fingerprint-keyed prep naming (the round-4 subtrees predate the
     input-fingerprint contract and are ignored by design).

Idempotent: everything keys off _SUCCESS / _PREP_DONE markers, so re-running
is cheap. This is the cluster pattern the bench assumes — one
full-parallelism prep job whose output later (smaller) jobs mmap — paid
outside any measured window.

Usage: python tools/prewarm_bench_cache.py [convs ...]  (default: 400000 1600000)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuses ensure_edges/verts_of + CACHE layout)
from elektra_spark.operators.pagerank import pagerank  # noqa: E402
from elektra_spark.session import get_spark  # noqa: E402


def main():
    convs = [int(a) for a in sys.argv[1:]] or [400_000, 1_600_000]
    hi = bench.SCALING_PAIR[1]
    os.makedirs(bench.CACHE, exist_ok=True)
    spark = get_spark("prewarm", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    for n in convs:
        t0 = time.time()
        edges_path = bench.ensure_edges(spark, n)
        print(f"edges conv{n}: ready in {time.time() - t0:.0f}s", flush=True)
        t0 = time.time()
        prep_dir = f"{bench.CACHE}/bsp_prep_conv{n}_b{hi}"
        pagerank(
            spark.read.parquet(edges_path),
            vertices=spark.read.parquet(bench.verts_of(edges_path)),
            n_iter=1, kernel="bsp", num_buckets=hi, bsp_prep_dir=prep_dir,
        ).count()
        print(f"bsp prep conv{n} (b={hi}): ready in {time.time() - t0:.0f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
