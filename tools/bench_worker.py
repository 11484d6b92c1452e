"""Subprocess worker for bench.py: one clean JVM per invocation.

Usage: python tools/bench_worker.py <master_cores> <edges_parquet> <n_iter>
       <out_json> [mode] [verts_parquet]
mode: pr | cc | both (default both). Runs PageRank (df kernel) for n_iter
supersteps and/or CC (csr kernel) to fixpoint on the given edge table;
writes per-superstep timings as JSON. ``verts_parquet``: the graph's vertex
table (shipped with the edge table, as in the production catalog) — passing
it spares PageRank the 2|E|-row distinct that would otherwise derive the
universe inside the (untimed but wall-clock-real) prep.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cores, edges_path, n_iter, out_path = sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4]
    mode = sys.argv[5] if len(sys.argv) > 5 else "both"
    verts_path = sys.argv[6] if len(sys.argv) > 6 else None
    os.environ["SPARK_GRAFT_CPUS"] = cores
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")

    from elektra_spark.operators.cc import connected_components
    from elektra_spark.operators.pagerank import pagerank
    from elektra_spark.session import get_spark

    spark = get_spark(
        f"bench-worker-{cores}",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # pin input splits 1:1 to the edge table's 16 range files so BOTH
            # parallelism levels execute the identical task set — on a real
            # cluster the splits are fixed and only executors scale; letting
            # local[1] fuse the input into one mega-split would give it an
            # unfair per-row efficiency edge and confound the N→4N ratio
            "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": "0",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    edges = spark.read.parquet(edges_path)
    n_edges = edges.count()

    verts = spark.read.parquet(verts_path) if verts_path else None

    steps: list[float] = []
    pr_total = 0.0
    if mode in ("pr", "both"):
        t0 = time.time()
        pagerank(
            edges, vertices=verts, n_iter=n_iter, kernel="df",
            on_superstep=lambda s, c, t: steps.append(t),
        ).count()
        pr_total = time.time() - t0

    # CC measured twice; both runs reported, min taken. Run 0 pays the
    # one-time Python worker warm-up (this sandbox faults fresh pages at
    # ~10 MB/s and the fault path does not parallelize); the second run is the
    # steady state a long-lived production executor sits in. (Two runs, not
    # three: the third bought little signal and the round-2 harness overran
    # the driver's bench window.) Input is
    # src-sorted parquet (the engine's edge-table layout), so
    # pre_partitioned=True. The timed action is count() — materializing the
    # label table is the operator's work; the n_components distinct is a
    # separate (untimed) consumer query.
    cc_runs: list[float] = []
    cc_total = 0.0
    n_comp = 0
    if mode in ("cc", "both"):
        labels = None
        for _ in range(2):
            t0 = time.time()
            labels = connected_components(edges, kernel="csr", pre_partitioned=True)
            labels.count()
            cc_runs.append(time.time() - t0)
        cc_total = min(cc_runs)
        n_comp = labels.select("component").distinct().count()

    with open(out_path, "w") as f:
        json.dump(
            {
                "cores": int(cores),
                "n_edges": n_edges,
                "pr_total_sec": pr_total,
                "pr_step_secs": steps,
                "cc_total_sec": cc_total,
                "cc_run_secs": cc_runs,
                "n_components": n_comp,
            },
            f,
        )
    spark.stop()


if __name__ == "__main__":
    main()
