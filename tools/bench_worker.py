"""Subprocess worker for bench.py: one clean JVM per invocation.

Usage: python tools/bench_worker.py <master_cores> <edges_parquet> <n_iter>
       <out_json> [mode] [verts_parquet] [bsp_edges_parquet] [bsp_verts_parquet]
mode: pr | cc | bsp | df | dfgate | dfcc | both (default both).
``df`` runs only the df-kernel PageRank — the cheap window variant: the
gated PR statistic wants as many matched windows as the budget carries,
while CC's (comfortably passing) efficiency needs only the first window.
``dfgate`` is the long-lived-executor variant of ``df``: ONE JVM serves
every matched window of the run, with supersteps released in groups of
``n_iter`` by a file handshake under $SPARK_GRAFT_GATE_DIR (bench.py
touches ``go_<cores>_<g>``, the worker runs the group and writes
``done_<cores>_<g>.json`` with the group's step walls + JVM telemetry).
Superstep 1 is the global warm-up (excluded by protocol); the worker
announces it with ``ready_<cores>.json`` and then blocks for group 0. A
fresh-JVM-per-window protocol spent ~70 % of each window on startup +
adjacency prep, which capped a 1500 s budget at ONE window — a single draw
of a statistic whose run-to-run spread straddles the gate. On a cluster
the executors serving superstep 40 are the ones that served superstep 1,
so long-lived measurement JVMs are the faithful model, and the handshake
keeps each window's lo/hi groups temporally adjacent (matched weather).
``dfcc`` is what the gated matched windows run: the df rank-scatter-join
PageRank (the gated N→4N workload — large enough per-superstep JVM
shuffle/agg work for the core ratio to measure parallel execution) plus CC
(two-level csr kernel to fixpoint, twice; run 0 pays Python-worker
page-fault warm-up). ``bsp`` runs only the engine-default bsp kernel
(north-star CSR-blocks-in-Arrow-UDFs superstep; reported throughput pair on
its own larger graph — see BENCH/BASELINE.md for why its core ratio is not
gated). ``both`` runs everything (bsp on ``bsp_edges_parquet`` when given).

Per-superstep JVM telemetry (GC ms, committed heap, storage bytes) is
recorded for the df kernel — the round-3 verdict asked for exactly this
instrumentation after the df superstep measured 4 s <-> 22 s bimodal on
identical code (host fault-stall weather; the probes in bench.py bracket it).
``verts_parquet``: the graph's vertex table (shipped with the edge table, as
in the production catalog) — passing it spares PageRank the 2|E|-row
distinct that would otherwise derive the universe inside the (untimed but
wall-clock-real) prep.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def jvm_stats(spark) -> dict:
    mf = spark.sparkContext._jvm.java.lang.management.ManagementFactory
    gc_ms = 0
    it = mf.getGarbageCollectorMXBeans().iterator()
    while it.hasNext():
        gc_ms += max(0, it.next().getCollectionTime())
    heap = mf.getMemoryMXBean().getHeapMemoryUsage()
    storage = sum(i.memSize() for i in spark.sparkContext._jsc.sc().getRDDStorageInfo())
    return {
        "gc_ms": gc_ms,
        "heap_committed_mb": heap.getCommitted() // (1 << 20),
        "storage_mb": storage // (1 << 20),
    }


def _write_json_atomic(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)  # bench.py never sees a partial file


def _gate_wait(path: str, deadline_s: float, poll_s: float = 0.25) -> None:
    """Block until bench.py touches ``path``. A worker orphaned by a killed
    bench must not idle-hold a 10 GB pre-touched JVM forever — exit hard on
    deadline (bench treats a dead worker like a WorkerTimeout)."""
    t0 = time.time()
    while not os.path.exists(path):
        if time.time() - t0 > deadline_s:
            os._exit(3)
        time.sleep(poll_s)


def main():
    cores, edges_path, n_iter, out_path = sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4]
    mode = sys.argv[5] if len(sys.argv) > 5 else "both"
    verts_path = sys.argv[6] if len(sys.argv) > 6 else None
    bsp_edges_path = sys.argv[7] if len(sys.argv) > 7 else None
    bsp_verts_path = sys.argv[8] if len(sys.argv) > 8 else None
    os.environ["SPARK_GRAFT_CPUS"] = cores
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    # fixed heap for the measurement JVM: a fixed, fully pre-touched heap
    # means steady-state supersteps fault no fresh pages (see
    # extraJavaOptions below). Size is a dial because the pre-touch itself
    # is a 1-2 GB/s-at-best fault burst on this host — and the SECOND
    # pre-touch of a concurrent JVM pair runs at ~50 MB/s once the first
    # has committed its heap (kernel compaction serializes the fault path):
    # measured 26 s alone vs 208 s beside an idle pre-touched peer at 10 g.
    # The df superstep's live set (cached adjacency + one superstep's
    # shuffle) is well under 2 g, so the dfgate pair runs right-sized heaps.
    heap_gb = os.environ.get("SPARK_GRAFT_WORKER_HEAP_GB", "10")
    young_gb = max(1, int(heap_gb) * 2 // 5)
    os.environ.setdefault("SPARK_DRIVER_MEMORY", f"{heap_gb}g")

    from elektra_spark.operators.cc import connected_components
    from elektra_spark.operators.pagerank import pagerank
    from elektra_spark.session import get_spark

    spark = get_spark(
        f"bench-worker-{cores}",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # pin the heap: -Xms = -Xmx + AlwaysPreTouch faults every heap
            # page once at JVM start (untimed prep), and MaxHeapFreeRatio=100
            # forbids the collector from uncommitting between supersteps — so
            # a steady-state superstep never touches a fresh page (re-faulting
            # returned pages costs seconds-per-GB when this sandbox's host is
            # in its memory-compaction phase — the r3 bimodality). ParallelGC
            # over G1: measured 4-core df superstep 4.0 s vs 4.9 s steady with
            # per-step GC ~30 ms vs 100-700 ms — G1's concurrent cycles fight
            # the superstep for cores on the shuffle-churn allocation pattern.
            # ParallelGCThreads defaults to the HOST core count (32) — a
            # local[4] JVM then runs 32-thread GC bursts that thrash under
            # co-tenancy; pin GC parallelism to the measured core count
            # (exactly what a right-sized executor gets on a cluster). The
            # large fixed young gen keeps the shuffle churn dying young:
            # measured 4-core steady 4.3 s / ~25 ms GC vs 5.6 s / 40-270 ms.
            "spark.driver.extraJavaOptions": (
                f"-XX:MaxHeapFreeRatio=100 -Xms{heap_gb}g -XX:+AlwaysPreTouch "
                f"-XX:+UseParallelGC -XX:ParallelGCThreads={cores} -Xmn{young_gb}g "
                + os.environ.get("SPARK_GRAFT_WORKER_EXTRA_JVM", "")
            ),
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

    df_steps: list[float] = []
    df_telemetry: list[dict] = []
    bsp_steps: list[float] = []
    pr_total = 0.0
    bsp_n_edges = 0
    if mode in ("pr", "both", "dfcc", "df"):
        last = jvm_stats(spark)

        def df_hook(s, c, t):
            now = jvm_stats(spark)
            df_steps.append(t)
            df_telemetry.append(
                {
                    "wall_s": round(t, 3),
                    "gc_delta_ms": now["gc_ms"] - last["gc_ms"],
                    "heap_committed_mb": now["heap_committed_mb"],
                    "storage_mb": now["storage_mb"],
                }
            )
            last.update(now)

        t0 = time.time()
        pagerank(
            edges, vertices=verts, n_iter=n_iter, kernel="df", on_superstep=df_hook
        ).count()
        pr_total = time.time() - t0
    if mode == "dfgate":
        gate = os.environ["SPARK_GRAFT_GATE_DIR"]
        n_groups = int(os.environ.get("SPARK_GRAFT_GATE_GROUPS", "6"))
        wait_s = float(os.environ.get("SPARK_GRAFT_GATE_WAIT_SEC", "1800"))
        k = n_iter  # steady supersteps per gated group
        last = jvm_stats(spark)

        def gate_hook(s, c, t):
            now = jvm_stats(spark)
            df_steps.append(t)
            df_telemetry.append(
                {
                    "wall_s": round(t, 3),
                    "gc_delta_ms": now["gc_ms"] - last["gc_ms"],
                    "heap_committed_mb": now["heap_committed_mb"],
                    "storage_mb": now["storage_mb"],
                }
            )
            last.update(now)
            done = len(df_steps)
            if done == 1:
                # step 1 = global warm-up (adjacency materialization rides
                # it); announce readiness, then block for the first group
                _write_json_atomic(
                    f"{gate}/ready_{cores}.json",
                    {"warmup_step_sec": round(t, 3), "n_edges": n_edges},
                )
                _gate_wait(f"{gate}/go_{cores}_0", wait_s)
            elif (done - 1) % k == 0:
                g = (done - 1) // k - 1
                _write_json_atomic(
                    f"{gate}/done_{cores}_{g}.json",
                    {
                        "group": g,
                        "step_secs": df_steps[1 + g * k : 1 + (g + 1) * k],
                        "telemetry": df_telemetry[1 + g * k : 1 + (g + 1) * k],
                    },
                )
                if g + 1 < n_groups:
                    _gate_wait(f"{gate}/go_{cores}_{g + 1}", wait_s)

        t0 = time.time()
        pagerank(
            edges, vertices=verts, n_iter=1 + n_groups * k, kernel="df",
            on_superstep=gate_hook,
        ).count()
        pr_total = time.time() - t0
    if mode in ("pr", "both", "bsp"):
        bsp_edges = spark.read.parquet(bsp_edges_path) if bsp_edges_path else edges
        bsp_n_edges = bsp_edges.count() if bsp_edges_path else n_edges
        bsp_verts = (
            spark.read.parquet(bsp_verts_path) if bsp_verts_path else verts
        )
        # the harness preps the bsp graph encoding ONCE at full parallelism
        # (bench.py phase 0) and both measurement JVMs mmap it — bucket count
        # must then be pinned identically at both levels (identical task set,
        # same rule as the range-file split pinning above)
        prep_dir = os.environ.get("SPARK_GRAFT_BSP_PREP_DIR")
        n_buckets = os.environ.get("SPARK_GRAFT_BSP_BUCKETS")
        pagerank(
            bsp_edges, vertices=bsp_verts, n_iter=max(n_iter, 6), kernel="bsp",
            num_buckets=int(n_buckets) if n_buckets else None,
            bsp_prep_dir=prep_dir,
            on_superstep=lambda s, c, t: bsp_steps.append(t),
        ).count()

    # CC measured twice; both runs reported, min taken. Run 0 pays the
    # one-time Python worker warm-up (this sandbox faults fresh pages at
    # ~10 MB/s and the fault path does not parallelize); the later runs are the
    # steady state a long-lived production executor sits in. Three runs (min
    # taken, same min-steady protocol as the PR supersteps): a matched-weather
    # recheck measured min-of-2 pairs 17.0 s <-> 21.4 s at 4 cores on identical
    # input — run 2 is sometimes still warming, and one extra steady sample per
    # level (~+85 s/pair symmetric, well inside the pair caps) settles it.
    # Input is
    # src-sorted parquet (the engine's edge-table layout), so
    # pre_partitioned=True. The timed action is count() — materializing the
    # label table is the operator's work; the n_components distinct is a
    # separate (untimed) consumer query.
    cc_runs: list[float] = []
    cc_total = 0.0
    n_comp = 0
    if mode in ("cc", "both", "dfcc"):
        labels = None
        for _ in range(int(os.environ.get("SPARK_GRAFT_CC_RUNS", "3"))):
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
                "pr_step_secs": df_steps,
                "pr_df_telemetry": df_telemetry,
                "pr_bsp_step_secs": bsp_steps,
                "bsp_n_edges": bsp_n_edges,
                "cc_total_sec": cc_total,
                "cc_run_secs": cc_runs,
                "n_components": n_comp,
            },
            f,
        )
    spark.stop()


if __name__ == "__main__":
    main()
