"""spark-submit entry point (M6 packaging).

Cluster usage (the production invocation shape):

    python tools/make_pyfiles.py           # → dist/elektra_spark.zip
    spark-submit --master <cluster> \\
        --py-files dist/elektra_spark.zip \\
        dist/main.py pagerank --n-iter 20 \\
        --edges /path/edges.parquet --checkpoint-dir /path/state --run-id pr1

Jobs read an edge parquet (or synthesize the deterministic transcript graph
with ``--synth-convs``), route supersteps through a durable CheckpointedRun
(resume with ``--resume``), and write results + lineage + metrics to the
state catalog. Mirrors the reference's benchmark CLI surface
(elektra benchmarks/parse_command_line.h: graph file, -iters, -workers).
"""

from __future__ import annotations

import argparse
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="elektra-spark")
    p.add_argument(
        "job",
        choices=["pagerank", "cc", "lpa", "triangles", "forest", "msf", "color", "match",
                 "louvain", "scan", "appr", "densest", "derive", "stream-updates"],
    )
    p.add_argument("--edges", help="edge parquet path (src,dst)")
    p.add_argument("--synth-convs", type=int, help="synthesize transcript graph with N conversations")
    p.add_argument("--n-iter", type=int, default=20)
    p.add_argument("--rounds", type=int, default=5)
    p.add_argument("--kernel", default="auto")
    p.add_argument("--checkpoint-dir", help="state catalog root (enables durable supersteps)")
    p.add_argument("--run-id", default=None)
    p.add_argument("--resume", action="store_true", help="continue from the latest committed superstep")
    p.add_argument("--output", help="write result parquet here")
    p.add_argument("--scan-eps", type=int, default=700, help="scan: sigma threshold in permille")
    p.add_argument("--scan-mu", type=int, default=2, help="scan: core epsilon-neighborhood minimum")
    # stream-updates: live maintenance of the connectivity tables from a
    # directory of (op, src, dst) parquet drops (streaming/updates.py)
    p.add_argument("--updates-dir", help="stream-updates: directory of update-file drops")
    p.add_argument("--warehouse", help="stream-updates: DynamicGraph catalog root")
    p.add_argument("--prefix", default="graph", help="stream-updates: catalog table prefix")
    p.add_argument(
        "--follow",
        action="store_true",
        help="stream-updates: keep running for new drops (default drains available files and stops)",
    )
    return p


def _stream_updates(spark, args) -> int:
    """Live connectivity maintenance: consume (op, src, dst) parquet drops
    from --updates-dir, one micro-batch per file, through the batch-dynamic
    MERGE path. First run bootstraps the graph from --edges/--synth-convs;
    later runs attach to the existing warehouse and the streaming checkpoint
    resumes from the first unprocessed drop."""
    import os

    from elektra_spark.dynamic.updates import DynamicGraph
    from elektra_spark.streaming.updates import apply_edge_stream, read_update_files
    from elektra_spark.tables import SnapshotCatalog

    if not (args.updates_dir and args.warehouse):
        raise SystemExit("stream-updates needs --updates-dir and --warehouse")
    cat = SnapshotCatalog(spark, args.warehouse)
    if cat.exists(f"{args.prefix}_edges"):
        g = DynamicGraph(cat, args.prefix)
    else:
        if args.synth_convs:
            from elektra_spark.ingest.edges import derive_graph
            from elektra_spark.ingest.transcripts import synth_transcripts

            gg = derive_graph(synth_transcripts(spark, args.synth_convs, seed=42))
            edges, vertices = gg.edges, gg.vertices
        elif args.edges:
            edges, vertices = spark.read.parquet(args.edges), None
        else:
            raise SystemExit("first run needs --edges or --synth-convs to bootstrap")
        g = DynamicGraph.create(cat, edges, vertices=vertices, prefix=args.prefix)

    t0 = time.time()
    applied = []
    q = apply_edge_stream(
        read_update_files(spark, args.updates_dir),
        g,
        os.path.join(args.warehouse, f"_stream_ckpt_{args.prefix}"),
        available_now=not args.follow,
        on_batch=lambda bid, ni, nd: applied.append((bid, ni, nd))
        or print(f"batch {bid}: +{ni} edges, -{nd} edges"),
    )
    q.awaitTermination()
    out = g.labels()
    if args.output:
        out.write.mode("overwrite").parquet(args.output)
    n_comp = out.select("component").distinct().count()
    print(
        f"stream-updates: {len(applied)} micro-batches applied in "
        f"{time.time() - t0:.1f}s; {n_comp} components"
    )
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from elektra_spark.session import get_spark

    # master=None: get_spark detects spark-submit (PYSPARK_GATEWAY_PORT) and
    # leaves the submitted master untouched; otherwise local[$SPARK_GRAFT_CPUS]
    spark = get_spark(f"elektra-{args.job}")
    spark.sparkContext.setLogLevel("WARN")

    if args.job == "stream-updates":
        return _stream_updates(spark, args)

    if args.synth_convs:
        from elektra_spark.ingest.edges import derive_graph
        from elektra_spark.ingest.transcripts import synth_transcripts

        g = derive_graph(synth_transcripts(spark, args.synth_convs, seed=42))
        edges, vertices = g.edges, g.vertices
    elif args.edges:
        edges, vertices = spark.read.parquet(args.edges), None
    else:
        raise SystemExit("need --edges or --synth-convs")

    checkpoint = None
    hook = None
    start_step = 0
    init = None
    run = None
    if args.checkpoint_dir:
        from elektra_spark.checkpoint import CheckpointedRun

        run_id = args.run_id or f"{args.job}-{int(time.time())}"
        run = CheckpointedRun(spark, args.checkpoint_dir, run_id)
        state = "ranks" if args.job == "pagerank" else "labels"
        checkpoint = run.checkpoint_fn(state)
        hook = run.metrics_hook(state)
        if args.resume:
            latest = run.latest_step(state)
            if latest is not None:
                start_step = latest
                init = run.load(state)
                print(f"resuming {run_id} from superstep {start_step}")

    t0 = time.time()
    if args.job == "pagerank":
        from elektra_spark.operators.pagerank import pagerank

        remaining = max(0, args.n_iter - start_step)
        out = pagerank(edges, vertices=vertices, n_iter=remaining, kernel=args.kernel,
                       checkpoint=checkpoint, on_superstep=hook, start_step=start_step, init_ranks=init)
    elif args.job == "cc":
        from elektra_spark.operators.cc import connected_components

        out = connected_components(edges, vertices=vertices, kernel=args.kernel,
                                   checkpoint=checkpoint, on_superstep=hook)
    elif args.job == "lpa":
        from elektra_spark.operators.lpa import label_propagation

        remaining = max(0, args.rounds - start_step)
        out = label_propagation(edges, vertices=vertices, rounds=remaining, checkpoint=checkpoint,
                                on_superstep=hook, start_step=start_step, init_labels=init)
    elif args.job == "triangles":
        from elektra_spark.operators.triangles import triangle_count

        out = triangle_count(edges)
    elif args.job == "forest":
        from elektra_spark.operators.forest import spanning_forest

        out = spanning_forest(edges)
    elif args.job == "msf":
        from pyspark.sql import functions as F

        from elektra_spark.operators.forest import minimum_spanning_forest

        # deterministic md5 edge weights when the input carries none — the
        # same portable 12-hex slice the contract row uses
        if "w" not in edges.columns:
            key = F.concat_ws(":", F.lit("w"), F.col("src"), F.col("dst"))
            edges = edges.select(
                "src", "dst",
                F.conv(F.substring(F.md5(key), 1, 12), 16, 10).cast("long").alias("w"),
            )
        out = minimum_spanning_forest(edges)
    elif args.job == "color":
        from elektra_spark.operators.coloring import greedy_coloring

        out = greedy_coloring(edges, vertices=vertices, on_superstep=hook)
    elif args.job == "match":
        from elektra_spark.operators.matching import maximal_matching

        out = maximal_matching(edges, on_superstep=hook)
    elif args.job == "louvain":
        from elektra_spark.operators.louvain import louvain_moves

        out = louvain_moves(edges, rounds=args.rounds, vertices=vertices)
    elif args.job == "scan":
        from elektra_spark.operators.scan import scan_clusters

        out = scan_clusters(edges, eps_permille=args.scan_eps, mu=args.scan_mu, vertices=vertices)
    elif args.job == "appr":
        from pyspark.sql import functions as F

        from elektra_spark.operators.appr import appr_push

        # default seed set: the smallest vid (override with a vertices table at the API level)
        seeds = edges.select(F.least("src", "dst").alias("vid")).agg(F.min("vid").alias("vid"))
        out = appr_push(edges, seeds, rounds=args.rounds)
    elif args.job == "densest":
        from elektra_spark.operators.densest import densest_subgraph

        out = densest_subgraph(edges)
    else:  # derive
        out = edges

    if args.output:
        out.write.mode("overwrite").parquet(args.output)
        n = spark.read.parquet(args.output).count()
    else:
        n = out.count()
    print(f"{args.job}: {n} rows in {time.time() - t0:.1f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
