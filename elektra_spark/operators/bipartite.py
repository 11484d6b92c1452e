"""Per-component bipartiteness — odd-cycle detection via parity closure.

A graph is bipartite iff it has no odd cycle, iff no vertex is reachable
from its component representative at both even and odd parity. This is the
structural sanity check every bipartite-projection pipeline runs before
treating a graph as two-mode (the customer↔order graph *must* pass; the
transcript graph fails exactly where a tool hub closes an odd turn-chain
cycle).

Semantics pinned for exact oracle reproducibility: BFS-style parity
closure seeded at ``(component_representative, parity 0)`` — the min-vid
CC labels (cc.py) double as member seeds because a component's label IS a
member vid. The state space is bounded by 2·|V| (vid × parity), so the
frontier loop terminates at the fixpoint without a hop cap, and the DuckDB
twin's recursive CTE dedups on the same (vid, parity) states.

Per superstep: one shuffled join of the frontier into the static
(hash-partitioned, persisted) adjacency + a distinct + an anti-join
against the visited states — the BFS plan (bfs.py) with a parity bit
riding along; shuffle volume ∝ frontier × degree. The verdict is two
map-side-combinable aggregations (states → per-vid parity count → per-
component conflict count).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cc import CheckpointFn, RetainedCheckpointer, SuperstepHook, _no_aqe, connected_components


def bipartite_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    labels: DataFrame | None = None,
    checkpoint: CheckpointFn | None = None,
    on_superstep: SuperstepHook | None = None,
) -> DataFrame:
    """→ (component, n_vertices, is_bipartite) per connected component.

    ``labels`` may pass precomputed (vid, component) min-vid CC labels;
    otherwise they are computed here.
    """
    spark = edges.sparkSession
    if labels is None:
        labels = connected_components(edges, vertices=vertices)
    both = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    if checkpoint is None:
        # visited states + frontier live concurrently across rounds
        checkpoint = RetainedCheckpointer()
    with _no_aqe(spark):
        both = checkpoint(both, -1)
        labels = checkpoint(labels.select("vid", "component"), -1)
        seed = labels.select(F.col("component").alias("vid")).distinct().withColumn(
            "par", F.lit(0)
        )
        states = checkpoint(seed, 0)
        frontier = states
        step = 0
        while True:
            step += 1
            t0 = time.time()
            nxt = (
                both.join(frontier.withColumnRenamed("vid", "src"), "src")
                .select(F.col("dst").alias("vid"), (F.lit(1) - F.col("par")).alias("par"))
                .distinct()
                .join(states, ["vid", "par"], "left_anti")
            )
            nxt = checkpoint(nxt, step)
            n_new = nxt.count()
            if on_superstep is not None:
                on_superstep(step, n_new, time.time() - t0)
            if n_new == 0:
                break
            states = checkpoint(states.unionByName(nxt), step)
            frontier = nxt
    conflicted = (
        states.groupBy("vid")
        .agg(F.countDistinct("par").alias("np"))
        .filter(F.col("np") > 1)
        .select("vid")
    )
    return (
        labels.join(conflicted.withColumn("bad", F.lit(1)), "vid", "left")
        .groupBy("component")
        .agg(
            F.count("*").cast("long").alias("n_vertices"),
            (F.sum(F.coalesce("bad", F.lit(0))) == 0).alias("is_bipartite"),
        )
    )
