"""Personalized PageRank — random walk with restart to a seed set.

The seed-anchored variant of the engine's PageRank (pagerank.py): the
teleport vector is concentrated on a seed set S instead of uniform, so
scores measure proximity to S — the standard recommendation / related-
entity / local-community primitive over a link graph (Jeh & Widom, WWW
2002; on the transcript graph: "which turns live near the tool actors").

Semantics pinned for exact oracle reproducibility (fixed ``n_iter``
synchronous supersteps, same discipline as pagerank.py / hits.py):

- seed vector ``s(v) = 1/|S|`` for v ∈ S, else 0;
- ``r_0 = s``;
- ``r_i(v) = (1−d)·s(v) + d·( Σ_{u→v} r_{i−1}(u)/deg(u) + dm_{i−1}·s(v) )``
  where ``dm`` is the dangling mass (rank held by out-degree-0 vertices),
  returned to the *seeds* — the personalized dangling convention, so total
  mass stays 1 and isolated vertices leak back to S rather than to the
  uniform vector.

The DuckDB twin (``_ppr_chain`` in __spark_entry__.py) unrolls the same
schedule with the same parenthesization; results compare at 1e-8 rounding.

Plan shape per superstep (identical to the PageRank df kernel's): the
adjacency-with-degree relation is checkpointed once (static,
hash-partitioned + persisted), each iteration is one shuffled join of the
rank vector into it plus a map-side-combinable ``groupBy(dst)``; the
dangling mass is a scalar driver aggregate (bounded action). At 100 TB:
per-superstep shuffle = |E| contribution rows; the seed join is a
broadcast (seed sets are small by definition).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cc import CheckpointFn, RetainedCheckpointer, SuperstepHook, _no_aqe
from .pagerank import _prepare


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    vertices: DataFrame | None = None,
    damping: float = 0.85,
    n_iter: int = 10,
    directed: bool = False,
    checkpoint: CheckpointFn | None = None,
    on_superstep: SuperstepHook | None = None,
) -> DataFrame:
    """→ (vid, rank): proximity to ``seeds`` after exactly ``n_iter``
    supersteps; ranks sum to 1."""
    spark = edges.sparkSession
    adj_deg, deg, universe = _prepare(edges, vertices, directed)
    seed_ids = seeds.select(F.col("vid").cast("long").alias("vid")).distinct()

    if checkpoint is None:
        # multiple live frames per round (static base + rank chain) — needs
        # the multi-chain RetainedCheckpointer, not EphemeralCheckpointer
        checkpoint = RetainedCheckpointer()
    with _no_aqe(spark):
        adj_deg = checkpoint(adj_deg.select("src", "dst", "deg"), -1)
        n_seeds = seed_ids.count()
        if n_seeds == 0:
            raise ValueError("personalized_pagerank needs a non-empty seed set")
        # static base: the seed-restart vector over the full vertex universe
        base = checkpoint(
            universe.join(F.broadcast(seed_ids.withColumn("is_seed", F.lit(True))), "vid", "left")
            .select(
                "vid",
                F.when(F.col("is_seed"), F.lit(1.0 / n_seeds)).otherwise(F.lit(0.0)).alias("s"),
            ),
            -1,
        )
        dangling = checkpoint(
            base.select("vid").join(deg.select(F.col("src").alias("vid")), "vid", "left_anti"), -1
        )
        r = checkpoint(base.select("vid", F.col("s").alias("rank")), 0)
        for step in range(1, n_iter + 1):
            t0 = time.time()
            contrib = (
                adj_deg.join(r.withColumnRenamed("vid", "src"), "src")
                .groupBy(F.col("dst").alias("vid"))
                .agg(F.sum(F.col("rank") / F.col("deg")).alias("contrib"))
            )
            dm = (
                r.join(dangling, "vid", "left_semi").agg(F.sum("rank")).collect()[0][0] or 0.0
            )
            r = base.join(contrib, "vid", "left").select(
                "vid",
                (
                    F.lit(1.0 - damping) * F.col("s")
                    + F.lit(damping)
                    * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.lit(float(dm)) * F.col("s"))
                ).alias("rank"),
            )
            r = checkpoint(r, step)
            if on_superstep is not None:
                on_superstep(step, -1, time.time() - t0)
    return r
