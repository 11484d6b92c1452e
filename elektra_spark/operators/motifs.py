"""Directed-graph motif statistics: reciprocity + triad (3-vertex) motifs.

Not in the reference (its graphs are undirected — connectivity.h:9-13);
these are the directed companions of §2.7's triangle analytics, computed on
the directed transcript flow graph (ingest/edges.py derive_digraph), where
direction IS the payload: reply arcs run forward in conversation time, tool
response arcs run back into the calling conversation, and the mix of the
two is what the motif counts measure (a feed-forward loop = a turn whose
tool result lands in the next turn it also replies to; a 3-cycle = mutual
flow through a shared hub).

All three statistics are exact integer aggregates (plus one final rounded
ratio), so the DuckDB twin agrees bit-for-bit before the contract's 1e-6
rounding — no sampling, no RNG.

Scale shapes (10^12-arc deployment):

- reciprocity: ONE self-semi-join of the arc table on the reversed key —
  shuffle on (src, dst) both sides, map-side combinable count. No wedge
  volume at all.
- triad counts: one directed wedge join (mid-vertex key) probed by a
  closing semi-join. The wedge relation is Σ_v in(v)·out(v) rows —
  quadratic in hub throughput, NOT the O(m^1.5) bound the undirected
  counter gets from degree orientation (direction pins which vertex is the
  wedge center, so the orientation trick is unavailable). At 100 TB either
  cap wedge centers (the linkpred LINKPRED_MAX_PIVOT_DEG contract) or
  DOULION-thin arcs with a deterministic hash coin and scale by p⁻³
  (triangles.py triangle_count_sampled has the exact recipe); the exact
  form here is for digraphs whose hub in×out product is bounded — true for
  the transcript flow graph, where tool hubs have huge degree but each
  wedge through them is (caller turn, next turn) within one conversation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reciprocity(edges: DataFrame) -> DataFrame:
    """→ single row (n_arcs, n_reciprocal_arcs, reciprocity).

    ``n_reciprocal_arcs`` counts arcs whose reverse arc also exists (so a
    mutual pair contributes 2); ``reciprocity`` is their fraction of all
    arcs — the standard digraph reciprocity r = |{(u,v) ∈ E : (v,u) ∈ E}|
    / |E|. Input arcs are assumed distinct and self-loop-free
    (derive_digraph guarantees both)."""
    arcs = edges.select("src", "dst")
    rev = arcs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    mutual = arcs.join(rev, ["src", "dst"], "left_semi")
    n = arcs.agg(F.count("*").cast("long").alias("n_arcs"))
    r = mutual.agg(F.count("*").cast("long").alias("n_reciprocal_arcs"))
    return n.crossJoin(r).select(
        "n_arcs",
        "n_reciprocal_arcs",
        F.round(
            F.when(F.col("n_arcs") > 0, F.col("n_reciprocal_arcs") / F.col("n_arcs")).otherwise(0.0),
            6,
        ).alias("reciprocity"),
    )


def triad_motifs(edges: DataFrame) -> DataFrame:
    """→ single row (n_cyclic_triangles, n_transitive_triangles).

    - **cyclic**: directed 3-cycles i→j→k→i over distinct vertices, each
      cycle counted once (the ordered rotation enumeration counts every
      cycle exactly 3 times — once per starting vertex — so the aggregate
      divides by 3; reciprocal arcs simply make more distinct cycles, each
      still counted 3 ways).
    - **transitive** (feed-forward loops): ordered triples of distinct
      vertices with i→j, j→k AND the shortcut i→k. Roles are pinned
      (i source, j middle, k sink), so each instance is counted exactly
      once — no division.

    Both are one wedge join on the shared middle vertex plus a closing
    semi-join; the two counts reuse the same wedge relation, so Spark
    materializes it once under the union."""
    arcs = edges.select("src", "dst")
    e1 = arcs.select(F.col("src").alias("i"), F.col("dst").alias("j"))
    e2 = arcs.select(F.col("src").alias("j"), F.col("dst").alias("k"))
    wedges = e1.join(e2, "j").filter(F.col("i") != F.col("k"))
    close_fwd = arcs.select(F.col("src").alias("i"), F.col("dst").alias("k"))
    close_bwd = arcs.select(F.col("dst").alias("i"), F.col("src").alias("k"))
    ffl = wedges.join(close_fwd, ["i", "k"], "left_semi").agg(
        F.count("*").cast("long").alias("n_transitive_triangles")
    )
    # integer `div`, not float /: the rotation count is exactly divisible
    # by 3, and at 10^12 scale a double quotient could round before the cast
    cyc = wedges.join(close_bwd, ["i", "k"], "left_semi").agg(
        F.expr("count(*) div 3").cast("long").alias("n_cyclic_triangles")
    )
    return cyc.crossJoin(ffl)


def motif_census(edges: DataFrame) -> DataFrame:
    """→ single row (n_arcs, n_reciprocal_arcs, reciprocity,
    n_cyclic_triangles, n_transitive_triangles) — the digraph's one-line
    structural fingerprint (reciprocity + 3-vertex motif counts)."""
    return reciprocity(edges).crossJoin(triad_motifs(edges))
