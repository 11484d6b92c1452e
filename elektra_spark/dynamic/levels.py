"""HDT level metadata on the edge table — the reference's per-edge
``(level, type)`` bookkeeping re-expressed as DataFrame operators.

The reference's ``BatchDynamicConnectivity`` tags every edge with an ``EInfo
{level, type}`` (connectivity-helpers.h:66-80) and amortizes deletions by
pushing edges down levels: ``PushDownTreeEdgesFromComponents``
(dynamic_connectivity.h:112-131), ``PushDownNonTreeEdges``
(dynamic_connectivity.h:133-167), and the HDT tree collection
``GetAndClearLevelIEdges`` (hdt_euler_tour_tree.h:39,208-210,
hdt_element.h:114-190). Our engine does **not** need the level hierarchy for
performance — SURVEY.md §7.3/§7.5: the BSP recompute of affected components
replaces the O(log² n) amortization — but the metadata operations and their
invariants (connectivity.h:114-139) are part of the reference's surface, so
they are maintained here as plain column updates on an
``edges(src, dst, level, is_tree)`` table:

- new edges enter at the top level ``max_level(n) = ceil(log2 n)``
  (connectivity.h:350-370), tree/non-tree split by the winner contract;
- push-down operators decrement ``level`` under the same preconditions the
  reference enforces (component-size cap 2^(l−1) for tree push-down);
- :func:`check_level_invariants` is the CheckRep analogue: level bounds,
  tree edges form a forest, and the HDT size cap — every component of the
  level-≤l subgraph restricted to tree edges has ≤ 2^l vertices
  (connectivity.h:131-133).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def max_level(n_vertices: int) -> int:
    """``parlay::log2_up`` of the vertex count (connectivity.h:350-370)."""
    return max(1, math.ceil(math.log2(max(2, n_vertices))))


def with_levels(edges: DataFrame, forest: DataFrame, n_vertices: int) -> DataFrame:
    """Tag a canonical edge table with ``(level, is_tree)``: every edge starts
    at the top level (the reference inserts new edges at max_level,
    dynamic_connectivity.h:58,79); ``is_tree`` = membership in the spanning
    forest (the ``K_TREE``/``K_NON_TREE`` split)."""
    lvl = max_level(n_vertices)
    f = forest.select("src", "dst").withColumn("is_tree", F.lit(True))
    return (
        edges.select("src", "dst")
        .join(f, ["src", "dst"], "left")
        .select(
            "src",
            "dst",
            F.lit(lvl).cast("int").alias("level"),
            F.coalesce("is_tree", F.lit(False)).alias("is_tree"),
        )
    )


def push_down_tree_edges_from_components(
    edges_lvl: DataFrame, labels: DataFrame, level: int
) -> DataFrame:
    """``PushDownTreeEdgesFromComponents`` (dynamic_connectivity.h:112-131):
    tree edges at ``level`` whose component has ≤ 2^(level−1) vertices move to
    ``level − 1``. Pure column update — the Iceberg MERGE shape."""
    cap = 1 << max(0, level - 1)
    small = (
        labels.groupBy("component")
        .agg(F.count("*").alias("sz"))
        .filter(F.col("sz") <= cap)
        .select("component")
    )
    member = labels.join(small, "component", "left_semi").select(F.col("vid").alias("src"))
    eligible = (F.col("level") == level) & F.col("is_tree")
    marked = edges_lvl.join(member.withColumn("hit", F.lit(True)), "src", "left")
    return marked.select(
        "src",
        "dst",
        F.when(eligible & F.col("hit").isNotNull(), F.col("level") - 1)
        .otherwise(F.col("level"))
        .alias("level"),
        "is_tree",
    )


def push_down_non_tree_edges(edges_lvl: DataFrame, batch: DataFrame, level: int) -> DataFrame:
    """``PushDownNonTreeEdges`` (dynamic_connectivity.h:133-167): the given
    non-tree edges move from ``level`` to ``level − 1``."""
    b = batch.select("src", "dst").withColumn("hit", F.lit(True))
    marked = edges_lvl.join(b, ["src", "dst"], "left")
    eligible = (F.col("level") == level) & ~F.col("is_tree") & F.col("hit").isNotNull()
    return marked.select(
        "src",
        "dst",
        F.when(eligible, F.col("level") - 1).otherwise(F.col("level")).alias("level"),
        "is_tree",
    )


def get_and_clear_level_i_edges(
    edges_lvl: DataFrame, labels: DataFrame, component: int, level: int
) -> tuple[DataFrame, DataFrame]:
    """``GetAndClearLevelIEdges`` (hdt_euler_tour_tree.h:39,208-210): collect
    the level-``level`` tree edges of one component and push them down one
    level (the reference zeroes the level-i flag, which in the flattened
    encoding is exactly a decrement). Returns (collected, updated_table)."""
    member = labels.filter(F.col("component") == component).select(F.col("vid").alias("src"))
    sel = (
        edges_lvl.filter((F.col("level") == level) & F.col("is_tree"))
        .join(member, "src", "left_semi")
        .select("src", "dst")
    )
    updated = push_down_tree_like(edges_lvl, sel, level)
    return sel, updated


def push_down_tree_like(edges_lvl: DataFrame, batch: DataFrame, level: int) -> DataFrame:
    """Decrement ``level`` for the given tree edges currently at ``level``."""
    b = batch.select("src", "dst").withColumn("hit", F.lit(True))
    marked = edges_lvl.join(b, ["src", "dst"], "left")
    eligible = (F.col("level") == level) & F.col("is_tree") & F.col("hit").isNotNull()
    return marked.select(
        "src",
        "dst",
        F.when(eligible, F.col("level") - 1).otherwise(F.col("level")).alias("level"),
        "is_tree",
    )


def check_level_invariants(edges_lvl: DataFrame, n_vertices: int) -> None:
    """CheckRep for the level metadata (connectivity.h:114-139):

    - levels within [0, max_level];
    - tree edges form a forest (acyclic — |T| ≤ n − #components of T);
    - HDT size cap: every tree-edge component of the level-≤l subgraph has
      ≤ 2^l vertices (connectivity.h:131-133).
    Raises AssertionError on violation. Test/debug utility, like the
    reference's debug-gated CheckRep.
    """
    from ..operators.cc import connected_components

    lvl_top = max_level(n_vertices)
    bounds = edges_lvl.agg(F.min("level"), F.max("level")).collect()[0]
    assert bounds[0] is None or bounds[0] >= 0, f"level below 0: {bounds[0]}"
    assert bounds[1] is None or bounds[1] <= lvl_top, f"level above max: {bounds[1]}"

    tree = edges_lvl.filter("is_tree")
    n_tree = tree.count()
    if n_tree:
        comp = connected_components(tree.select("src", "dst"))
        n_vert = comp.count()
        n_comp = comp.select("component").distinct().count()
        assert n_tree == n_vert - n_comp, f"tree edges not a forest: {n_tree} != {n_vert}-{n_comp}"

    levels = [r["level"] for r in edges_lvl.select("level").distinct().collect()]
    for l in sorted(levels):
        sub = edges_lvl.filter((F.col("level") <= l) & F.col("is_tree")).select("src", "dst")
        if sub.isEmpty():
            continue
        comp = connected_components(sub)
        biggest = comp.groupBy("component").count().agg(F.max("count")).collect()[0][0]
        assert biggest <= (1 << l), f"level-{l} tree component of size {biggest} exceeds 2^{l}"
