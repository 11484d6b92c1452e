"""Degree aggregates over the canonical edge table.

The reference maintains per-vertex incident non-tree-edge counts as skip-list
augmentation (``IncrementNontreeEdgeCounts`` / ``UpdateNontreeEdges``,
elektra hdt_euler_tour_tree.h:106-133, via ``parlay::histogram_by_key``);
on Spark the same histogram is ``explode + groupBy().count()``, recomputed
per use — columnar and map-side combinable (SURVEY.md §2.2 rows 27, 30).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degrees(edges: DataFrame) -> DataFrame:
    """→ (vid, degree) for the undirected canonical edge set."""
    return (
        edges.select(F.explode(F.array("src", "dst")).alias("vid"))
        .groupBy("vid")
        .agg(F.count("*").alias("degree"))
    )


def degree_histogram(edges: DataFrame) -> DataFrame:
    """→ (degree, n_vertices) distribution."""
    return degrees(edges).groupBy("degree").agg(F.count("*").alias("n_vertices")).orderBy("degree")
