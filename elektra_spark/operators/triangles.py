"""Triangle counting via degree-ordered wedge joins.

Not in the reference (mandated by the north rule, SURVEY.md §2.7). The
classic distributed algorithm: orient every undirected edge from the
lower-ranked endpoint to the higher, where rank = (degree, vid) — a total
order, so each triangle has exactly one source vertex with two out-arcs and
is counted exactly once by the wedge join. Orienting by degree bounds the
out-degree of every vertex by O(√m), so the wedge relation is O(m^1.5) even
on skewed graphs — hubs become wedge *targets*, not wedge generators, which
is the skew story at 100 TB.

Plan shape: two shuffle joins on arc endpoints + one count. AQE handles any
residual skew in the wedge probe join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .degrees import degrees


def _oriented_arcs(edges: DataFrame) -> DataFrame:
    """Canonical edges → arcs oriented by (degree, vid) rank."""
    deg = degrees(edges)
    e = (
        edges.join(deg.select(F.col("vid").alias("src"), F.col("degree").alias("dsrc")), "src")
        .join(deg.select(F.col("vid").alias("dst"), F.col("degree").alias("ddst")), "dst")
    )
    lower_first = (F.col("dsrc") < F.col("ddst")) | (
        (F.col("dsrc") == F.col("ddst")) & (F.col("src") < F.col("dst"))
    )
    return e.select(
        F.when(lower_first, F.col("src")).otherwise(F.col("dst")).alias("a"),
        F.when(lower_first, F.col("dst")).otherwise(F.col("src")).alias("b"),
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """→ single-row DataFrame (n_triangles: long)."""
    arcs = _oriented_arcs(edges)
    e1 = arcs.select(F.col("a").alias("u"), F.col("b").alias("v"))
    e2 = arcs.select(F.col("a").alias("u"), F.col("b").alias("w"))
    # one wedge per unordered out-pair of the apex u (v < w by vid)
    wedges = e1.join(e2, "u").filter(F.col("v") < F.col("w"))
    closing = edges.select(F.col("src").alias("v"), F.col("dst").alias("w")).union(
        edges.select(F.col("dst").alias("v"), F.col("src").alias("w"))
    )
    tri = wedges.join(closing, ["v", "w"], "left_semi")
    return tri.agg(F.count("*").cast("long").alias("n_triangles"))


def local_clustering_coefficient(edges: DataFrame) -> DataFrame:
    """→ (vid, degree, n_triangles, coeff): Watts–Strogatz local clustering
    coefficient ``2·T(v) / (d(v)·(d(v)−1))`` per vertex, 0 when ``d < 2``.

    The per-vertex feature a link-graph user joins back onto vertices
    ("how clique-like is this node's neighborhood") — composed entirely from
    the two existing aggregates (:func:`triangle_count_per_vertex` +
    ``degrees``), so the 100 TB plan is the triangle wedge join (O(m^1.5),
    hub-safe) plus one broadcast-sized join on ``vid``; no new shuffle shape.
    The division is a plain column expression the DuckDB twin mirrors
    parenthesis-for-parenthesis, rounded to 1e-6.
    """
    deg = degrees(edges)
    tpv = triangle_count_per_vertex(edges)
    t = F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long")
    d = F.col("degree").cast("double")
    coeff = F.when(F.col("degree") >= 2, (F.lit(2.0) * t) / (d * (d - F.lit(1.0)))).otherwise(F.lit(0.0))
    return deg.join(tpv, "vid", "left").select(
        "vid",
        F.col("degree").cast("long").alias("degree"),
        t.alias("n_triangles"),
        F.round(coeff, 6).alias("coeff"),
    )


def triangle_count_per_vertex(edges: DataFrame) -> DataFrame:
    """→ (vid, n_triangles) per-vertex triangle participation counts."""
    arcs = _oriented_arcs(edges)
    e1 = arcs.select(F.col("a").alias("u"), F.col("b").alias("v"))
    e2 = arcs.select(F.col("a").alias("u"), F.col("b").alias("w"))
    wedges = e1.join(e2, "u").filter(F.col("v") < F.col("w"))
    closing = edges.select(F.col("src").alias("v"), F.col("dst").alias("w")).union(
        edges.select(F.col("dst").alias("v"), F.col("src").alias("w"))
    )
    tris = wedges.join(closing, ["v", "w"], "left_semi")
    per = tris.select(F.explode(F.array("u", "v", "w")).alias("vid")).groupBy("vid").agg(
        F.count("*").alias("n_triangles")
    )
    return per
