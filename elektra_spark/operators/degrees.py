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


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """→ single row (n_endpoints, assortativity): Newman's degree
    assortativity coefficient — the Pearson correlation of endpoint degrees
    over the symmetric (both-directions) edge relation (Newman, PRL 2002).
    Positive = hubs link hubs; negative = hub-leaf (the usual web shape).

    Computed from explicit integer power sums (n·Σxy − Σx·Σy over
    √(n·Σx²−(Σx)²)·√(n·Σy²−(Σy)²)) rather than a streaming ``corr()``:
    degree sums are exact integers in both engines, so the DuckDB twin
    reproduces the coefficient bit-for-bit (modulo the final 1e-6
    rounding) regardless of summation order — a streaming co-moment
    implementation would not. One degree join + one scalar aggregate;
    map-side combinable everywhere.
    """
    deg = degrees(edges)
    both = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    xy = (
        both.join(deg.select(F.col("vid").alias("src"), F.col("degree").alias("x")), "src")
        .join(deg.select(F.col("vid").alias("dst"), F.col("degree").alias("y")), "dst")
        .select("x", "y")
    )
    agg = xy.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (F.col(c).cast("double") for c in ("sxy", "sxx", "syy"))
    r = (n * sxy - sx * sy) / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
    return agg.select(F.col("n").cast("long").alias("n_endpoints"), F.round(r, 6).alias("assortativity"))


def rich_club(edges: DataFrame, ks: list[int]) -> DataFrame:
    """→ (k, n_rich, n_rich_edges, phi) per threshold k: the rich-club
    coefficient φ(k) = 2·E_k / (N_k·(N_k−1)) — the density of the subgraph
    induced by vertices of degree > k (Zhou–Mondragón 2004). φ(k) → 1 means
    the hubs form a near-clique; on hub-leaf graphs (the transcript/web
    shape) it stays low. All-integer counts + one 1e-6-rounded ratio, so
    the cross-engine twin is exact.

    Plan shape: ONE degree aggregate + two broadcast-degree joins shared by
    every k; the tiny k grid broadcast-cross-joins into the counts (the
    grid side is a handful of rows — no edge-table re-scan per k). At
    100 TB: two shuffles total (degree agg + edge-degree join), grid size
    independent.
    """
    spark = edges.sparkSession
    kdf = spark.createDataFrame([(int(k),) for k in ks], "k int")
    deg = degrees(edges)
    nk = (
        deg.crossJoin(F.broadcast(kdf))
        .filter(F.col("degree") > F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_rich"))
    )
    ed = (
        edges.select("src", "dst")
        .join(deg.select(F.col("vid").alias("src"), F.col("degree").alias("ds")), "src")
        .join(deg.select(F.col("vid").alias("dst"), F.col("degree").alias("dd")), "dst")
        .select(F.least("ds", "dd").alias("dmin"))
    )
    ek = (
        ed.crossJoin(F.broadcast(kdf))
        .filter(F.col("dmin") > F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_rich_edges"))
    )
    out = (
        kdf.join(nk, "k", "left")
        .join(ek, "k", "left")
        .select(
            "k",
            F.coalesce("n_rich", F.lit(0)).cast("long").alias("n_rich"),
            F.coalesce("n_rich_edges", F.lit(0)).cast("long").alias("n_rich_edges"),
        )
    )
    phi = F.when(
        F.col("n_rich") >= 2,
        2.0 * F.col("n_rich_edges") / (F.col("n_rich") * (F.col("n_rich") - F.lit(1))),
    ).otherwise(0.0)
    return out.select("k", "n_rich", "n_rich_edges", F.round(phi, 6).alias("phi"))
