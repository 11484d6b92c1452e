"""Sweep cut — local clustering from a diffusion vector (Andersen, Chung,
Lang, FOCS 2006): rank vertices by score/degree, then find the prefix with
minimum conductance.

The ACL theorem is what makes PPR more than a ranking: some prefix of the
(ppr/deg)-ordered support is a provably low-conductance cluster around the
seed set. This operator materializes the whole sweep curve —

    vol(S_k)  = Σ_{i ≤ k} deg(v_i)                 (cumulative, exact int)
    int(S_k)  = |{(u,v) ∈ E : max(rank_u, rank_v) ≤ k}|   (cumulative, exact)
    cut(S_k)  = vol(S_k) − 2·int(S_k)
    φ(S_k)    = cut / min(vol, 2m − vol)

— so the caller (or the contract hash) sees every prefix's conductance, not
just the winner. Every quantity is an exact integer except the final ratio
(one division, rounded 1e-6); the order key score/deg divides two values
that are already engine-identical (the score column arrives 1e-8-rounded
from the PPR row), so the permutation is total and engine-exact.

Scale note: the sweep runs over the SUPPORT of the diffusion (score > 0 —
for an approximate-PPR front end, O(1/ε) vertices independent of graph
size), so the two global-order windows are small by construction; the only
full-graph work is the degree aggregation and the edge→rank join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sweep_cut(
    edges: DataFrame,
    scores: DataFrame,
    score_col: str = "rank",
    max_prefix: int | None = None,
) -> DataFrame:
    """→ (k, vid, vol, cut, conductance): the sweep curve of ``scores`` over
    the undirected graph; row k is the prefix ending at vid. Prefixes with
    vol ≥ 2m (the complement would be empty) are excluded."""
    e = (
        edges.select(
            F.least("src", "dst").cast("long").alias("src"),
            F.greatest("src", "dst").cast("long").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    b = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = b.groupBy(F.col("src").alias("vid")).agg(F.count(F.lit(1)).alias("d"))
    m2 = deg.agg(F.sum("d").alias("m2"))  # 2m, one-row
    sup = (
        scores.filter(F.col(score_col) > 0)
        .join(deg, "vid")
        .select("vid", (F.col(score_col) / F.col("d")).alias("ratio"), "d")
    )
    wr = Window.orderBy(F.col("ratio").desc(), F.col("vid").asc())
    ranked = sup.withColumn("k", F.row_number().over(wr).cast("long"))
    if max_prefix is not None:
        ranked = ranked.filter(F.col("k") <= max_prefix)
    wk = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vol = ranked.withColumn("vol", F.sum("d").over(wk))
    rmap = ranked.select("vid", "k")
    kmax = (
        e.join(rmap.withColumnRenamed("vid", "src").withColumnRenamed("k", "ks"), "src")
        .join(rmap.withColumnRenamed("vid", "dst").withColumnRenamed("k", "kd"), "dst")
        .select(F.greatest("ks", "kd").alias("km"))
        .groupBy("km")
        .agg(F.count(F.lit(1)).alias("closed"))
    )
    cur = (
        vol.join(kmax.withColumnRenamed("km", "k"), "k", "left")
        .withColumn("internal", F.sum(F.coalesce("closed", F.lit(0))).over(wk))
        .crossJoin(F.broadcast(m2))
        .select(
            "k",
            "vid",
            "vol",
            (F.col("vol") - 2 * F.col("internal")).alias("cut"),
            "m2",
        )
        .filter(F.col("vol") < F.col("m2"))
    )
    return cur.select(
        "k",
        "vid",
        F.col("vol").cast("long").alias("vol"),
        F.col("cut").cast("long").alias("cut"),
        F.round(
            F.col("cut").cast("double") / F.least(F.col("vol"), F.col("m2") - F.col("vol")), 6
        ).alias("conductance"),
    )
