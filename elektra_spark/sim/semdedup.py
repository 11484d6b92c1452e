"""SemDeDup — semantic deduplication via k-means clusters + within-cluster
cosine pruning (Abbas et al., *SemDeDup: Data-efficient learning at
web-scale through semantic deduplication*, 2023).

Exact near-dup passes (dedup/ngram.py) and SRP-bucketed embedding pairs
(sim/ann.py embedding_near_dups) both key on LOCAL similarity structure;
SemDeDup is the curation pass frontier-corpus pipelines actually run over
embeddings: cluster the corpus with a cheap coarse quantizer, then inside
each cluster drop every vector that sits within cosine ``threshold`` of a
kept clustermate. Reuses the IVF machinery wholesale: the deterministic
sample-trained Lloyd centroids (sim/ivf.py train_centroids — literals both
engines embed) and the same sequential-fold cosine, so the DuckDB twin
replays assignment and pruning bit-for-bit.

Keep rule (deterministic, non-transitive — the paper's "keep one per
ε-ball" implemented with a total order): within a cluster, vector i is
DROPPED iff some j < i (by id) in the same cluster has cos(i, j) ≥
threshold. Lower ids win unconditionally, so the rule needs no iterative
closure and is exactly replayable in one SQL join.

At 100 TB: assignment is one narrow column expression (broadcast centroid
literals); the pairwise stage is quadratic ONLY within a cluster, so k
scales with the corpus (n/k vectors per cluster — the paper runs 50k
clusters for LAION-scale). The cluster id is the single shuffle key; a
degenerate mega-cluster is the same failure mode as a hot LSH bucket and
gets the same remedy (raise k / split by secondary hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ivf import _dot, _lit_sql, ivf_assign


def semdedup(
    corpus: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (vec_id, cluster, kept): every corpus vector with its k-means
    cluster and whether the SemDeDup pass keeps it."""
    a = ivf_assign(corpus, centroids, id_col=id_col, vec_col=vec_col)
    lo = a.select(F.col("centroid_id").alias("cluster"), F.col("id").alias("lo"), F.col("v").alias("lv"))
    hi = a.select(F.col("centroid_id").alias("cluster"), F.col("id").alias("hi"), F.col("v").alias("hv"))
    sim = (
        lo.join(hi, "cluster")
        .filter(F.col("lo") < F.col("hi"))
        .select(
            "cluster",
            "hi",
            (
                _dot(F.col("lv"), F.col("hv"))
                / (F.sqrt(_dot(F.col("lv"), F.col("lv"))) * F.sqrt(_dot(F.col("hv"), F.col("hv"))))
            ).alias("sim"),
        )
    )
    dropped = sim.filter(F.col("sim") >= threshold).select(F.col("hi").alias("id")).distinct()
    return (
        a.join(dropped.withColumn("dropped", F.lit(True)), "id", "left")
        .select(
            F.col("id").alias("vec_id"),
            F.col("centroid_id").alias("cluster"),
            F.coalesce(~F.col("dropped"), F.lit(True)).alias("kept"),
        )
    )


def semdedup_sql(
    centroids: list[list[float]],
    threshold: float = 0.7,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin generated from the same centroid literals: identical
    argmax assignment (max dot, first/lowest index on ties — mirrored by
    ordering on (dot DESC, centroid id)) and the identical cosine
    comparison."""
    dots = ", ".join(f"list_inner_product(v, {_lit_sql(row)})" for row in centroids)
    return f"""
  WITH e AS (SELECT {id_col} AS id, {vec_col}::DOUBLE[] AS v FROM {table}),
  d AS (SELECT id, v, [{dots}] AS dots FROM e),
  a AS (SELECT id, v, (list_position(dots, list_max(dots)) - 1)::INTEGER AS cluster FROM d),
  s AS (SELECT a2.id AS hi,
               list_inner_product(a1.v, a2.v)
                 / (sqrt(list_inner_product(a1.v, a1.v)) * sqrt(list_inner_product(a2.v, a2.v))) AS sim
        FROM a a1 JOIN a a2 ON a1.cluster = a2.cluster AND a1.id < a2.id),
  dropped AS (SELECT DISTINCT hi AS id FROM s WHERE sim >= {threshold!r})
  SELECT a.id AS {id_col}, a.cluster, (dropped.id IS NULL) AS kept
  FROM a LEFT JOIN dropped ON a.id = dropped.id
  """
