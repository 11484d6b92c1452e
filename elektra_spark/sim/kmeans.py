"""Distributed Lloyd k-means over the full embeddings table — the corpus
clustering pass (topic bucketing, curriculum mixing, SemDeDup's quantizer at
full fidelity) expressed so every iteration is REPRODUCIBLE bit-for-bit
across engines and across re-partitionings.

The reproducibility problem with distributed k-means is the centroid update:
``mean(vectors in cluster)`` is a float sum whose value depends on the
partitioning/combine order, so two runs of the same job (or an AQE re-plan
mid-job) can flip a boundary assignment and diverge. This kernel removes the
order-dependence instead of tolerating it:

- **Quantize once**: ``xq = round(x * 2^20)`` per dimension (int64). The
  scale is a power of two, so ``x * Q`` is an exact exponent shift and the
  quantized vector is a pure function of the input bytes.
- **Exact partial sums**: the update aggregates ``sum(xq_i)`` (int64) and
  ``count`` per cluster — map-side combinable, overflow-safe to ~2^33 rows
  per cluster at this scale (2^43 headroom at 10^12), and order-independent
  *by construction*. The k×d sum matrix is tiny; it is collected to the
  driver and the new centroid ``S/n`` is one IEEE division per dimension —
  correctly rounded, so identical in any engine.
- **Deterministic assignment**: distance uses the sequential left-to-right
  dot-product fold shared with the IVF kernel (``_dot`` ≡ DuckDB
  ``list_inner_product``), expanded as ``|x|² - 2·x·c + |c|²`` — ``|x|²`` is
  an exact integer (< 2^53), the cross term is a fixed-order fold — with a
  strictly-smaller / lowest-cluster-id tie-break.

Net: the whole Lloyd trajectory (init = k lowest-id vectors, T update
rounds, final assignment) is a pure function of the table bytes, which is
what lets the DuckDB twin in ``__spark_entry__`` re-derive every iteration
independently in SQL and still hash-match per vector.

At 100 TB: per iteration one full scan + one k-group aggregation (partial
aggregation does the reduction; no skew — the group key has k values and
map-side combine collapses each partition to ≤ k rows), then a k×d literal
broadcast back into a narrow ``select``. Driver traffic is O(k·d·iters)
integers. Compare elektra's batch-parallel supersteps over shared memory
(reference: elektra/parallel_euler_tour_tree — the sum-then-apply rhythm);
here the superstep is a DataFrame aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .ivf import _centroid_lit, _dot

KMEANS_Q = 1 << 20  # quantization scale: power of two → x*Q is exact
_Q2 = float(KMEANS_Q) * float(KMEANS_Q)


def quantize_vectors(df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """→ (id, xq:array<long>, xd:array<double>): the quantized vector and its
    exact double image (|xq| ≤ 2^20 « 2^53, so the cast loses nothing)."""
    xq = F.transform(
        F.col(vec_col).cast("array<double>"), lambda v: F.round(v * F.lit(float(KMEANS_Q))).cast("long")
    )
    return df.select(F.col(id_col).cast("long").alias("id"), xq.alias("xq")).withColumn(
        "xd", F.transform(F.col("xq"), lambda v: v.cast("double"))
    )


def _self_dot(c: list[float]) -> float:
    # left-to-right accumulation — the same sequential fold _dot / DuckDB
    # list_inner_product perform, so the literal equals the in-query value
    acc = 0.0
    for v in c:
        acc += v * v
    return acc


def _dist2_array(xd: Column, dxx: Column, cents: list[list[float]]) -> Column:
    return F.array(
        *[
            dxx - F.lit(2.0) * _dot(xd, _centroid_lit(c)) + F.lit(_self_dot(c))
            for c in cents
        ]
    )


def _assign(q: DataFrame, cents: list[list[float]]) -> DataFrame:
    """→ q + (cluster, d2): nearest centroid, strictly-smaller distance with
    lowest-cluster-id tie-break (array_position finds the FIRST minimum)."""
    dxx = _dot(F.col("xd"), F.col("xd"))  # exact integer in double
    d2s = _dist2_array(F.col("xd"), dxx, cents)
    return q.withColumn("_d2s", d2s).select(
        "id",
        "xq",
        "xd",
        (F.array_position(F.col("_d2s"), F.array_min(F.col("_d2s"))) - 1).cast("int").alias("cluster"),
        F.array_min(F.col("_d2s")).alias("d2"),
    )


def lloyd_centroids(
    corpus: DataFrame,
    k: int,
    iters: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Run ``iters`` exact-update Lloyd rounds; return the final k×d centroid
    matrix (quantized units, float64). Init = the k lowest-id vectors; an
    emptied cluster keeps its previous centroid."""
    q = quantize_vectors(corpus, id_col, vec_col).persist()
    try:
        first = q.orderBy("id").limit(k).collect()
        if len(first) < k:
            raise ValueError(f"corpus of {len(first)} rows cannot seed {k} centroids")
        dim = len(first[0].xq)
        cents = [[float(v) for v in r.xq] for r in first]
        for _ in range(iters):
            a = _assign(q, cents)
            agg = a.groupBy("cluster").agg(
                F.count(F.lit(1)).alias("n"),
                *[F.sum(F.element_at("xq", i + 1)).alias(f"s{i}") for i in range(dim)],
            )
            rows = {r["cluster"]: r for r in agg.collect()}
            cents = [
                [rows[j][f"s{i}"] / rows[j]["n"] for i in range(dim)] if j in rows else cents[j]
                for j in range(k)
            ]
        return cents
    finally:
        q.unpersist()


def kmeans_assign(
    corpus: DataFrame,
    k: int,
    iters: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (vec_id, cluster, dist2): every vector's cluster after ``iters``
    exact Lloyd rounds, with its squared distance in ORIGINAL units
    (d2 / Q², rounded 1e-6)."""
    cents = lloyd_centroids(corpus, k, iters, id_col, vec_col)
    a = _assign(quantize_vectors(corpus, id_col, vec_col), cents)
    return a.select(
        F.col("id").alias(id_col),
        F.col("cluster").cast("long").alias("cluster"),
        F.round(F.col("d2") / F.lit(_Q2), 6).alias("dist2"),
    )


def kmeans_sql(k: int, iters: int, dim: int, table: str = "embeddings") -> str:
    """DuckDB twin of :func:`kmeans_assign` — the ENTIRE Lloyd trajectory
    re-derived in SQL (no shared literals): same quantization, same exact
    int sums (DuckDB aggregates int64 into int128 — exact), same S::DOUBLE/n
    division, same fold-order distance, same tie-break."""
    xq = f"list_transform(embedding::DOUBLE[], v -> round(v * {float(KMEANS_Q)!r})::BIGINT)"
    parts = [
        f"""
  xq AS MATERIALIZED (SELECT vec_id AS id, {xq} AS xq,
             list_transform({xq}, v -> v::DOUBLE) AS xd
      FROM {table}),
  ks AS (SELECT j FROM generate_series(0, {k - 1}) t(j)),
  c0 AS MATERIALIZED (SELECT (row_number() OVER (ORDER BY id)) - 1 AS cluster, xd AS cd
      FROM (SELECT id, xd FROM xq ORDER BY id LIMIT {k}))"""
    ]
    assign = (
        "SELECT x.id, c.cluster,"
        " list_inner_product(x.xd, x.xd) - 2.0*list_inner_product(x.xd, c.cd)"
        " + list_inner_product(c.cd, c.cd) AS d2,"
        " row_number() OVER (PARTITION BY x.id ORDER BY"
        " list_inner_product(x.xd, x.xd) - 2.0*list_inner_product(x.xd, c.cd)"
        " + list_inner_product(c.cd, c.cd) ASC, c.cluster ASC) AS rn"
        " FROM xq x CROSS JOIN c{t} c"
    )
    for t in range(iters):
        parts.append(
            f""",
  a{t} AS MATERIALIZED (SELECT id, cluster FROM ({assign.format(t=t)}) WHERE rn = 1),
  s{t} AS MATERIALIZED (SELECT a.cluster, g.dim, sum(x.xq[g.dim]) AS s, count(*) AS n
      FROM a{t} a JOIN xq x USING (id), generate_series(1, {dim}) g(dim)
      GROUP BY a.cluster, g.dim),
  c{t + 1} AS MATERIALIZED (SELECT ks.j AS cluster, coalesce(nw.cd, pc.cd) AS cd
      FROM ks
      LEFT JOIN (SELECT cluster, list(s::DOUBLE / n ORDER BY dim) AS cd
                 FROM s{t} GROUP BY cluster) nw ON nw.cluster = ks.j
      LEFT JOIN c{t} pc ON pc.cluster = ks.j)"""
        )
    return (
        "WITH"
        + "".join(parts)
        + f"""
  SELECT id AS vec_id, cluster::BIGINT AS cluster, round(d2 / {_Q2!r}, 6) AS dist2
  FROM ({assign.format(t=iters)}) WHERE rn = 1
  """
    )
