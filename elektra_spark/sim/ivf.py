"""IVF (inverted-file) approximate nearest neighbor — the k-means-bucketed
scale path for similarity search, complementing the SRP-LSH variant in
:mod:`elektra_spark.sim.ann`.

Standard IVF layout at 100 TB: a coarse quantizer (k-means centroids) is
trained on a *pushed-down sample* of the corpus (never the full table),
broadcast to executors, and every vector is assigned to its nearest centroid
— one narrow shuffle key. A query probes its ``nprobe`` nearest centroid
buckets instead of the whole corpus, so the candidate set shrinks ~k/nprobe
fold; the bucket join replaces the cross join exactly as in the LSH variant.

Determinism & oracle-checkability:

- :func:`train_centroids` is a fixed-iteration Lloyd loop over the sample
  with deterministic init (first ``k`` sample rows) and min-id tie-breaks —
  a pure function of the sample bytes. The resulting centroid floats are
  embedded as **literals** in both the Spark expressions and the generated
  DuckDB twin (float64 repr round-trips exactly), so engine and oracle share
  the quantizer bit-for-bit.
- assignment and probe ranking use the same sequential left-to-right
  ``F.aggregate`` fold the DuckDB ``list_inner_product`` performs, with a
  strictly-greater/min-id argmax fold — identical arithmetic, identical
  ties. (A BLAS-matmul assignment kernel would be the throughput choice at
  scale; the column-expression form is used here because it is the one an
  independent engine can replay exactly — same trade as
  ``cosine_topk_sql_style`` vs ``cosine_topk_brute``.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def train_centroids(sample, k: int = 8, iters: int = 5):
    """Deterministic Lloyd k-means over unit-normalized sample vectors.

    ``sample``: (n, d) array-like. Init = the first ``k`` rows (the sample is
    already a deterministic pushdown, e.g. ``vec_id < 64`` in stable order).
    Cosine assignment (argmax dot on normalized vectors, lowest centroid id
    wins ties); empty clusters keep their previous centroid; centroids are
    re-normalized each round. Returns a plain list of lists (float64) so the
    values embed as literals.
    """
    import numpy as np

    x = np.asarray(sample, dtype=np.float64)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    if len(x) < k:
        raise ValueError(f"sample of {len(x)} rows cannot seed {k} centroids")
    c = x[:k].copy()
    for _ in range(iters):
        sims = x @ c.T  # (n, k)
        assign = np.argmax(sims, axis=1)  # np.argmax returns the first (lowest id) maximum
        for j in range(k):
            members = x[assign == j]
            if len(members):
                m = members.sum(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    c[j] = m / n
    return [[float(v) for v in row] for row in c]


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _centroid_lit(row: list[float]) -> Column:
    return F.array(*[F.lit(v) for v in row])


def _argmax_centroid(vec: Column, centroids: list[list[float]]) -> Column:
    """Index of the max-dot centroid, lowest id on ties: materialize the dot
    array once, then ``array_position(dots, array_max(dots))`` — first
    occurrence is the min-id tie-break, and the expression stays linear in k
    (a nested strictly-greater fold would double per centroid)."""
    dots = F.array(*[_dot(vec, _centroid_lit(row)) for row in centroids])
    return (F.array_position(dots, F.array_max(dots)) - 1).cast("int")


def ivf_assign(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (id, v, centroid_id): each vector tagged with its nearest centroid.
    One narrow column expression — at scale this is the partition key the
    inverted lists are clustered by."""
    v = F.col(vec_col).cast("array<double>")
    return corpus.select(
        F.col(id_col).alias("id"), v.alias("v"), _argmax_centroid(v, centroids).alias("centroid_id")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: corpus bucketed by nearest centroid; each query
    scans its ``nprobe`` nearest centroid buckets; exact cosine + window
    top-k on the candidates. → (query_id, nbr, sim, rank)."""
    cb = ivf_assign(corpus, centroids, id_col, vec_col).withColumnRenamed("id", "nbr").withColumnRenamed("v", "cv")
    qv = F.col(vec_col).cast("array<double>")
    q = queries.select(F.col(id_col).alias("query_id"), qv.alias("qv"))
    # rank all k centroids per query, keep the nprobe nearest
    probes = q.select(
        "query_id", "qv",
        F.explode(
            F.array(*[
                F.struct(F.lit(j).alias("centroid_id"), _dot(F.col("qv"), _centroid_lit(row)).alias("cdot"))
                for j, row in enumerate(centroids)
            ])
        ).alias("p"),
    ).select("query_id", "qv", F.col("p.centroid_id").alias("centroid_id"), F.col("p.cdot").alias("cdot"))
    wp = Window.partitionBy("query_id").orderBy(F.col("cdot").desc(), F.col("centroid_id"))
    probes = probes.withColumn("prank", F.row_number().over(wp)).filter(F.col("prank") <= nprobe)

    cand = probes.join(cb, "centroid_id").filter(F.col("query_id") != F.col("nbr"))
    sim = cand.select(
        "query_id", "nbr",
        (
            _dot(F.col("qv"), F.col("cv"))
            / (F.sqrt(_dot(F.col("qv"), F.col("qv"))) * F.sqrt(_dot(F.col("cv"), F.col("cv"))))
        ).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("nbr"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr", F.round("sim", 6).alias("sim"), "rank")
    )


# ------------------------------------------------------------------ SQL twin
def _lit_sql(row: list[float]) -> str:
    return "[" + ", ".join(repr(v) for v in row) + "]::DOUBLE[]"


def _argmax_sql(vec_expr: str, centroids: list[list[float]]) -> str:
    """Same dot-array + first-max-position shape as :func:`_argmax_centroid`."""
    dots = "[" + ", ".join(f"list_inner_product({vec_expr}, {_lit_sql(row)})" for row in centroids) + "]"
    return f"(list_position({dots}, list_max({dots})) - 1)::INTEGER"


def ivf_topk_sql(
    centroids: list[list[float]],
    k: int = 5,
    nprobe: int = 2,
    table: str = "embeddings",
    query_filter: str = "vec_id < 3",
) -> str:
    """DuckDB twin of :func:`ivf_topk` with the identical centroid literals,
    assignment fold, probe ranking, and tie-breaks."""
    probe_rows = "\n      UNION ALL\n      ".join(
        f"SELECT query_id, qv, {j} AS centroid_id, list_inner_product(qv, {_lit_sql(row)}) AS cdot FROM q"
        for j, row in enumerate(centroids)
    )
    return f"""
  WITH c AS (SELECT vec_id AS nbr, embedding::DOUBLE[] AS cv FROM {table}),
  cb AS (SELECT nbr, cv, {_argmax_sql("cv", centroids)} AS centroid_id FROM c),
  q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM {table} WHERE {query_filter}),
  pr AS (
      {probe_rows}
  ),
  probes AS (
    SELECT * FROM (
      SELECT query_id, qv, centroid_id,
             row_number() OVER (PARTITION BY query_id ORDER BY cdot DESC, centroid_id) AS prank
      FROM pr) WHERE prank <= {nprobe}
  ),
  s AS (
    SELECT query_id, nbr,
           list_inner_product(qv, cv)
             / (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(cv, cv))) AS sim
    FROM probes JOIN cb USING (centroid_id) WHERE query_id <> nbr
  ),
  r AS (SELECT query_id, nbr, sim,
               row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, nbr ASC) AS rank
        FROM s)
  SELECT query_id, nbr, round(sim, 6) AS sim, rank FROM r WHERE rank <= {k}
  """
