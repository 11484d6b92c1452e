"""Similarity search over an embedding column (array<float>).

Two paths:

- :func:`cosine_topk_brute` — exact baseline. The (small) query set is
  broadcast; each corpus partition computes a dense NumPy matmul against the
  query matrix inside ``mapInPandas`` (Arrow batches, BLAS — no per-row
  Python), emits its local top-k per query, and a global window takes the
  final top-k. The shuffle carries only ``partitions × queries × k`` rows —
  the canonical distributed brute-force layout that scales linearly in the
  corpus with a 1000-executor fan-out.
- :func:`cosine_topk_lsh` — scale path: sign-random-projection (SimHash for
  vectors) buckets the corpus; only the query's bucket (and optional
  neighboring probes) is scanned. Hyperplanes are derived deterministically
  from a seed via hashing, so engine runs are reproducible.

There is also :func:`cosine_topk_sql_style` — a pure column-function variant
(``F.aggregate`` over zipped arrays) whose arithmetic (sequential
left-to-right summation in double) matches DuckDB's ``list_`` functions,
used for the oracle-checked entry.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def cosine_topk_sql_style(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k via built-in array functions (cross join + window).

    Quadratic — the oracle-comparable baseline for small query sets; the
    mapInPandas variant below is the throughput path.
    """
    c = corpus.select(
        F.col(id_col).alias("nbr"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    sim = q.crossJoin(c).filter(F.col("query_id") != F.col("nbr")).select(
        "query_id",
        "nbr",
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


def cosine_topk_brute(
    corpus: DataFrame,
    queries_pdf: pd.DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rank_round: int | None = None,
) -> DataFrame:
    """Exact top-k: broadcast query matrix, per-partition BLAS matmul +
    local top-k, global window final top-k. queries_pdf: pandas
    (query_id, vector list) — small by contract.

    ``rank_round``: when set, the final ranking (and the emitted sim) uses
    ``round(sim, rank_round)`` with nbr-id tiebreak — this pins the ordering
    against float summation-order differences so an independent oracle
    (computing the same cosines in a different order) ranks identically."""
    import numpy as np

    spark = corpus.sparkSession
    qids = queries_pdf["query_id"].to_numpy(dtype=np.int64)
    qmat = np.asarray([np.asarray(v, dtype=np.float64) for v in queries_pdf["vector"]])
    qnorm = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    bq = spark.sparkContext.broadcast((qids, qnorm))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_b, q_b = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cids = pdf[id_col].to_numpy(dtype=np.int64)
            cmat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            cmat = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
            sims = q_b @ cmat.T  # (Q, C) BLAS
            kk = min(k + 1, sims.shape[1])
            idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows = {
                "query_id": np.repeat(ids_b, kk),
                "nbr": cids[idx].ravel(),
                "sim": np.take_along_axis(sims, idx, axis=1).ravel(),
            }
            out = pd.DataFrame(rows)
            yield out[out["query_id"] != out["nbr"]]

    local = corpus.select(id_col, vec_col).mapInPandas(kernel, "query_id long, nbr long, sim double")
    sim_col = F.round("sim", rank_round) if rank_round is not None else F.col("sim")
    local = local.withColumn("sim", sim_col)
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("nbr"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr", "sim", "rank")
    )


def _srp_signs(n_planes: int, seed: int, dim: int) -> list[list[float]]:
    """±1.0 hyperplane components derived from md5 — plain constants, computed
    once on the driver and embedded as literals in both the Spark expression
    and the generated SQL twin (portable across engines by construction)."""
    import hashlib

    return [
        [
            1.0 if int(hashlib.md5(f"{seed}:{p}:{i}".encode()).hexdigest()[0], 16) % 2 == 0 else -1.0
            for i in range(dim)
        ]
        for p in range(n_planes)
    ]


def srp_bucket(vec_col, n_planes: int = 8, seed: int = 42, dim: int = 64):
    """Sign-random-projection bucket id as a column expression: plane p has
    deterministic ±1 components (md5-derived literal constants)."""
    acc = F.lit(0)
    for p, row in enumerate(_srp_signs(n_planes, seed, dim)):
        signs = F.array(*[F.lit(s) for s in row])
        dot = F.aggregate(F.zip_with(vec_col, signs, lambda x, s: x * s), F.lit(0.0), lambda a, v: a + v)
        acc = acc + F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return acc


def srp_bucket_sql(vec_expr: str, n_planes: int = 8, seed: int = 42, dim: int = 64) -> str:
    """DuckDB expression computing the identical SRP bucket (same sign
    constants as :func:`srp_bucket`)."""
    terms = []
    for p, row in enumerate(_srp_signs(n_planes, seed, dim)):
        arr = "[" + ", ".join("1.0" if s > 0 else "-1.0" for s in row) + "]"
        terms.append(
            f"(CASE WHEN list_inner_product({vec_expr}, {arr}::DOUBLE[]) >= 0 THEN {1 << p} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


def cosine_near_pairs(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the dedup-by-embedding op of a
    training-data pipeline: SRP-bucketed self-join (each vector is compared
    only within its hyperplane bucket — the candidate set shrinks ~2^n_planes
    fold vs all-pairs), then the exact cosine threshold decides.

    Approximate by construction (a near pair split by a hyperplane is
    missed); recall is measured in tests/test_pipeline_ops.py against the
    all-pairs exact set, and the SQL oracle twin reproduces the *same*
    buckets, so the result is exactly checkable despite being approximate.
    """
    cb = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("bucket", srp_bucket(F.col("v"), n_planes, seed, dim))
    a = cb.select("bucket", F.col("id").alias("a"), F.col("v").alias("va"))
    b = cb.select("bucket", F.col("id").alias("b"), F.col("v").alias("vb"))
    sim = (
        a.join(b, "bucket")
        .filter(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            (
                _dot(F.col("va"), F.col("vb"))
                / (F.sqrt(_dot(F.col("va"), F.col("va"))) * F.sqrt(_dot(F.col("vb"), F.col("vb"))))
            ).alias("sim"),
        )
    )
    return sim.filter(F.col("sim") >= threshold).select("a", "b", F.round("sim", 6).alias("sim"))


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
    dim: int = 64,
    multi_probe: int = 0,
) -> DataFrame:
    """Approximate top-k: SRP-bucketed join — each query only scans its own
    hyperplane bucket. The bucket join replaces the cross join, which is the
    100 TB story.

    ``multi_probe``: additionally probe the buckets reachable by flipping
    each of the first ``multi_probe`` hyperplane signs of the query bucket
    (the standard multi-probe LSH recall/cost dial: probing all ``n_planes``
    single-flip neighbors covers every candidate whose SRP signature differs
    in one plane — the most likely near-miss for nearby vectors). Probe cost
    grows linearly; only the (small) query side is exploded."""
    cb = corpus.select(
        F.col(id_col).alias("nbr"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("bucket", srp_bucket(F.col("cv"), n_planes, seed, dim))
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("bucket", srp_bucket(F.col("qv"), n_planes, seed, dim))
    if multi_probe > 0:
        probes = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(min(multi_probe, n_planes))],
        )
        qb = qb.withColumn("bucket", F.explode(probes))
    join = qb.join(cb, "bucket").filter(F.col("query_id") != F.col("nbr"))
    if multi_probe > 0:
        # a candidate can be reached through several probes — dedup before ranking
        join = join.dropDuplicates(["query_id", "nbr"])
    sim = join.select(
        "query_id",
        "nbr",
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
