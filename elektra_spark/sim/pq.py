"""Product quantization (PQ) codes — compressed embeddings for ANN at scale
(Jégou, Douze & Schmid, *Product Quantization for Nearest Neighbor
Search*, TPAMI 2011).

The third leg of the similarity stack (exact/LSH/IVF in sim/ann.py +
sim/ivf.py): split each D-dim vector into M contiguous sub-blocks, train an
independent k-codeword L2 quantizer per block on a pushed-down sample, and
store each vector as M small codes (here 4×3 bits instead of 64 floats —
the compression that lets a 100 TB embedding corpus live in executor
memory for re-ranking). Same determinism contract as IVF: the Lloyd loop
is a pure function of the sample, the codebook floats embed as literals in
both engines, distances are the sequential-fold arithmetic DuckDB's
``list_inner_product`` reproduces exactly, and ties break to the lowest
codeword id.

Unlike the cosine quantizer in :func:`sim.ivf.train_centroids`, PQ blocks
use RAW (un-normalized) sub-vectors and squared-L2 distance — normalizing
a 16-dim block slice would distort the reconstruction the codes exist to
minimize.

Scale shape: encoding is one narrow column expression (codebooks
broadcast as literals — k×M×(D/M) floats, corpus never shuffles); the
asymmetric-distance re-rank a production reader runs against the codes is
a lookup-table join, also shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .ivf import _centroid_lit, _dot


def train_codebooks(sample, m: int = 4, k: int = 8, iters: int = 5):
    """Deterministic per-block L2 Lloyd: init = first ``k`` sample rows'
    block slices, argmin squared distance with lowest-id ties, mean update,
    empty clusters keep their previous codeword. → list of M codebooks,
    each a k×(D/M) list of float64 literals."""
    import numpy as np

    x = np.asarray(sample, dtype=np.float64)
    n, d = x.shape
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible into {m} blocks")
    if n < k:
        raise ValueError(f"sample of {n} rows cannot seed {k} codewords")
    sub = d // m
    books = []
    for b in range(m):
        xb = x[:, b * sub : (b + 1) * sub]
        c = xb[:k].copy()
        for _ in range(iters):
            d2 = ((xb[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)  # (n, k)
            assign = np.argmin(d2, axis=1)  # first (lowest id) minimum
            for j in range(k):
                members = xb[assign == j]
                if len(members):
                    c[j] = members.mean(axis=0)
        books.append([[float(v) for v in row] for row in c])
    return books


def _block_dists(block: Column, codebook: list[list[float]]) -> Column:
    """Array of squared L2 distances |x|² - 2x·c + |c|² — each term the
    identical sequential fold / exact literal in both engines."""
    xx = _dot(block, block)
    return F.array(
        *[
            xx - 2.0 * _dot(block, _centroid_lit(row)) + F.lit(sum(v * v for v in row))
            for row in codebook
        ]
    )


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (vec_id, code0..code{M-1}, recon_err): per-block nearest-codeword
    ids (argmin distance, lowest id on ties) plus the total squared
    reconstruction error, rounded to the repo's 6 dp contract convention."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    v = F.col(vec_col).cast("array<double>")
    cols = [F.col(id_col)]
    errs = []
    for b, book in enumerate(codebooks):
        dists = _block_dists(F.slice(v, b * sub + 1, sub), book)
        cols.append(
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int").alias(f"code{b}")
        )
        errs.append(F.array_min(dists))
    total = errs[0]
    for e in errs[1:]:
        total = total + e
    cols.append(F.round(total, 6).alias("recon_err"))
    return corpus.select(*cols)


def pq_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-k (ADC): ADC(q, x) = Σ_b d2(q_b,
    codeword[code_b(x)]) — the query stays exact, the corpus is read only
    through its codes. Per query the block LUTs are arrays of k distance
    expressions; the per-row lookup is one ``element_at`` per block, so the
    scan is O(M) per (query, code row) instead of O(D). → (query_id, nbr,
    adc, rank)."""
    from pyspark.sql import Window

    m = len(codebooks)
    sub = len(codebooks[0][0])
    qv = F.col(vec_col).cast("array<double>")
    q = queries.select(F.col(id_col).alias("query_id"), qv.alias("qv"))
    joined = q.crossJoin(codes.withColumnRenamed(id_col, "nbr")).filter(
        F.col("query_id") != F.col("nbr")
    )
    total = None
    for b, book in enumerate(codebooks):
        lut = _block_dists(F.slice(F.col("qv"), b * sub + 1, sub), book)
        term = F.element_at(lut, F.col(f"code{b}") + 1)
        total = term if total is None else total + term
    w = Window.partitionBy("query_id").orderBy(F.col("adc").asc(), F.col("nbr"))
    return (
        joined.withColumn("adc", total)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr", F.round("adc", 6).alias("adc"), "rank")
    )


def pq_encode_sql(
    codebooks: list[list[list[float]]],
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin generated from the same codebook literals: 1-based list
    slices, identical |x|² - 2x·c + |c|² arithmetic, identical min-id
    argmin (list_position of list_min = first occurrence)."""
    pieces, errs = _encode_pieces_sql(codebooks, "v")
    total = " + ".join(errs)
    return f"""
  WITH e AS (SELECT {id_col} AS id, {vec_col}::DOUBLE[] AS v FROM {table})
  SELECT id AS {id_col}, {", ".join(pieces)}, round({total}, 6) AS recon_err
  FROM e
  """


def _dists_sql(codebook: list[list[float]], sl: str) -> str:
    """SQL list of |x|² - 2x·c + |c|² over the slice expression ``sl``."""
    from .ivf import _lit_sql

    return ", ".join(
        f"list_inner_product({sl}, {sl}) - 2.0 * list_inner_product({sl}, {_lit_sql(row)})"
        f" + {sum(v * v for v in row)!r}"
        for row in codebook
    )


def _encode_pieces_sql(codebooks, vec: str):
    sub = len(codebooks[0][0])
    pieces, errs = [], []
    for b, book in enumerate(codebooks):
        sl = f"{vec}[{b * sub + 1}:{(b + 1) * sub}]"
        dists = _dists_sql(book, sl)
        pieces.append(
            f"(list_position([{dists}], list_min([{dists}])) - 1)::INTEGER AS code{b}"
        )
        errs.append(f"list_min([{dists}])")
    return pieces, errs


def pq_topk_sql(
    codebooks: list[list[list[float]]],
    query_pred: str,
    k: int = 5,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of :func:`pq_topk`: identical codes (shared encode
    pieces), identical per-block LUT arithmetic, identical (adc, nbr)
    row_number cut. ``query_pred`` selects the query rows."""
    pieces, _ = _encode_pieces_sql(codebooks, "v")
    sub = len(codebooks[0][0])
    terms = []
    for b, book in enumerate(codebooks):
        sl = f"q.v[{b * sub + 1}:{(b + 1) * sub}]"
        terms.append(f"([{_dists_sql(book, sl)}])[c.code{b} + 1]")
    adc = " + ".join(terms)
    return f"""
  WITH e AS (SELECT {id_col} AS id, {vec_col}::DOUBLE[] AS v FROM {table}),
  c AS MATERIALIZED (SELECT id AS nbr, {", ".join(pieces)} FROM e),
  q AS (SELECT id AS query_id, v FROM e WHERE {query_pred}),
  d AS (SELECT q.query_id, c.nbr, {adc} AS adc
        FROM q CROSS JOIN c WHERE q.query_id <> c.nbr),
  r AS (SELECT query_id, nbr, adc,
               row_number() OVER (PARTITION BY query_id ORDER BY adc, nbr) AS rank
        FROM d)
  SELECT query_id, nbr, round(adc, 6) AS adc, rank::INTEGER AS rank
  FROM r WHERE rank <= {k}
  """
