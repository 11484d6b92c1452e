"""Reciprocal-rank fusion — the hybrid-retrieval combiner (Cormack et al.,
SIGIR 2009): fuse N rankings of the same id space by

    rrf(d) = Σ_{lists L containing d} 1 / (k0 + rank_L(d)),   k0 = 60

Rank-based fusion is the standard way to combine a lexical ranking (BM25)
with a dense one (embedding cosine) without calibrating their incomparable
score scales — the curation use is query-targeted subcorpus selection where
either signal alone is too noisy.

Exactness: each contribution is one IEEE division of exact integers —
identical in any engine — and a document appears in at most N lists, so for
N = 2 the per-document sum is commutative bit-for-bit (the absorption-row
argument); larger N carries the usual last-ulp caveat, handled by the 1e-9
output rounding. The fused order is (rrf DESC, id ASC) on the rounded score
— total, engine-independent.

At 100 TB each input ranking is already a top-``cap`` list (tiny); the fusion
itself is a union + one k0-group-free aggregation on id — broadcast-scale.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_K0 = 60


def rrf_fuse(rankings: list[DataFrame], id_col: str = "doc_id", k0: int = RRF_K0) -> DataFrame:
    """→ (id_col, n_lists, rrf, rank): fuse rank lists (each: id_col + an
    integer ``rank`` column, 1-based)."""
    if len(rankings) < 2:
        raise ValueError("rrf_fuse needs at least two rankings")
    contribs = [
        r.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(k0)) + F.col("rank").cast("double"))).alias("c"),
        )
        for r in rankings
    ]
    allc = reduce(lambda a, b: a.unionByName(b), contribs)
    fused = allc.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_lists"), F.round(F.sum("c"), 9).alias("rrf")
    )
    w = Window.orderBy(F.col("rrf").desc(), F.col(id_col).asc())
    return fused.withColumn("rank", F.row_number().over(w).cast("long"))


def rrf_fuse_sql(list_sqls: list[str], id_col: str = "doc_id", k0: int = RRF_K0) -> str:
    """DuckDB twin: each ``list_sqls`` entry is a SELECT yielding
    (id_col, rank); fusion replays the identical division + rounding."""
    union = "\n    UNION ALL\n    ".join(
        f"SELECT {id_col}, 1.0 / ({float(k0)!r} + rank) AS c FROM ({s})" for s in list_sqls
    )
    return f"""
  WITH allc AS (
    {union}
  ),
  fused AS (SELECT {id_col}, count(*)::BIGINT AS n_lists, round(sum(c), 9) AS rrf
            FROM allc GROUP BY {id_col})
  SELECT {id_col}, n_lists, rrf,
         row_number() OVER (ORDER BY rrf DESC, {id_col} ASC)::BIGINT AS rank
  FROM fused
  """
