"""R-MAT synthetic graph source (Chakrabarti, Zhan, Faloutsos, SDM 2004 —
the Graph500 generator): power-law edge lists synthesized map-side from
nothing but an index range.

Each edge is a pure function of its index: at recursion level l the edge
picks one of four quadrants with probabilities (a, b, c, d), contributing
one bit to each endpoint; ``scale`` levels give vertex ids in
[0, 2^scale). The quadrant draw is the repo's portable md5 slice of
``rmat:<seed>:<edge>:<level>`` mod 1000 against the cumulative permille
thresholds — so Spark, DuckDB, and any engine with md5 synthesize the SAME
graph, edge for edge.

This is the "source" the scale story needs: 10^12 edges materialize from
``spark.range`` with zero input IO and zero shuffle (perfectly parallel,
any partitioning), and the a≫d skew knob produces the hub-heavy degree
distributions the skew-handling operators (salting, degree-ordered joins)
are built for. Raw generator semantics: self-loops and multi-edges are
KEPT (Graph500 does the same) — canonicalize downstream when an operator
needs it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _quadrant_hash(seed: int, level: int):
    key = F.concat_ws(":", F.lit("rmat"), F.lit(seed), F.col("edge_id"), F.lit(level))
    return F.conv(F.substring(F.md5(key), 1, 12), 16, 10).cast("long") % 1000


def rmat_edges(
    spark: SparkSession,
    n_edges: int,
    scale: int,
    a: int = 570,
    b: int = 190,
    c: int = 190,
    seed: int = 42,
) -> DataFrame:
    """→ (edge_id, src, dst): ``n_edges`` R-MAT edges over 2^scale vertices.
    ``a``/``b``/``c`` are permille (d = 1000 − a − b − c)."""
    if not 1 <= scale <= 31:
        raise ValueError(f"scale must be in [1, 31], got {scale}")
    if min(a, b, c) < 0 or a + b + c > 1000:
        raise ValueError("quadrant permilles must be non-negative and sum <= 1000")
    df = spark.range(n_edges).select(F.col("id").alias("edge_id"))
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    for level in range(scale):
        r = _quadrant_hash(seed, level)
        # quadrants: [0,a)=(0,0)  [a,a+b)=(0,1)  [a+b,a+b+c)=(1,0)  rest=(1,1)
        sbit = F.when(r < a + b, F.lit(0)).otherwise(F.lit(1))
        dbit = F.when(r < a, F.lit(0)).when(r < a + b, F.lit(1)).when(r < a + b + c, F.lit(0)).otherwise(F.lit(1))
        src = src * 2 + sbit
        dst = dst * 2 + dbit
    return df.select("edge_id", src.alias("src"), dst.alias("dst"))


def rmat_edges_sql(n_edges: int, scale: int, a: int = 570, b: int = 190, c: int = 190, seed: int = 42) -> str:
    """DuckDB twin of :func:`rmat_edges` — identical md5 draws and bit
    assembly, so the edge list matches exactly."""
    def h(level: int) -> str:
        return (
            f"(('0x' || substr(md5('rmat:{seed}:' || CAST(i AS VARCHAR) || ':{level}'), 1, 12))::BIGINT % 1000)"
        )

    src_terms = []
    dst_terms = []
    for level in range(scale):
        shift = scale - 1 - level
        src_terms.append(f"((CASE WHEN {h(level)} < {a + b} THEN 0 ELSE 1 END)::BIGINT << {shift})")
        dst_terms.append(
            f"((CASE WHEN {h(level)} < {a} THEN 0 WHEN {h(level)} < {a + b} THEN 1 "
            f"WHEN {h(level)} < {a + b + c} THEN 0 ELSE 1 END)::BIGINT << {shift})"
        )
    return f"""
  SELECT i AS edge_id,
         ({" + ".join(src_terms)}) AS src,
         ({" + ".join(dst_terms)}) AS dst
  FROM generate_series(0, {n_edges - 1}) t(i)
  """
