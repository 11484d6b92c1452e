"""Partitioning advisor: measured edge-cut under candidate layouts.

The north rule says partitioning/shuffle/skew must be handled *explicitly*;
this operator is the measurement that justifies the engine's choice. For a
superstep join (PageRank scatter, CC label exchange) the shuffle volume is
proportional to the EDGE CUT — the fraction of edges whose endpoints land
in different partitions — so choosing a layout is choosing a cut.

Two candidate layouts, the ones the engine actually decides between:

- ``hash``: vid → bucket by a uniform hash (what a plain ``groupBy``/
  ``repartition(col)`` gives). Modeled with the repo's portable md5 slice
  rather than Spark's internal Murmur3 so the DuckDB twin reproduces the
  assignment bit-for-bit — any uniform hash has the same expected cut, so
  portability costs nothing in fidelity.
- ``range``: contiguous vid blocks (``repartitionByRange``). The engine's
  transcript derivation (ingest/edges.py) assigns DENSE vids so a
  conversation's turns are consecutive — reply edges are (v, v+1) — which
  makes range layout cut ONLY the edges that straddle a block boundary.

On transcript reply chains the measured gap is dramatic (hash ≈ 1 - 1/P,
range ≈ P/n_edges): the quantitative version of the docstring claim that
dense-vid range partitioning is what lets the CC kernel collapse whole
conversations locally before any shuffle.

Everything is integral arithmetic folded into ONE aggregate — the advisor
costs a single scan of the edge table regardless of the grid size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hash_bucket(col: str, p: int) -> Column:
    return (
        F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 8), 16, 10).cast("long")
        % p
    )


def _range_bucket(col: str, p: int, n_vids: int) -> Column:
    # block index of a contiguous split of [0, n_vids) into p blocks —
    # integral `div` keeps both engines on exact arithmetic (a double
    # divide would truncate in Spark casts but round in DuckDB casts)
    return F.expr(f"least(CAST({p - 1} AS BIGINT), ({col} * {p}) div {n_vids})")


def edge_cut_advisor(
    edges: DataFrame, n_vids: int, partition_counts: list[int]
) -> DataFrame:
    """→ (strategy, p, n_edges, cut_edges, cut_frac): measured edge cut of
    each candidate layout at each partition count. ``n_vids`` is the dense
    vid-space size (max vid + 1)."""
    if n_vids < 1 or not partition_counts:
        raise ValueError("n_vids must be >= 1 and partition_counts non-empty")
    # ONE scan for the whole grid: every (strategy, p) cut indicator is a
    # column of the same aggregate; the 1-row result explodes into the long
    # format. A union-of-aggregates shape would re-scan the edge table once
    # per grid cell — 2×|grid| passes over 100 TB for six numbers.
    combos = []
    aggs = [F.count(F.lit(1)).alias("n_edges")]
    for p in partition_counts:
        if p < 1:
            raise ValueError(f"partition counts must be >= 1, got {p}")
        for strategy, bucket in (
            ("hash", lambda c, pp: _hash_bucket(c, pp)),
            ("range", lambda c, pp: _range_bucket(c, pp, n_vids)),
        ):
            cut = (bucket("src", p) != bucket("dst", p)).cast("long")
            combos.append((strategy, p))
            aggs.append(F.sum(cut).alias(f"cut_{strategy}_{p}"))
    row = edges.agg(*aggs)
    structs = [
        F.struct(
            F.lit(strategy).alias("strategy"),
            F.lit(p).cast("int").alias("p"),
            F.col("n_edges").alias("n_edges"),
            F.col(f"cut_{strategy}_{p}").alias("cut_edges"),
            F.round(F.col(f"cut_{strategy}_{p}") / F.col("n_edges"), 6).alias("cut_frac"),
        )
        for strategy, p in combos
    ]
    return row.select(F.explode(F.array(*structs)).alias("r")).select("r.*")


def edge_cut_advisor_sql(
    edges_sql: str,
    n_vids: int | str,
    partition_counts: list[int],
    prefix_ctes: str = "",
) -> str:
    """DuckDB twin: identical md5 hash bucket, identical block arithmetic.
    ``n_vids`` may be an int literal or a scalar-subquery string (so the
    twin can derive the vid-space size from the same relations);
    ``prefix_ctes`` lets the caller prepend the CTEs ``edges_sql`` needs."""
    nv = n_vids if isinstance(n_vids, str) else str(n_vids)

    def hash_b(col: str, p: int) -> str:
        return f"(('0x' || substr(md5({col}::VARCHAR), 1, 8))::BIGINT % {p})"

    def range_b(col: str, p: int) -> str:
        return f"least({p - 1}::BIGINT, ({col} * {p}) // {nv})"

    selects = []
    for p in partition_counts:
        for strategy, bucket in (("hash", hash_b), ("range", range_b)):
            cut = f"CASE WHEN {bucket('src', p)} <> {bucket('dst', p)} THEN 1 ELSE 0 END"
            selects.append(
                f"""SELECT '{strategy}' AS strategy, {p}::INTEGER AS p,
       count(*)::BIGINT AS n_edges, sum({cut})::BIGINT AS cut_edges,
       round(sum({cut}) / count(*), 6) AS cut_frac
  FROM e"""
            )
    body = "\n  UNION ALL\n  ".join(selects)
    pre = f"{prefix_ctes}," if prefix_ctes else ""
    return f"""
  WITH {pre}
  e AS MATERIALIZED ({edges_sql})
  {body}
  """
