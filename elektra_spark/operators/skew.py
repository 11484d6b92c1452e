"""Explicit skew handling: salted two-phase aggregation.

Hub vertices (Zipf tool actors, viral conversations) concentrate
``groupBy(dst)`` input on single reducer keys. For algebraic aggregates
Spark's map-side partial aggregation already bounds the hot key to one
combiner entry per map partition — the implicit version of salting — and AQE
splits skewed *join* partitions. This module provides the **explicit** salted
repartition form for the cases partial aggregation does not cover:

- high-cardinality aggregation state (e.g. ``collect_list``/``count distinct``
  per key), where map-side combine is disabled or unbounded;
- forcing a wider pre-aggregation when one reducer's post-combine input is
  still dominated by a single key (extreme hubs at 10^12-turn scale).

``salted_agg`` shards each key into ``n_salts`` pseudo-keys with a
deterministic hash salt, aggregates per shard (narrow, balanced), then merges
shards with a second aggregation on the true key — identical results to a
direct groupBy for any commutative merge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, cols: list[str], n_salts: int = 16) -> DataFrame:
    """Add a deterministic shard column in [0, n_salts): hash of the row's
    non-key content so shards balance even for constant keys."""
    others = [c for c in df.columns if c not in cols] or cols
    return df.withColumn("_salt", F.pmod(F.xxhash64(*others), F.lit(n_salts)).cast("int"))


def salted_agg(
    df: DataFrame,
    key: str,
    partial_aggs: list[Column],
    merge_aggs: list[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(key, salt) → partial_aggs, then
    groupBy(key) → merge_aggs over the partial columns."""
    salted = with_salt(df, [key], n_salts)
    partial = salted.groupBy(key, "_salt").agg(*partial_aggs)
    return partial.groupBy(key).agg(*merge_aggs)


def salted_sum(df: DataFrame, key: str, value: str, alias: str, n_salts: int = 16) -> DataFrame:
    """Skew-proof ``groupBy(key).sum(value)``."""
    return salted_agg(
        df,
        key,
        [F.sum(value).alias("_p")],
        [F.sum("_p").alias(alias)],
        n_salts,
    )


def salted_count(df: DataFrame, key: str, alias: str = "count", n_salts: int = 16) -> DataFrame:
    return salted_agg(df, key, [F.count("*").alias("_p")], [F.sum("_p").alias(alias)], n_salts)


def top_hub_keys(edges: DataFrame, k: int = 100) -> DataFrame:
    """Identify hub vertices (highest degree) — the keys worth salting or
    broadcasting separately in a skew-split plan."""
    both = edges.select(F.col("src").alias("vid")).union(edges.select(F.col("dst").alias("vid")))
    return both.groupBy("vid").agg(F.count("*").alias("degree")).orderBy(F.col("degree").desc()).limit(k)


def skew_split_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    hot_keys: DataFrame,
    n_salts: int = 16,
) -> DataFrame:
    """Explicit skew-split inner join: rows whose ``key`` is in ``hot_keys``
    (a 1-column DataFrame, e.g. :func:`top_hub_keys`) join via BROADCAST of
    the right side's hot slice — the hot key never lands on one reducer —
    while the cold remainder takes the normal shuffle join. Result ≡ a
    plain ``left.join(right, key)`` for any inputs (the split is a
    partition of the key space), which is exactly what the oracle twin
    checks. This is the manual form of AQE's skew-join split, needed when
    the hot side is known up front (Zipf tool actors) or when AQE is off
    inside a superstep loop."""
    hot = F.broadcast(hot_keys.select(F.col(hot_keys.columns[0]).alias(key)).distinct())
    left_hot = left.join(hot, key, "left_semi")
    left_cold = left.join(hot, key, "left_anti")
    right_hot = right.join(hot, key, "left_semi")
    joined_hot = left_hot.join(F.broadcast(right_hot), key)
    joined_cold = left_cold.join(right, key)
    return joined_cold.unionByName(joined_hot)
