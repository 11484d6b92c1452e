"""Weighted bipartite projection — co-occurrence graph with a hub guard.

The pattern behind every "co-X" graph (co-purchase, co-citation,
co-participation): project a bipartite relation ``(group, member)`` onto
members, weighting each member pair by the number of groups containing
both. The repo's co-purchase graph (``__spark_entry__._COPURCHASE_SQL``,
orders × parts) is this projection un-weighted; this operator makes it
first-class with weights and a scale contract.

Scale contract (the part that matters at 100 TB): a group of size g emits
C(g, 2) pairs, so hub groups are *quadratic* — one 10⁶-member group emits
5·10¹¹ rows. ``max_group_size`` therefore caps participating groups and is
**part of the operator semantics** (like the link-prediction degree guard,
LINKPRED_MAX_PIVOT_DEG): oversized groups are dropped entirely, which in
co-occurrence mining is the standard treatment (a basket with every item
carries no signal). The DuckDB twin applies the identical cap.

Plan: one shuffle groups the relation by ``group`` (map-side combinable
size count for the guard via a broadcastable semi-join), the pair
expansion is a co-partitioned self-join on the group key, and the weight
is a combinable count per canonical (a < b) pair — hub members are
harmless (they are pair *endpoints*, not generators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def project_bipartite(
    rel: DataFrame,
    group_col: str = "src",
    member_col: str = "dst",
    min_weight: int = 1,
    max_group_size: int | None = None,
) -> DataFrame:
    """→ (src, dst, weight): canonical src < dst member pairs weighted by
    co-occurring group count; pairs below ``min_weight`` are dropped, groups
    above ``max_group_size`` are excluded (contract guard, see module doc).
    Duplicate (group, member) rows are collapsed first so a member counts
    once per group."""
    r = rel.select(F.col(group_col).alias("g"), F.col(member_col).alias("m")).distinct()
    if max_group_size is not None:
        ok = r.groupBy("g").agg(F.count("*").alias("sz")).filter(F.col("sz") <= max_group_size).select("g")
        r = r.join(ok, "g", "left_semi")
    pairs = (
        r.select("g", F.col("m").alias("a"))
        .join(r.select("g", F.col("m").alias("b")), "g")
        .filter(F.col("a") < F.col("b"))
        .groupBy(F.col("a").alias("src"), F.col("b").alias("dst"))
        .agg(F.count("*").alias("weight"))
    )
    if min_weight > 1:
        pairs = pairs.filter(F.col("weight") >= min_weight)
    return pairs
