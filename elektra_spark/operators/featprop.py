"""Graph feature propagation — the (I + A)^k sum-push filter over per-vertex
feature vectors, in long (vid, dim, value) format.

The GNN-preprocessing primitive (SGC — Wu et al. 2019 — strips a GCN to
exactly "propagate features k hops, then fit a linear head"): smooth each
vertex's embedding with its graph neighborhood before clustering / dedup /
classification. This kernel keeps the whole trajectory in EXACT int64
arithmetic — features are 2^20-quantized once (the sim/kmeans.py contract),
and each round is

    h_{t+1}(v) = h_t(v) + Σ_{u ∈ N(v)} h_t(u)

pure integer sums: order-free, partition-invariant, engine-exact. The
normalization a GCN would apply per round is deferred to the reader (divide
by (1+deg)^k or L2-normalize at use time) — deferring it is what keeps the
fixed point exact, and for a linear head downstream it is equivalent.

Long format is the 10^12-vertex layout: (vid, dim) rows shard both ways, so
a hub vertex's update is ``dim`` map-side-combinable sums instead of one
wide array row, and dimension sharding falls out for free. Per round: one
join of the both-directions arc table against the feature table (both keyed
on vid — co-partitioned), one (vid, dim) aggregation.

Overflow envelope: |h_k| ≤ Q · (1 + max_deg)^k · max|x|; Q = 2^20 and
unit-ish features leave 2^43 of headroom — assert k·log2(1+max_deg) stays
under it for wide graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATPROP_Q = 1 << 20  # shared with sim/kmeans.py quantization


def quantize_features_long(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """→ (vid, dim, h): 1-based dims, h = round(x·2^20) int64."""
    e = F.col(vec_col).cast("array<double>")
    return df.select(F.col(id_col).cast("long").alias("vid"), F.posexplode(e)).select(
        "vid",
        (F.col("pos") + 1).cast("int").alias("dim"),
        F.round(F.col("col") * F.lit(float(FEATPROP_Q))).cast("long").alias("h"),
    )


def propagate_features(features: DataFrame, edges: DataFrame, rounds: int) -> DataFrame:
    """→ (vid, dim, h) after ``rounds`` sum-push rounds. ``features`` in long
    format (vid, dim, h:long); ``edges`` canonical undirected (src, dst)."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    b = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    h = features
    for _ in range(rounds):
        c = (
            b.join(h.withColumnRenamed("vid", "dst"), "dst")
            .groupBy(F.col("src").alias("vid"), "dim")
            .agg(F.sum("h").alias("s"))
        )
        h = h.join(c, ["vid", "dim"], "left").select(
            "vid", "dim", (F.col("h") + F.coalesce(F.col("s"), F.lit(0))).alias("h")
        )
    return h
