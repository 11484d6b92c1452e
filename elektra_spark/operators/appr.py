"""Approximate personalized PageRank by forward push (Andersen, Chung,
Lang, FOCS 2006) — the LOCAL diffusion whose work is O(1/ε) independent of
graph size, in a batch-synchronous integer formulation.

Power-iteration PPR (operators/ppr.py) touches every vertex every round;
forward push touches only the frontier where residual mass exceeds
ε·deg(v) — at 10^12 vertices that is the difference between a full-table
superstep and a frontier-sized one. Each round, every over-threshold vertex
converts an α-fraction of its residual to settled mass and pushes the rest
to its neighbors.

The distributed-determinism problem is the threshold: float residuals
accumulate in shuffle order, and a last-ulp difference at the ε boundary
flips a vertex in or out of the frontier — divergence, not drift. This
kernel removes floats entirely: residuals and settled mass live in exact
int64 **nanoprobability units** (1e-9), and a push round is

    alpha_part = (α_pm · r) div 1000          → settles into p
    share      = (r − alpha_part) div deg     → to each neighbor
    keep       = r − alpha_part − deg·share   → floor remainders stay put

so every quantity is an exact integer, the frontier test
``r > ε_int · deg`` is exact, and total mass p + r is conserved TO THE UNIT
(the floor remainders never leave the residual) — asserted by pytest.
Termination: settled mass only grows; vertices below threshold hold their
remainder ≤ deg·ε_int forever, which is exactly ACL's ‖r‖/deg ≤ ε
guarantee in integer clothing.

Per round: one frontier filter, one co-partitioned arc⋈frontier join, one
map-side-combinable inflow sum, one state merge — the same plan family as
a CC superstep but on frontier-sized relations. localCheckpoint per round
(state referenced multiple times — the Louvain lineage lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

APPR_UNIT = 1_000_000_000  # nanoprobability: total seed mass in int units


def appr_push(
    edges: DataFrame,
    seeds: DataFrame,
    alpha_permille: int = 150,
    eps_units: int = 1000,
    rounds: int = 8,
    vertices: DataFrame | None = None,
) -> DataFrame:
    """→ (vid, p_units, r_units): settled and residual nanoprobability after
    ``rounds`` batch push rounds over the undirected graph; only the support
    (p + r > 0) is returned. Frontier rule: push iff r > eps_units · deg."""
    if not 0 < alpha_permille < 1000:
        raise ValueError(f"alpha_permille must be in (0, 1000), got {alpha_permille}")
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    e = (
        edges.select(
            F.least("src", "dst").cast("long").alias("src"),
            F.greatest("src", "dst").cast("long").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    b = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).localCheckpoint(
        eager=True
    )
    deg = b.groupBy(F.col("src").alias("vid")).agg(F.count(F.lit(1)).alias("deg")).localCheckpoint(
        eager=True
    )
    k = seeds.select("vid").distinct().count()
    if k == 0:
        raise ValueError("seed set is empty")
    init = APPR_UNIT // k
    state = (
        seeds.select("vid")
        .distinct()
        .select("vid", F.lit(0).cast("long").alias("p"), F.lit(init).cast("long").alias("r"))
        .join(deg, "vid", "left")
        .select("vid", "p", "r", F.coalesce("deg", F.lit(0)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    a_pm = alpha_permille
    for _ in range(rounds):
        active = state.filter(F.col("r") > eps_units * F.col("deg")).filter(F.col("deg") > 0)
        pushed = active.select(
            "vid",
            ((F.col("r") * a_pm) - (F.col("r") * a_pm) % 1000).alias("_ap1000"),
            "r",
            "deg",
        ).select(
            "vid",
            (F.col("_ap1000") / 1000).cast("long").alias("alpha_part"),
            "r",
            "deg",
        )
        pushed = pushed.select(
            "vid",
            "alpha_part",
            ((F.col("r") - F.col("alpha_part")) - (F.col("r") - F.col("alpha_part")) % F.col("deg"))
            .alias("_sh_deg"),
            "r",
            "deg",
        ).select(
            "vid",
            "alpha_part",
            (F.col("_sh_deg") / F.col("deg")).cast("long").alias("share"),
            (F.col("r") - F.col("alpha_part") - F.col("_sh_deg")).alias("keep"),
        )
        inflow = (
            b.join(pushed.select(F.col("vid").alias("src"), "share"), "src")
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.sum("share").alias("inflow"))
        )
        state = (
            state.join(pushed.select("vid", "alpha_part", "keep"), "vid", "left")
            .join(inflow, "vid", "left")
            .select(
                "vid",
                (F.col("p") + F.coalesce("alpha_part", F.lit(0))).alias("p"),
                (
                    F.when(F.col("keep").isNotNull(), F.col("keep")).otherwise(F.col("r"))
                    + F.coalesce("inflow", F.lit(0))
                ).alias("r"),
                "deg",
            )
        )
        # newly-touched vertices enter the state with their degree
        newcomers = (
            inflow.join(state.select("vid"), "vid", "left_anti")
            .join(deg, "vid", "left")
            .select(
                "vid",
                F.lit(0).cast("long").alias("p"),
                F.col("inflow").alias("r"),
                F.coalesce("deg", F.lit(0)).alias("deg"),
            )
        )
        state = state.unionByName(newcomers).localCheckpoint(eager=True)
    return state.filter(F.col("p") + F.col("r") > 0).select(
        "vid", F.col("p").alias("p_units"), F.col("r").alias("r_units")
    )
