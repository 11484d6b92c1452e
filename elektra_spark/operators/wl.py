"""1-dimensional Weisfeiler–Leman color refinement + conversation-structure
fingerprinting.

Not in the reference; it is the canonical *structural equivalence* primitive
for link graphs (Weisfeiler & Leman 1968; Shervashidze et al., JMLR 2011 —
the WL subtree kernel), and at the north rule's 10^12-turn scale it is the
right tool for a problem the text-level dedup family (dedup/) cannot see:
**templated / scripted conversations** whose *texts* differ (timestamps,
ids, paraphrase) but whose *interaction structure* — who speaks when, which
tools fire where — is identical. One WL fingerprint per conversation turns
structural dedup into an exact groupBy.

Algorithm (classic 1-WL): every vertex starts with an initial color; each
round re-colors ``v`` with ``hash(color(v), sorted multiset of neighbor
colors)``. After r rounds two vertices share a color only if their depth-r
neighborhood trees agree — on bounded-diameter conversation graphs a few
rounds give the full refinement fixpoint.

Determinism contract (repo-wide discipline — the DOULION coin, the walk
hashes): the round hash is ``md5(color || '|' || join(sorted neighbor
colors, ','))``, and md5 hex is byte-identical in Spark and DuckDB, so the
oracle twin reproduces every color and every fingerprint string-for-string.
Sorting md5 hex strings is a binary comparison in both engines (lowercase
hex is ASCII), so the multiset serialization is unambiguous.

100 TB plan shapes:

- one round = one shuffled join (colors onto the static both-directions
  adjacency) + one ``groupBy(dst)`` building the sorted neighbor list. The
  list is bounded by degree; on the per-conversation reply graph degree ≤ 2
  (tool usage enters through the *initial* color, not hub edges), so state
  per vertex is O(1). For hub-bearing graphs use ``agg="sum"``: the
  commutative 48-bit-slice sum is map-side combinable and never
  materializes a per-vertex list — the standard scalable WL variant
  (hash-sum messages, as in GNN aggregation), at the cost of admitting
  multiset-sum collisions md5 makes astronomically unlikely.
- the per-conversation fingerprint is a sum/count aggregate over final
  colors — combinable, one shuffle on conv_id, and conversations are
  vid-contiguous (ingest/edges.py) so the exchange is range-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WL_ROUNDS = 3  # default refinement depth


def _hash48(col: Column) -> Column:
    """First 48 bits of md5(col) as a non-negative long — exact in both
    engines (12 hex chars < 2^48; DuckDB twin: ('0x' || substr(md5(x),1,12))
    ::BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


def wl_colors(
    edges: DataFrame,
    vertices: DataFrame,
    rounds: int = WL_ROUNDS,
    agg: str = "sorted",
) -> DataFrame:
    """→ (vid, color: md5 hex string) after ``rounds`` of 1-WL refinement.

    ``edges``: (src, dst) undirected — symmetrized and self-loop-stripped
    here. ``vertices``: (vid, color) initial colors (any string; hashed into
    md5 space at round 0 so round-1 lists sort uniformly).

    ``agg="sorted"`` is exact 1-WL (neighbor multiset serialized in sorted
    order — per-vertex list bounded by degree). ``agg="sum"`` replaces the
    list with a combinable sum of 48-bit color slices — hub-safe at the
    cost of theoretical (md5-unlikely) multiset-sum collisions.
    """
    if agg not in ("sorted", "sum"):
        raise ValueError(f"agg must be 'sorted' or 'sum', got {agg!r}")
    both = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    colors = vertices.select("vid", F.md5(F.col("color").cast("string")).alias("color"))
    for _ in range(rounds):
        nb = both.join(colors.withColumnRenamed("vid", "src"), "src").select(
            F.col("dst").alias("vid"), "color"
        )
        if agg == "sorted":
            nbs = nb.groupBy("vid").agg(
                F.concat_ws(",", F.array_sort(F.collect_list("color"))).alias("nbs")
            )
        else:
            nbs = nb.groupBy("vid").agg(
                F.concat_ws(
                    ":",
                    F.sum(_hash48(F.col("color"))).cast("string"),
                    F.count("*").cast("string"),
                ).alias("nbs")
            )
        colors = (
            colors.join(nbs, "vid", "left")
            .select(
                "vid",
                F.md5(
                    F.concat(F.col("color"), F.lit("|"), F.coalesce(F.col("nbs"), F.lit("")))
                ).alias("color"),
            )
        )
    return colors


def structure_fingerprint(
    transcripts: DataFrame,
    rounds: int = WL_ROUNDS,
) -> DataFrame:
    """→ (conv_id, n_turns, wl_fp, n_same_structure): one structural
    fingerprint per conversation, plus how many conversations in the corpus
    share it (``n_same_structure = 1`` ⇔ structurally unique).

    Graph: the per-conversation reply chain (turn i — turn i+1); initial
    color = (role, tool), so "assistant turn that called bash" and
    "assistant turn that called read" refine apart even though the chain
    shape is the same. The fingerprint is order-independent by construction
    — ``(Σ hash48(color), n_turns)`` re-hashed — so it is one combinable
    aggregate per conversation, and equal fingerprints ⇔ equal
    (multiset-of-final-colors, length), which for chains pins the full
    role/tool sequence up to the depth-``rounds`` WL resolution.
    """
    t = transcripts.select(
        "conv_id",
        F.col("turn_idx").cast("long").alias("turn_idx"),
        F.concat_ws("#", F.col("conv_id"), F.col("turn_idx").cast("string")).alias("vid"),
        F.concat_ws(":", F.col("role"), F.coalesce(F.col("tool"), F.lit(""))).alias("color"),
    )
    nxt = t.select(
        "conv_id",
        F.col("turn_idx"),
        F.col("vid").alias("src"),
        F.concat_ws("#", F.col("conv_id"), (F.col("turn_idx") + 1).cast("string")).alias("dst"),
    )
    # reply edge exists iff the successor turn exists in the same conversation
    edges = nxt.join(
        t.select(F.col("vid").alias("dst")).distinct(), "dst", "inner"
    ).select("src", "dst")
    colors = wl_colors(edges, t.select("vid", "color"), rounds=rounds)
    per_conv = (
        t.select("conv_id", "vid")
        .join(colors, "vid")
        .groupBy("conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(_hash48(F.col("color"))).alias("csum"),
        )
        .select(
            "conv_id",
            "n_turns",
            F.md5(
                F.concat_ws(":", F.col("csum").cast("string"), F.col("n_turns").cast("string"))
            ).alias("wl_fp"),
        )
    )
    sizes = per_conv.groupBy("wl_fp").agg(F.count("*").alias("n_same_structure"))
    return per_conv.join(sizes, "wl_fp").select(
        "conv_id", "n_turns", "wl_fp", "n_same_structure"
    )
