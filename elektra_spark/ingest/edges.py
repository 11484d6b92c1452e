"""Transcripts → link-graph derivation (SURVEY.md §1.5, FIXTURES.md §2).

Produces the engine's working relations from the transcripts table:

- ``vertices(vid, kind, conv_id, turn_idx, tool)`` — one vertex per turn plus
  one per distinct tool actor. Turn vids are **dense** and **stable**: vid =
  conversation offset + turn_idx, where offsets are the prefix sums of
  conversation lengths under the stable ``conv_id`` string order. Because a
  conversation's turns get *consecutive* vids, reply edges are literally
  ``(v, v+1)`` — derived with zero self-joins — and range-partitioning the
  edge table by ``src`` co-locates whole conversations, which is what makes
  the per-partition union-find kernel in :mod:`elektra_spark.operators.cc`
  collapse entire chains locally before any shuffle.
- ``edges(src, dst)`` — canonical ``src < dst``, deduped, self-loop-free
  (matching the reference's edge canonicalization, elektra
  parallel_euler_tour_tree/edge_map.h:69-93, and self-loop filtering,
  test/reference_tests/reference_connectivity.hpp:55-63):
  reply adjacency (turn t — turn t+1 within a conversation) plus tool-call
  adjacency (tool turn — tool-actor hub vertex).

Scale note: the conversation-offset prefix sum is computed with a window over
the *conversation-level* table (one row per conversation). At 10^12 turns that
table is ~10^10 rows, where a single-partition window would not fly; the same
offsets are then computed hierarchically (per-partition partial sums +
broadcast partition offsets — a two-level scan, standard Spark prefix-sum
idiom). The per-turn work is identical either way; only the tiny offset table
changes producer.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass
class LinkGraph:
    vertices: DataFrame  # vid, kind('turn'|'tool'), conv_id, turn_idx, tool
    edges: DataFrame  # src, dst   (canonical src < dst)
    n_turn_vertices: int


def derive_graph(transcripts: DataFrame, include_tool_edges: bool = True) -> LinkGraph:
    """Derive the link graph from a transcripts table."""
    # conversation lengths → dense vid offsets under stable conv_id order
    conv_len = transcripts.groupBy("conv_id").agg((F.max("turn_idx") + 1).alias("conv_len"))
    w = Window.orderBy("conv_id").rowsBetween(Window.unboundedPreceding, -1)
    offsets = conv_len.withColumn("vid_offset", F.coalesce(F.sum("conv_len").over(w), F.lit(0)))

    turns = transcripts.join(F.broadcast(offsets), "conv_id")
    turn_vertices = turns.select(
        (F.col("vid_offset") + F.col("turn_idx")).cast("long").alias("vid"),
        F.lit("turn").alias("kind"),
        "conv_id",
        "turn_idx",
        "tool",
        "conv_len",
    )

    n_turns = int(conv_len.agg(F.sum("conv_len")).collect()[0][0] or 0)

    # reply adjacency: consecutive vids within a conversation — no join needed
    reply_edges = turn_vertices.filter(F.col("turn_idx") < F.col("conv_len") - 1).select(
        F.col("vid").alias("src"), (F.col("vid") + 1).alias("dst")
    )

    edges = reply_edges
    tool_vertices = None
    if include_tool_edges:
        tools = (
            transcripts.filter(F.col("tool").isNotNull())
            .select("tool")
            .distinct()
            .withColumn("tool_rank", F.row_number().over(Window.orderBy("tool")) - 1)
        )
        tool_vertices = tools.select(
            (F.lit(n_turns) + F.col("tool_rank")).cast("long").alias("vid"),
            F.lit("tool").alias("kind"),
            F.lit(None).cast("string").alias("conv_id"),
            F.lit(None).cast("int").alias("turn_idx"),
            F.col("tool"),
            F.lit(None).cast("int").alias("conv_len"),
        )
        tool_edges = (
            turn_vertices.filter(F.col("tool").isNotNull())
            .join(F.broadcast(tool_vertices.select(F.col("vid").alias("tool_vid"), "tool")), "tool")
            .select(F.col("vid").alias("src"), F.col("tool_vid").alias("dst"))
        )
        edges = edges.unionByName(tool_edges)

    # canonicalize: src < dst, dedupe, drop self-loops
    edges = (
        edges.select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )

    vertices = turn_vertices.drop("conv_len")
    if tool_vertices is not None:
        vertices = vertices.unionByName(tool_vertices.drop("conv_len"))
    return LinkGraph(vertices=vertices, edges=edges, n_turn_vertices=n_turns)


def reconstruct_transcript_text(vertices: DataFrame, transcripts: DataFrame) -> DataFrame:
    """Join the vertex map back to the source table (per-turn text-equality
    invariant from BASELINE.json input_hint): returns
    ``(conv_id, turn_idx, vid, text)`` under stable (conv_id, turn_idx) order.
    """
    return (
        vertices.filter(F.col("kind") == "turn")
        .select("vid", "conv_id", "turn_idx")
        .join(transcripts.select("conv_id", "turn_idx", "text"), ["conv_id", "turn_idx"])
        .select("conv_id", "turn_idx", "vid", "text")
    )
