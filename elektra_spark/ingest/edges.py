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

Scale note: the conversation-offset prefix sum is computed **hierarchically**
(:func:`_conv_offsets`): range-partition the conversation-level table by
conv_id, per-partition running sums via a pid-partitioned window (parallel),
collect only the K partition totals, broadcast their exclusive prefix back as
bases. At 10^12 turns the conversation table is ~10^10 rows; nothing here
funnels through one partition and the driver sees K rows.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass
class LinkGraph:
    vertices: DataFrame  # vid, kind('turn'|'tool'), conv_id, turn_idx, tool
    edges: DataFrame  # src, dst   (canonical src < dst)
    n_turn_vertices: int


def _conv_offsets(conv_len: DataFrame, num_partitions: int | None = None):
    """Hierarchical prefix sum of conversation lengths under stable conv_id
    order → (offsets df with vid_offset, total turn count).

    Two-level scan (the standard Spark prefix-sum idiom): range-partition the
    conversation-level table by conv_id, run the running sum per partition
    (parallel window on pid), collect only the K per-partition totals to the
    driver, and broadcast their exclusive prefix back as partition bases.
    No single-partition exchange anywhere — at 10^10 conversations the only
    driver-side data is K rows.
    """
    spark = conv_len.sparkSession
    parts = num_partitions or spark.sparkContext.defaultParallelism
    # materialize the partitioning once: pid assignment must be identical for
    # the totals job and the downstream join
    ranged = (
        conv_len.repartitionByRange(parts, "conv_id")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("pid").orderBy("conv_id").rowsBetween(Window.unboundedPreceding, -1)
    local = ranged.withColumn("local_off", F.coalesce(F.sum("conv_len").over(w), F.lit(0)))
    totals = local.groupBy("pid").agg(F.sum("conv_len").alias("tot")).orderBy("pid").collect()
    base, bases = 0, []
    for r in totals:
        bases.append((r["pid"], base))
        base += int(r["tot"])
    if bases:
        bdf = spark.createDataFrame(pd.DataFrame(bases, columns=["pid", "base"]))
    else:
        bdf = spark.createDataFrame([], "pid int, base long")
    offsets = local.join(F.broadcast(bdf), "pid").select(
        "conv_id", "conv_len", (F.col("base") + F.col("local_off")).alias("vid_offset")
    )
    return offsets, base


def derive_graph(transcripts: DataFrame, include_tool_edges: bool = True) -> LinkGraph:
    """Derive the link graph from a transcripts table."""
    # conversation lengths → dense vid offsets under stable conv_id order
    # (two-level hierarchical prefix sum — no single-partition window)
    conv_len = transcripts.groupBy("conv_id").agg((F.max("turn_idx") + 1).alias("conv_len"))
    offsets, n_turns = _conv_offsets(conv_len)

    # conv-level → turn-level join: offsets is small at fixture scale (AQE
    # broadcasts it); at 10^10 conversations it becomes a shuffle join on
    # conv_id, which both sides already hash cleanly
    turns = transcripts.join(offsets, "conv_id")
    turn_vertices = turns.select(
        (F.col("vid_offset") + F.col("turn_idx")).cast("long").alias("vid"),
        F.lit("turn").alias("kind"),
        "conv_id",
        "turn_idx",
        "tool",
        "conv_len",
    )

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


def derive_digraph(transcripts: DataFrame) -> LinkGraph:
    """Directed link graph from a transcripts table — the flow graph the
    undirected :func:`derive_graph` canonicalizes away.

    Same vid scheme (dense turn vids under stable conv_id order, tool-actor
    hubs appended after the turn range), but edges keep their direction:

    - **reply** ``v → v+1`` — conversation flow (acyclic on its own, since
      turn vids increase along a conversation),
    - **tool call** ``turn → tool_vid`` — a tool-calling turn invokes the hub,
    - **tool response** ``tool_vid → v+1`` — the hub feeds the *next* turn of
      the calling conversation (when one exists).

    The response edges are what create genuine directed cycles: if turns
    ``u < v`` both call tool ``T`` in one conversation, then
    ``u+1 → … → v → T → u+1`` is a cycle, and tools shared across
    conversations chain these cores together — the strongly-connected
    structure :mod:`elektra_spark.operators.scc` decomposes.

    ``edges`` are distinct and self-loop-free but NOT canonicalized to
    ``src < dst`` (direction is the payload).
    """
    conv_len = transcripts.groupBy("conv_id").agg((F.max("turn_idx") + 1).alias("conv_len"))
    offsets, n_turns = _conv_offsets(conv_len)
    turns = transcripts.join(offsets, "conv_id")
    turn_vertices = turns.select(
        (F.col("vid_offset") + F.col("turn_idx")).cast("long").alias("vid"),
        F.lit("turn").alias("kind"),
        "conv_id",
        "turn_idx",
        "tool",
        "conv_len",
    )
    reply = turn_vertices.filter(F.col("turn_idx") < F.col("conv_len") - 1).select(
        F.col("vid").alias("src"), (F.col("vid") + 1).alias("dst")
    )
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
    callers = turn_vertices.filter(F.col("tool").isNotNull()).join(
        F.broadcast(tool_vertices.select(F.col("vid").alias("tool_vid"), "tool")), "tool"
    )
    call = callers.select(F.col("vid").alias("src"), F.col("tool_vid").alias("dst"))
    response = callers.filter(F.col("turn_idx") < F.col("conv_len") - 1).select(
        F.col("tool_vid").alias("src"), (F.col("vid") + 1).alias("dst")
    )
    edges = (
        reply.unionByName(call)
        .unionByName(response)
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    vertices = turn_vertices.drop("conv_len").unionByName(tool_vertices.drop("conv_len"))
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
