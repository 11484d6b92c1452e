"""Conversation-level transcript analytics — gap/latency profiles and
tool-call sequence mining over the raw (conv_id, turn_idx, role, text,
tool, ts) table, BEFORE graph derivation.

These are the payload-side queries a transcript warehouse runs next to the
link-graph suite: response-latency distributions per conversation and the
frequency table of tool-call patterns (the n-gram of agent behavior).

Scale story: both operators shuffle exactly once, on ``conv_id`` — the
window (lag) and the grouped aggregation share that partitioning, so
Catalyst plans a single exchange; the sequence fingerprint is built from a
sorted in-group array (bounded by conversation length, never corpus size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def turn_gap_profile(transcripts: DataFrame) -> DataFrame:
    """→ (conv_id, n_turns, n_tool_turns, mean_gap_s, max_gap_s): inter-turn
    latency profile under stable (conv_id, turn_idx) ordering. Single-turn
    conversations report 0 gaps."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    # timestamp_diff is pure calendar arithmetic — no timezone interpretation
    # of the NTZ column, so it twins DuckDB's date_diff('second', ...) exactly
    g = transcripts.select(
        "conv_id",
        "turn_idx",
        "tool",
        F.timestamp_diff("SECOND", F.lag("ts").over(w), F.col("ts")).alias("gap_s"),
    )
    return g.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.count("tool").alias("n_tool_turns"),
        F.round(F.coalesce(F.avg("gap_s"), F.lit(0.0)), 6).alias("mean_gap_s"),
        F.coalesce(F.max("gap_s"), F.lit(0)).alias("max_gap_s"),
    )


def tool_sequences(transcripts: DataFrame, sep: str = ">") -> DataFrame:
    """→ (seq, n_convs): frequency table of per-conversation tool-call
    sequences (tools in turn order, non-tool turns skipped); conversations
    with no tool calls are excluded. The in-group order is pinned by
    sorting (turn_idx, tool) structs — deterministic regardless of task
    placement — so the fingerprint is reproducible across engines."""
    seqs = (
        transcripts.filter(F.col("tool").isNotNull())
        .groupBy("conv_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("turn_idx", "tool"))),
                    lambda s: s["tool"],
                ),
                sep,
            ).alias("seq")
        )
    )
    return seqs.groupBy("seq").agg(F.count("*").alias("n_convs"))
