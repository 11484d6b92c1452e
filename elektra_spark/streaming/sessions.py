"""Streaming sessionization: watermarked ``session_window`` aggregation.

The batch surface sessionizes with a lag/gap window function
(``__spark_entry__.q_events_sessions``); the streaming-native expression is
``F.session_window`` — Spark's built-in merging session state — under an
event-time watermark that bounds state for late data. Semantics note (pinned
by tests and the DuckDB oracle twin): Spark merges an event into a session
when it lands on or before the session's end, so two consecutive events
start a NEW session only when their gap is strictly ``> gap_seconds`` —
exactly the lag-based batch surface's ``> 1800`` rule.

Scale: session-window aggregation shuffles once on ``user_id`` and keeps
per-key merging state bounded by the watermark horizon — the standard
1000-executor streaming-session deployment. Locally we drain file-source
streams with ``Trigger.AvailableNow`` for deterministic tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def event_sessions(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "24 hours",
    value_round: int = 4,
) -> DataFrame:
    """Per-session aggregate over an (event_id, ts, user_id, value, ...)
    stream → ``(user_id, session_start, n_events, session_value)``.

    Works identically on a batch DataFrame (session_window is a plain
    grouping expression there), which is how the streaming result is
    cross-checked without a second code path.
    """
    stream = events
    if events.isStreaming:
        stream = events.withWatermark("ts", watermark)
    return (
        stream.groupBy(
            F.col("user_id"),
            F.session_window(F.col("ts"), f"{gap_seconds} seconds").alias("w"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), value_round).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def drain_to_rows(sessions: DataFrame, checkpoint_dir: str) -> list:
    """Drain a streaming session aggregation with ``Trigger.AvailableNow``.

    Session-window streaming aggregations reject update mode (Spark 4), and
    append mode only emits a session once the watermark passes its end — a
    bounded drain's final sessions would stay in state forever. Complete
    mode emits the whole result table every micro-batch, so the drain is
    simply the LAST emission. Complete mode keeps all session state, which
    is exactly right for a bounded backfill/test drain; a continuous
    production query would run append mode with a real watermark into an
    append-only sink, trading final-session latency for bounded state."""
    last: list = []

    def _absorb(batch_df: DataFrame, batch_id: int) -> None:
        last[:] = batch_df.collect()

    q = (
        sessions.writeStream.foreachBatch(_absorb)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return last
